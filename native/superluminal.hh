// Superluminal C++ API — the native-language surface of the plotting
// layer (reference: /root/reference/include/jetstream/superluminal.hh
// :18-211 and examples/jetstream/hello_world.cc).
//
// The TPU build's product runtime is Python/JAX, so the C++ surface is
// a thin embed: these calls drive the SAME cyberether_tpu.superluminal
// package through an in-process CPython interpreter.  Buffers are
// wrapped ZERO-COPY (PyMemoryView over the caller's pointer ->
// numpy.frombuffer), mirroring the reference's
// Superluminal::plot(Tensor::create(void*, ...)) path — the C++ side
// mutates its buffer and calls update(), exactly like the reference's
// realtime loop.
//
// Link: -lpython3.x (see native/Makefile superluminal_demo target).

#ifndef CYBERETHER_TPU_SUPERLUMINAL_HH
#define CYBERETHER_TPU_SUPERLUMINAL_HH

#include <cstddef>
#include <string>

namespace superluminal {

// Plot types / domains (reference superluminal.hh Type/Domain enums).
enum class Type { Line, Waterfall, Scatter };
enum class Domain { Time, Frequency };

struct PlotConfig {
    Type type = Type::Line;
    Domain source = Domain::Time;
    Domain display = Domain::Frequency;
    std::string label;
};

// Start the interpreter and import the package.  Returns false (and
// fills *err when given) on failure.  Safe to call once per process.
bool initialize(std::string* err = nullptr);

// Register a zero-copy plot over the caller's float32 buffer of
// ``n`` complex samples stored re,im interleaved (2*n floats), or a
// real buffer of n floats when ``complex_iq`` is false.  The buffer
// must outlive the session.
bool plot(float* data, std::size_t n, const PlotConfig& cfg,
          bool complex_iq = true, std::string* err = nullptr);

// Build the hidden flowgraph and start compute/present threads.
bool start(std::string* err = nullptr);

// Mark plot buffers dirty after mutating them (realtime loop).
bool update(std::string* err = nullptr);

// Run the present loop for ``seconds`` (headless-friendly show()).
bool show(double seconds, std::string* err = nullptr);

// Stop threads and tear the session down.
bool stop(std::string* err = nullptr);

// Finalize the embedded interpreter.
void terminate();

}  // namespace superluminal

#endif  // CYBERETHER_TPU_SUPERLUMINAL_HH
