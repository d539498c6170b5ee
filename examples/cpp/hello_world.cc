// C++ hello-world over the Superluminal embed — the reference's
// examples/jetstream/hello_world.cc cognate: build a complex tone in
// a C++-owned buffer, register a frequency-domain line plot
// (zero-copy), run a short headless show while mutating the buffer
// from this thread, then tear down.

#include <cmath>
#include <cstdio>
#include <vector>

#include "../../native/superluminal.hh"

int main() {
    namespace lm = superluminal;
    std::string err;
    if (!lm::initialize(&err)) {
        std::fprintf(stderr, "init failed: %s\n", err.c_str());
        return 1;
    }

    constexpr std::size_t N = 2048;
    std::vector<float> iq(2 * N);        // re,im interleaved
    auto fill = [&](double f) {
        for (std::size_t i = 0; i < N; ++i) {
            iq[2 * i] = static_cast<float>(
                std::cos(2.0 * M_PI * f * static_cast<double>(i)));
            iq[2 * i + 1] = static_cast<float>(
                std::sin(2.0 * M_PI * f * static_cast<double>(i)));
        }
    };
    fill(0.1);

    lm::PlotConfig cfg;
    cfg.type = lm::Type::Line;
    cfg.source = lm::Domain::Time;
    cfg.display = lm::Domain::Frequency;
    cfg.label = "cpp-tone";
    if (!lm::plot(iq.data(), N, cfg, true, &err)) {
        std::fprintf(stderr, "plot failed: %s\n", err.c_str());
        return 1;
    }
    if (!lm::start(&err)) {
        std::fprintf(stderr, "start failed: %s\n", err.c_str());
        return 1;
    }
    // realtime mutation from C++: retune the tone and mark dirty
    for (int k = 0; k < 5; ++k) {
        fill(0.05 + 0.02 * k);
        if (!lm::update(&err)) {
            std::fprintf(stderr, "update failed: %s\n", err.c_str());
            return 1;
        }
        if (!lm::show(0.1, &err)) {
            std::fprintf(stderr, "show failed: %s\n", err.c_str());
            return 1;
        }
    }
    lm::stop(nullptr);
    lm::terminate();
    std::puts("superluminal-cpp-ok");
    return 0;
}
