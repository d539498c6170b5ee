"""Built-in example flowgraphs (JST_REGISTER_EXAMPLE analog).

Fresh TPU-native examples covering the same scenarios as the
reference's examples/flowgraphs/ set (spectrum analyzer, FM receiver,
signal generator, overlap-save filtering).
"""

from cyberether_tpu.core.registry import registry

SIGNAL_GENERATOR = """
version: 2
title: Signal Generator
summary: Synthetic tone through a spectrum display.
graph:
  - name: gen
    module: signal_generator
    config:
      signalType: cosine
      signalDataType: CF32
      sampleRate: 1000000
      frequency: 125000
      bufferSize: 2048
  - name: spec
    module: spectrum_engine
    config: {enableScale: true, rangeMin: -100, rangeMax: 0}
    input: {buffer: '${graph.gen.output.signal}'}
  - name: plot
    module: lineplot
    input: {signal: '${graph.spec.output.buffer}'}
  - name: wtf
    module: waterfall
    config: {height: 512}
    input: {signal: '${graph.spec.output.buffer}'}
"""

SPECTRUM_ANALYZER = """
version: 2
title: Spectrum Analyzer
summary: SDR console — waterfall and lineplot from a Soapy source.
graph:
  - name: soapy
    module: soapy
    config:
      deviceString: 'test'
      sampleRate: 2000000
      frequency: 94900000
      numberOfTimeSamples: 2048
      numberOfBatches: 8
  - name: spec
    module: spectrum_engine
    config: {enableScale: true, rangeMin: -100, rangeMax: 0}
    input: {buffer: '${graph.soapy.output.signal}'}
  - name: plot
    module: lineplot
    input: {signal: '${graph.spec.output.buffer}'}
  - name: wtf
    module: waterfall
    config: {height: 512}
    input: {signal: '${graph.spec.output.buffer}'}
"""

FM_RECEIVER = """
version: 2
title: Simple FM Receiver
summary: Narrowband FM demodulation to an audio sink.
graph:
  - name: soapy
    module: soapy
    config:
      deviceString: 'test'
      sampleRate: 240000
      frequency: 88900000
      numberOfTimeSamples: 2048
      numberOfBatches: 8
  - name: fm
    module: fm
    config: {sampleRate: 240000}
    input: {signal: '${graph.soapy.output.signal}'}
  - name: audio
    module: audio
    config: {inSampleRate: 240000, outSampleRate: 48000}
    input: {buffer: '${graph.fm.output.signal}'}
"""

OVERLAP_ADD = """
version: 2
title: Overlap-Add
summary: Frequency-domain FIR built from primitive blocks
  (pad/fft/multiply/ifft/unpad/overlap_add — the chain the
  filter_engine block abstracts).
graph:
  - name: note
    module: note
    config:
      content: |-
        # Overlap-Add Example
        Filters a signal in the frequency domain with a FIR filter,
        using `unpad` + `overlap_add` to stitch block boundaries
        without artifacts.  The `Overlap-Save Filter` example wraps
        this whole chain in one `filter_engine` block.
  - name: soapy
    module: soapy
    config:
      deviceString: 'test'
      sampleRate: 2000000
      numberOfTimeSamples: 8000
      numberOfBatches: 8
  - name: taps
    module: filter_taps
    config:
      sampleRate: 2000000
      bandwidth: 500000
      center: '[0]'
      taps: 65
  - name: pad_sig
    module: pad
    config: {size: 64, axis: 1}
    input: {unpadded: '${graph.soapy.output.signal}'}
  - name: pad_flt
    module: pad
    config: {size: 7999, axis: 1}
    input: {unpadded: '${graph.taps.output.coeffs}'}
  - name: fft_sig
    module: fft
    config: {forward: true}
    input: {signal: '${graph.pad_sig.output.padded}'}
  - name: fft_flt
    module: fft
    config: {forward: true}
    input: {signal: '${graph.pad_flt.output.padded}'}
  - name: mul
    module: multiply
    input:
      a: '${graph.fft_sig.output.signal}'
      b: '${graph.fft_flt.output.signal}'
  - name: axes
    module: signal_axes
    config: {axes: 'batch=0,sample=1'}
    input: {buffer: '${graph.mul.output.product}'}
  - name: ifft
    module: fft
    config: {forward: false}
    input: {signal: '${graph.axes.output.buffer}'}
  - name: norm
    module: multiply_constant
    config: {constant: 0.000124007936507936}
    input: {factor: '${graph.ifft.output.signal}'}
  - name: unpad
    module: unpad
    config: {size: 64, axis: 1}
    input: {padded: '${graph.norm.output.product}'}
  - name: ola
    module: overlap_add
    input:
      buffer: '${graph.unpad.output.unpadded}'
      overlap: '${graph.unpad.output.pad}'
  - name: spec
    module: spectrum_engine
    config: {enableAgc: true, enableScale: true}
    input: {buffer: '${graph.ola.output.buffer}'}
  - name: wtf
    module: waterfall
    input: {signal: '${graph.spec.output.buffer}'}
"""

OVERLAP_ADD_FOLD = """
version: 2
title: Overlap-Add-Fold
summary: Two-station frequency-domain FIR with fold resampling
  (reference examples/flowgraphs/overlap-add-fold.yml).
graph:
  - name: note
    module: note
    config:
      content: |-
        # Overlap-Add-Fold Example
        Continuation of the `Overlap-Add` example: a `fold` block sums
        the spectrum aliases before the IFFT, resampling each station
        by 10x and shrinking the IFFT from 8100 to 810 bins.  The
        `Multi FM` example abstracts this whole chain in one `filter`
        block.
  - name: soapy
    module: soapy
    config:
      deviceString: 'test'
      sampleRate: 2000000
      frequency: 96900000
      numberOfTimeSamples: 8000
      numberOfBatches: 8
  - name: taps
    module: filter_taps
    config:
      sampleRate: 2000000
      bandwidth: 200000
      center: '[400000, -400000]'
      taps: 101
  - name: pad_sig
    module: pad
    config: {size: 100, axis: 1}
    input: {unpadded: '${graph.soapy.output.signal}'}
  - name: pad_flt
    module: pad
    config: {size: 7999, axis: 1}
    input: {unpadded: '${graph.taps.output.coeffs}'}
  - name: fft_sig
    module: fft
    config: {forward: true}
    input: {signal: '${graph.pad_sig.output.padded}'}
  - name: fft_flt
    module: fft
    config: {forward: true}
    input: {signal: '${graph.pad_flt.output.padded}'}
  - name: exp
    module: expand_dims
    config: {axis: 1}
    input: {buffer: '${graph.fft_sig.output.signal}'}
  - name: mul
    module: multiply
    input:
      a: '${graph.exp.output.buffer}'
      b: '${graph.fft_flt.output.signal}'
  - name: axes
    module: signal_axes
    config: {axes: 'batch=0,channel=1,sample=2'}
    input: {buffer: '${graph.mul.output.product}'}
  - name: fold
    module: fold
    config: {size: 810, offset: 0}
    input: {buffer: '${graph.axes.output.buffer}'}
  - name: ifft
    module: fft
    config: {forward: false}
    input: {signal: '${graph.fold.output.buffer}'}
  - name: norm
    module: multiply_constant
    config: {constant: 0.0012345679012345679}
    input: {factor: '${graph.ifft.output.signal}'}
  - name: unpad
    module: unpad
    config: {size: 10, axis: 2}
    input: {padded: '${graph.norm.output.product}'}
  - name: ola
    module: overlap_add
    input:
      buffer: '${graph.unpad.output.unpadded}'
      overlap: '${graph.unpad.output.pad}'
  - name: sl1
    module: slice
    config: {slice: '[:, 1, :]', contiguous: true}
    input: {buffer: '${graph.ola.output.buffer}'}
  - name: ax1
    module: signal_axes
    config: {axes: 'batch=0,sample=1'}
    input: {buffer: '${graph.sl1.output.buffer}'}
  - name: spec
    module: spectrum_engine
    config: {enableAgc: true, enableScale: true}
    input: {buffer: '${graph.ax1.output.buffer}'}
  - name: wtf
    module: waterfall
    input: {signal: '${graph.spec.output.buffer}'}
  - name: fm
    module: fm
    config: {sampleRate: 200000}
    input: {signal: '${graph.ax1.output.buffer}'}
  - name: audio
    module: audio
    config: {inSampleRate: 200000, outSampleRate: 48000}
    input: {buffer: '${graph.fm.output.signal}'}
"""

OVERLAP_SAVE = """
version: 2
title: Overlap-Save Filter
summary: Frequency-domain FIR with integer-ratio resampling.
graph:
  - name: soapy
    module: soapy
    config:
      deviceString: 'test'
      sampleRate: 2000000
      numberOfTimeSamples: 8000
      numberOfBatches: 8
  - name: taps
    module: filter_taps
    config:
      sampleRate: 2000000
      bandwidth: 500000
      center: '[0]'
      taps: 65
  - name: engine
    module: filter_engine
    input:
      signal: '${graph.soapy.output.signal}'
      filter: '${graph.taps.output.coeffs}'
  - name: spec
    module: spectrum_engine
    config: {enableAgc: true, enableScale: true}
    input: {buffer: '${graph.engine.output.buffer}'}
  - name: wtf
    module: waterfall
    input: {signal: '${graph.spec.output.buffer}'}
"""


MULTI_FM = """
version: 2
title: Multi FM
summary: Demodulate two FM stations at once with a 2-head filter bank.
graph:
  - name: soapy
    module: soapy
    config:
      deviceString: 'test'
      sampleRate: 2000000
      frequency: 96900000
      numberOfTimeSamples: 8000
      numberOfBatches: 8
  - name: flt
    module: filter
    config:
      sampleRate: 2000000
      bandwidth: 200000
      center: '[400000, -400000]'
      taps: 51
      heads: 2
    input: {signal: '${graph.soapy.output.signal}'}
  - name: sl0
    module: slice
    config: {slice: '[:, 0, :]'}
    input: {buffer: '${graph.flt.output.buffer}'}
  - name: ax0
    module: signal_axes
    config: {axes: 'batch=0,sample=1'}
    input: {buffer: '${graph.sl0.output.buffer}'}
  - name: fm0
    module: fm
    config: {sampleRate: 200000}
    input: {signal: '${graph.ax0.output.buffer}'}
  - name: audio
    module: audio
    config: {inSampleRate: 200000, outSampleRate: 48000}
    input: {buffer: '${graph.fm0.output.signal}'}
"""

_CENTERS_64 = ", ".join(str(int((i - 32) * 2e6)) for i in range(64))

CHANNELIZER_64 = f"""
version: 2
title: 64-channel Channelizer
summary: 64-head polyphase channelization of a 128 MS/s stream
  (channels shard across the mesh 'channels' axis).
graph:
  - name: gen
    module: signal_generator
    config:
      signalType: noise
      signalDataType: CF32
      sampleRate: 128000000
      bufferSize: 16384
  - name: flt
    module: filter
    config:
      sampleRate: 128000000
      bandwidth: 2000000
      center: '[{_CENTERS_64}]'
      taps: 129
      heads: 64
    input: {{signal: '${{graph.gen.output.signal}}'}}
"""


FLIGHT_TRACKER = """
version: 2
title: Flight Tracker
summary: Mode-S/ADS-B decoding at 1090 MHz into an aircraft map.
graph:
  - name: soapy
    module: soapy
    config:
      deviceString: 'test'
      sampleRate: 2000000
      frequency: 1090000000
      numberOfTimeSamples: 65536
      numberOfBatches: 1
  - name: adsb
    module: adsb
    input: {signal: '${graph.soapy.output.signal}'}
"""


def _ml_inference_yaml() -> str:
    """ML inference example (reference: the onnx_inference domain,
    include/jetstream/domains/ml/onnx_inference/module.hh): a live
    signal patch feeds the bundled convnet
    (cyberether_tpu/data/mlp.onnx, the committed test fixture's twin)
    and the class scores render as a lineplot."""
    import os

    model = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "data", "mlp.onnx")
    return f"""
version: 2
title: ML Inference
summary: ONNX convnet over a live signal patch (pure-JAX executor).
graph:
  - name: gen
    module: signal_generator
    config:
      signalType: sine
      signalDataType: F32
      sampleRate: 64000
      frequency: 2000
      bufferSize: 64
  - name: rs
    module: reshape
    config: {{shape: [1, 1, 8, 8]}}
    input: {{buffer: '${{graph.gen.output.signal}}'}}
  - name: net
    module: onnx_inference
    config:
      modelPath: '{model}'
    input: {{input: '${{graph.rs.output.buffer}}'}}
  - name: rs2
    module: reshape
    config: {{shape: [10]}}
    input: {{buffer: '${{graph.net.output.output}}'}}
  - name: plot
    module: lineplot
    input: {{signal: '${{graph.rs2.output.buffer}}'}}
"""


CANVAS_DASH = """
version: 2
title: Canvas Dashboard
summary: Spectrum display beside a declarative retained-canvas panel.
graph:
  - name: gen
    module: signal_generator
    config:
      signalType: cosine
      signalDataType: CF32
      sampleRate: 1000000
      frequency: 125000
      bufferSize: 2048
  - name: spec
    module: spectrum_engine
    config: {enableScale: true, rangeMin: -100, rangeMax: 0}
    input: {buffer: '${graph.gen.output.signal}'}
  - name: plot
    module: lineplot
    input: {signal: '${graph.spec.output.buffer}'}
  - name: panel
    module: canvas
    config:
      width: 384
      height: 160
      clearColor: '#0b0b12'
      commands: '[{"op": "rect", "args": [8, 8, 368, 144],
        "color": "#223", "fill": false},
        {"op": "line", "args": [8, 80, 376, 80], "color": "#334"},
        {"op": "text", "args": [16, 16, "carrier: 125 kHz"],
        "color": "#9ab"},
        {"op": "circle", "args": [192, 80, 40], "color": "#4be"}]'
"""


def register_examples() -> None:
    registry.register_example("ml-inference", "ML Inference",
                              _ml_inference_yaml())
    registry.register_example("flight-tracker", "Flight Tracker",
                              FLIGHT_TRACKER)
    registry.register_example("multi-fm", "Multi FM", MULTI_FM)
    registry.register_example("channelizer-64", "64-channel Channelizer",
                              CHANNELIZER_64)
    registry.register_example("signal-generator", "Signal Generator",
                              SIGNAL_GENERATOR)
    registry.register_example("spectrum-analyzer", "Spectrum Analyzer",
                              SPECTRUM_ANALYZER)
    registry.register_example("simple-fm", "Simple FM Receiver",
                              FM_RECEIVER)
    registry.register_example("overlap-add", "Overlap-Add", OVERLAP_ADD)
    registry.register_example("overlap-add-fold", "Overlap-Add-Fold",
                              OVERLAP_ADD_FOLD)
    registry.register_example("overlap-save", "Overlap-Save Filter",
                              OVERLAP_SAVE)
    registry.register_example("canvas-dashboard", "Canvas Dashboard",
                              CANVAS_DASH)


register_examples()
