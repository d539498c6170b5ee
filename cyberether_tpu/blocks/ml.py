"""ml/ domain — model inference.

Reference: onnx_inference wraps an ONNX Runtime session
(/root/reference/include/jetstream/domains/ml/onnx_inference/module.hh:9-17).
TPU-native inference runs models as JAX callables; ONNX graphs are
imported via ``onnxruntime`` when present (not in this image, so that
path is gated) and a ``jax:`` model URI executes a user-registered JAX
model function — the idiomatic TPU route.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import numpy as np

import jax.numpy as jnp

from cyberether_tpu.core.block import simple_block
from cyberether_tpu.core.module import Module
from cyberether_tpu.core.params import Field, Schema
from cyberether_tpu.core.registry import register_block, register_module
from cyberether_tpu.core.tensor import TensorSpec
from cyberether_tpu.core.types import DataType, Device, Taint, \
    ValidationError

#: user-registered JAX models: name -> (fn, output_spec_fn)
_JAX_MODELS: Dict[str, Tuple[Callable, Callable]] = {}


def register_jax_model(name: str, fn: Callable,
                       output_spec: Callable) -> None:
    """Register a JAX model for the inference module.

    ``fn(inputs: dict[str, Array]) -> dict[str, Array]``;
    ``output_spec(input_specs) -> dict[str, TensorSpec]``.
    """
    _JAX_MODELS[name] = (fn, output_spec)


@register_module
class InferenceModule(Module):
    module_type = "onnx_inference"
    taints = Taint.STATELESS
    schema = Schema(
        Field("modelPath", "str", ""),
        Field("inputNames", "list[str]", ["input"]),
        Field("outputNames", "list[str]", ["output"]),
        Field("provider", "str", "auto"),   # auto | jax | ort
        # exact-f32 MatMul/Gemm/Conv (TPU default is bf16-class)
        Field("highPrecision", "bool", False))

    def define(self) -> None:
        self.input_ports = tuple(self.config["inputNames"])
        self.output_ports = tuple(self.config["outputNames"])

    def validate(self) -> None:
        path = self.config["modelPath"]
        if path.startswith("jax:"):
            name = path[4:]
            if name not in _JAX_MODELS:
                raise ValidationError(f"no registered JAX model '{name}'")
            self._fn, spec_fn = _JAX_MODELS[name]
            self._out_specs = spec_fn(self.input_specs)
        elif path.endswith(".onnx"):
            import os

            if not os.path.exists(path):
                raise ValidationError(f"model '{path}' does not exist")
            provider = self.config.get("provider", "auto")
            if provider in ("auto", "jax"):
                try:
                    self._validate_onnx_jax(path)
                    return
                except Exception as e:
                    if provider == "jax":
                        raise ValidationError(
                            f"pure-JAX ONNX import failed: {e}")
                    jax_err = e
            else:
                jax_err = None
            try:
                import onnxruntime
            except ImportError:
                raise ValidationError(
                    "onnxruntime is not available and the pure-JAX "
                    f"ONNX import failed ({jax_err}); use a "
                    "'jax:<name>' model registered via "
                    "register_jax_model")
            self._validate_onnx_ort(path, onnxruntime)
        else:
            raise ValidationError(f"unsupported model path '{path}'")

    def _validate_onnx_jax(self, path: str) -> None:
        """Default ONNX route: hand-parsed protobuf executed as jnp ops
        (ops/onnx_jax.py) — the model runs on-device inside the fused
        segment, no host round trip (unlike the reference's ORT wrapper,
        src/domains/ml/onnx_inference/module_impl.cc)."""
        import jax

        from cyberether_tpu.ops.onnx_jax import build_fn, load_model

        graph = load_model(path)
        fn = build_fn(graph, precision="highest"
                      if self.config["highPrecision"] else None)
        missing = [n for n in self.config["inputNames"]
                   if n not in graph.input_names]
        if missing and graph.input_names:
            raise ValidationError(
                f"model has no inputs {missing} "
                f"(model inputs: {graph.input_names})")
        for name in self.config["outputNames"]:
            if name not in graph.output_names:
                raise ValidationError(
                    f"model has no output '{name}' "
                    f"(model outputs: {graph.output_names})")
        # infer output specs by abstract tracing at the wired shapes
        shapes = {n: jax.ShapeDtypeStruct(s.shape, s.dtype.np_dtype)
                  for n, s in self.input_specs.items()}
        try:
            out_shapes = jax.eval_shape(fn, shapes)
        except Exception as e:
            raise ValidationError(
                f"ONNX graph does not trace at the wired input "
                f"shapes: {e}")
        self._out_specs = {
            name: TensorSpec(tuple(out_shapes[name].shape),
                             DataType.from_np(out_shapes[name].dtype),
                             self.device)
            for name in self.config["outputNames"]}
        self._fn = fn
        self._session = None

    def _validate_onnx_ort(self, path: str, onnxruntime) -> None:
        from cyberether_tpu.core.types import Runtime

        self._session = onnxruntime.InferenceSession(
            path, providers=["CPUExecutionProvider"])
        # ONNX sessions execute host-side (the reference's ORT
        # wrapper); switch this instance to the HOST runtime so the
        # scheduler routes it as a host compute segment
        self.runtime = Runtime.HOST
        self._out_specs = {}
        sess_outputs = {o.name: o for o in
                        self._session.get_outputs()}
        for name in self.config["outputNames"]:
            if name not in sess_outputs:
                raise ValidationError(
                    f"model has no output '{name}'")
            o = sess_outputs[name]
            shape = tuple(int(d) if isinstance(d, int) else 1
                          for d in o.shape)
            self._out_specs[name] = TensorSpec(
                shape, DataType.F32, Device.CPU)
        self._fn = None

    def create(self) -> Dict[str, TensorSpec]:
        return dict(self._out_specs)

    def apply(self, inputs, state):
        return dict(self._fn(inputs)), state

    def host_execute(self, inputs):
        outs = self._session.run(list(self.config["outputNames"]),
                                 {k: np.asarray(v)
                                  for k, v in inputs.items()})
        return dict(zip(self.config["outputNames"], outs))


register_block(simple_block("onnx_inference"))
