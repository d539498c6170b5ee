"""ONNX inference path (VERDICT r1 item 10, r3 item 5): a committed
``.onnx`` fixture runs through the onnx_inference module via the
pure-JAX executor (ops/onnx_jax.py) — hand-parsed protobuf, executed
as jnp ops on-device, NO onnxruntime needed.  The ORT route stays as
an optional provider, exercised when the lib is present.

Reference:
/root/reference/include/jetstream/domains/ml/onnx_inference/module.hh:9-17,
/root/reference/src/domains/ml/onnx_inference/module_impl.cc.
"""

import pathlib
import sys

import numpy as np
import pytest

from cyberether_tpu.core.types import ValidationError
from cyberether_tpu.testing import TestContext

FIXTURES = pathlib.Path(__file__).resolve().parent.parent / "fixtures"
SUPPORT = pathlib.Path(__file__).resolve().parent.parent / "support"
sys.path.insert(0, str(SUPPORT))

from onnx_build import (build_mlp_fixture, graph, model,  # noqa: E402
                        node, reference_mlp, tensor_proto, value_info)


def test_fixture_is_reproducible():
    """The committed binary matches the committed generator — guards
    both the writer and the fixture against silent drift."""
    assert (FIXTURES / "mlp.onnx").read_bytes() == build_mlp_fixture()


def test_onnx_inference_runs_committed_fixture():
    """Conv->Relu->MaxPool->Flatten->Gemm->Softmax through the module,
    checked against an independent numpy golden."""
    x = np.random.default_rng(0).standard_normal((1, 1, 8, 8)) \
        .astype(np.float32)
    ctx = TestContext("onnx_inference",
                      {"modelPath": str(FIXTURES / "mlp.onnx")})
    ctx.set_input("input", x)
    ctx.run()
    got = np.asarray(ctx.output("output"))
    np.testing.assert_allclose(got, reference_mlp(x), atol=1e-5)
    assert abs(got.sum() - 1.0) < 1e-5   # softmax normalized


def test_onnx_jax_op_subset():
    """Elementwise / shape / reduce ops round-trip the parser and
    executor against numpy."""
    from cyberether_tpu.ops.onnx_jax import build_fn, parse_model

    rng = np.random.default_rng(3)
    w = rng.standard_normal((6, 4)).astype(np.float32)
    nodes = [
        node("MatMul", ["x", "w"], ["mm"]),
        node("Sigmoid", ["mm"], ["sg"]),
        node("Transpose", ["sg"], ["tp"], {"perm": [1, 0]}),
        node("ReduceMean", ["tp"], ["rm"],
             {"axes": [1], "keepdims": 1}),
        node("Concat", ["rm", "rm"], ["cc"], {"axis": 1}),
        node("Reshape", ["cc", "shape8"], ["out"]),
    ]
    g = graph(
        nodes, "subset",
        inputs=[value_info("x", 1, [3, 6])],
        outputs=[value_info("out", 1, [8])],
        initializers=[
            tensor_proto("w", w),
            tensor_proto("shape8", np.asarray([8], np.int64))])
    fn = build_fn(parse_model(model(g)))
    x = rng.standard_normal((3, 6)).astype(np.float32)
    got = np.asarray(fn({"x": x})["out"])
    sg = 1.0 / (1.0 + np.exp(-(x @ w)))
    ref = np.concatenate([sg.T.mean(1, keepdims=True)] * 2,
                         axis=1).reshape(8)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_onnx_unsupported_op_fails_at_validate():
    """An op outside the subset must fail at build/validate time with
    the op named — never mid-run."""
    g = graph([node("Upsample", ["x"], ["out"])], "bad",
              inputs=[value_info("x", 1, [2, 2])],
              outputs=[value_info("out", 1, [4, 4])])
    data = model(g)
    from cyberether_tpu.ops.onnx_jax import (UnsupportedOnnxOp,
                                             build_fn, parse_model)
    with pytest.raises(UnsupportedOnnxOp, match="Upsample"):
        build_fn(parse_model(data))


def test_onnx_unsupported_without_ort_raises_cleanly(tmp_path):
    """Absent onnxruntime, a model the JAX subset cannot run must fail
    with a ValidationError pointing at the jax: route."""
    try:
        import onnxruntime  # noqa: F401
        pytest.skip("onnxruntime present; ORT would execute this")
    except ImportError:
        pass
    g = graph([node("Upsample", ["input"], ["output"])], "bad",
              inputs=[value_info("input", 1, [2, 2])],
              outputs=[value_info("output", 1, [4, 4])])
    path = tmp_path / "bad.onnx"
    path.write_bytes(model(g))
    ctx = TestContext("onnx_inference", {"modelPath": str(path)})
    ctx.set_input("input", np.zeros((2, 2), np.float32))
    with pytest.raises(ValidationError, match="onnxruntime"):
        ctx.run()


def test_onnx_bad_output_name(tmp_path):
    path = tmp_path / "mlp.onnx"
    path.write_bytes(build_mlp_fixture())
    ctx = TestContext("onnx_inference",
                      {"modelPath": str(path),
                       "outputNames": ["nope"], "provider": "jax"})
    ctx.set_input("input", np.zeros((1, 1, 8, 8), np.float32))
    with pytest.raises(ValidationError, match="nope"):
        ctx.run()


def test_onnx_ort_provider_optional(tmp_path):
    """When onnxruntime IS present (CI/dev box), provider=ort routes
    through the host-side session and agrees with the JAX executor."""
    pytest.importorskip("onnxruntime")
    path = tmp_path / "mlp.onnx"
    path.write_bytes(build_mlp_fixture())
    x = np.random.default_rng(1).standard_normal((1, 1, 8, 8)) \
        .astype(np.float32)
    ctx = TestContext("onnx_inference",
                      {"modelPath": str(path), "provider": "ort"})
    ctx.set_input("input", x)
    ctx.run()
    np.testing.assert_allclose(np.asarray(ctx.output("output")),
                               reference_mlp(x), atol=1e-5)


def test_jax_model_route():
    """The direct jax: route stays exercised everywhere."""
    from cyberether_tpu.blocks.ml import register_jax_model
    from cyberether_tpu.core.tensor import TensorSpec
    from cyberether_tpu.core.types import DataType

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


def test_onnx_same_pad_stride2():
    """SAME_UPPER with stride 2 on an odd spatial size needs
    input-size-dependent padding (review finding: the kernel-only
    formula produced wrong shapes silently)."""
    from cyberether_tpu.ops.onnx_jax import build_fn, parse_model

    rng = np.random.default_rng(5)
    w = rng.standard_normal((2, 1, 3, 3)).astype(np.float32)
    g = graph(
        [node("Conv", ["x", "w"], ["out"],
              {"kernel_shape": [3, 3], "strides": [2, 2],
               "auto_pad": "SAME_UPPER"})],
        "same2",
        inputs=[value_info("x", 1, [1, 1, 7, 7])],
        outputs=[value_info("out", 1, [1, 2, 4, 4])],
        initializers=[tensor_proto("w", w)])
    fn = build_fn(parse_model(model(g)))
    x = rng.standard_normal((1, 1, 7, 7)).astype(np.float32)
    got = np.asarray(fn({"x": x})["out"])
    assert got.shape == (1, 2, 4, 4)           # ceil(7/2) = 4
    # golden: pad total = (ceil(7/2)-1)*2 + 3 - 7 = 2 -> (1, 1)
    xp = np.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    ref = np.zeros((1, 2, 4, 4), np.float32)
    for o in range(2):
        for i in range(4):
            for j in range(4):
                ref[0, o, i, j] = np.sum(
                    xp[0, 0, 2 * i:2 * i + 3, 2 * j:2 * j + 3]
                    * w[o, 0])
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_benchmark_plugin_case_on_builtin_component_unloads():
    """A plugin benchmark case attached to a BUILTIN component must
    unload with the plugin without deleting the builtin entry (review
    finding)."""
    from cyberether_tpu import benchmark
    from cyberether_tpu.core.registry import registry

    before = len(registry.benchmark("fft").cases)
    with registry.origin("case-test-plugin"):
        benchmark.register_case(benchmark.Case(
            "fft", "plugin-variant", {"forward": True}, dict))
    assert len(registry.benchmark("fft").cases) == before + 1
    removed = registry.unregister_origin("case-test-plugin")
    assert removed == 1
    assert "fft" in benchmark.list_components()   # entry survives
    assert len(registry.benchmark("fft").cases) == before


def test_onnx_same_pad_dilation_and_pool_defaults():
    """Review findings: SAME padding must use the EFFECTIVE kernel
    (k-1)*dilation + 1, and pooling strides default to 1 (not the
    kernel shape) per the onnx spec."""
    from cyberether_tpu.ops.onnx_jax import build_fn, parse_model

    rng = np.random.default_rng(7)
    w = rng.standard_normal((1, 1, 3, 3)).astype(np.float32)
    g = graph(
        [node("Conv", ["x", "w"], ["out"],
              {"kernel_shape": [3, 3], "dilations": [2, 2],
               "auto_pad": "SAME_UPPER"})],
        "dil",
        inputs=[value_info("x", 1, [1, 1, 8, 8])],
        outputs=[value_info("out", 1, [1, 1, 8, 8])],
        initializers=[tensor_proto("w", w)])
    fn = build_fn(parse_model(model(g)))
    x = rng.standard_normal((1, 1, 8, 8)).astype(np.float32)
    assert np.asarray(fn({"x": x})["out"]).shape == (1, 1, 8, 8)

    g2 = graph(
        [node("MaxPool", ["x"], ["out"],
              {"kernel_shape": [2, 2], "auto_pad": "SAME_UPPER"})],
        "poolstride",
        inputs=[value_info("x", 1, [1, 1, 4, 4])],
        outputs=[value_info("out", 1, [1, 1, 4, 4])])
    fn2 = build_fn(parse_model(model(g2)))
    got = np.asarray(fn2({"x": x[:, :, :4, :4]})["out"])
    assert got.shape == (1, 1, 4, 4)           # stride defaults to 1


def _torch_export(net, x, monkeypatch, opset=13):
    """torch.onnx.export to bytes.  The torchscript exporter's last
    step (splicing custom onnxscript functions) needs the `onnx`
    package even when there are none to splice — shim it to identity,
    which is exactly its behavior for plain aten models."""
    import io

    import torch

    try:
        from torch.onnx._internal.torchscript_exporter import \
            onnx_proto_utils
    except ImportError:
        try:        # older torch layout
            from torch.onnx._internal import onnx_proto_utils
        except ImportError:
            pytest.skip("torch exporter internals moved")
    monkeypatch.setattr(onnx_proto_utils, "_add_onnxscript_fn",
                        lambda model_bytes, custom_opsets: model_bytes)
    buf = io.BytesIO()
    torch.onnx.export(net, (x,), buf, input_names=["input"],
                      output_names=["output"], opset_version=opset,
                      dynamo=False)
    return buf.getvalue()


def test_torch_exported_convnet(monkeypatch, tmp_path):
    """A real torch.onnx export (Conv/BN/ReLU/mean/Linear/Softmax)
    through the onnx_inference MODULE — exercises genuine exporter
    output (BN folded into Conv, Constant nodes, Gemm transB) rather
    than hand-built graphs."""
    torch = pytest.importorskip("torch")
    nn = torch.nn

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = nn.Conv2d(3, 8, 3, stride=2, padding=1)
            self.bn = nn.BatchNorm2d(8)
            self.c2 = nn.Conv2d(8, 16, 3, padding=1)
            self.fc = nn.Linear(16, 10)

        def forward(self, x):
            x = torch.relu(self.bn(self.c1(x)))
            x = torch.relu(self.c2(x))
            x = x.mean(dim=(2, 3))
            return torch.softmax(self.fc(x), dim=-1)

    torch.manual_seed(0)
    net = Net().eval()
    x = torch.randn(2, 3, 16, 16)
    path = tmp_path / "convnet.onnx"
    path.write_bytes(_torch_export(net, x, monkeypatch))

    ctx = TestContext("onnx_inference", {"modelPath": str(path),
                                         "provider": "jax"})
    ctx.set_input("input", np.asarray(x))
    ctx.run()
    got = np.asarray(ctx.output("output"))
    np.testing.assert_allclose(got, net(x).detach().numpy(), atol=1e-5)


def test_torch_exported_attention_block(monkeypatch):
    """A hand-rolled pre-LN multi-head attention block (LayerNorm
    decomposed at opset 13, GELU via Erf, batched 4D MatMul attention)
    exported by torch and executed by the pure-JAX route."""
    torch = pytest.importorskip("torch")
    nn = torch.nn
    from cyberether_tpu.ops.onnx_jax import build_fn, parse_model

    class Block(nn.Module):
        def __init__(self, d=32, h=4):
            super().__init__()
            self.h, self.dk = h, d // h
            self.ln1 = nn.LayerNorm(d)
            self.ln2 = nn.LayerNorm(d)
            self.q = nn.Linear(d, d)
            self.k = nn.Linear(d, d)
            self.v = nn.Linear(d, d)
            self.o = nn.Linear(d, d)
            self.ff = nn.Sequential(nn.Linear(d, 64), nn.GELU(),
                                    nn.Linear(64, d))

        def forward(self, x):
            b, t, d = x.shape
            y = self.ln1(x)

            def split(z):
                return z.view(b, t, self.h, self.dk).transpose(1, 2)

            q, k, v = split(self.q(y)), split(self.k(y)), \
                split(self.v(y))
            a = torch.softmax(
                q @ k.transpose(-1, -2) / self.dk ** 0.5, -1)
            y = (a @ v).transpose(1, 2).reshape(b, t, d)
            x = x + self.o(y)
            return x + self.ff(self.ln2(x))

    torch.manual_seed(0)
    net = Block().eval()
    x = torch.randn(2, 10, 32)
    g = parse_model(_torch_export(net, x, monkeypatch))
    ops = {n.op_type for n in g.nodes}
    assert {"MatMul", "Softmax", "Erf", "ReduceMean"} <= ops
    out = build_fn(g)({"input": np.asarray(x)})
    np.testing.assert_allclose(np.asarray(out["output"]),
                               net(x).detach().numpy(), atol=1e-5)


def test_onnx_jax_extended_op_subset():
    """Round-4 op additions: comparisons/Where, variadic Min/Max,
    Expand, Trilu, Range, ConstantOfShape, ArgMax, ReduceMax/Min,
    Gelu/Sin/Cos — each against a numpy golden."""
    from cyberether_tpu.ops.onnx_jax import build_fn, parse_model

    rng = np.random.default_rng(7)
    x = rng.standard_normal((3, 4)).astype(np.float32)
    y = rng.standard_normal((3, 4)).astype(np.float32)

    g = graph(
        [node("Greater", ["x", "y"], ["gt"]),
         node("Where", ["gt", "x", "y"], ["mx"]),
         node("Max", ["x", "y"], ["mx2"]),
         node("Min", ["x", "y", "x"], ["mn"]),
         node("Equal", ["mx", "mx2"], ["eq"]),
         node("Trilu", ["x"], ["tu"], {"upper": 1}),
         node("ReduceMax", ["x"], ["rmax"], {"keepdims": 0}),
         node("ReduceMin", ["x"], ["rmin"], {"keepdims": 0}),
         node("ArgMax", ["x"], ["am"], {"axis": 1, "keepdims": 0}),
         node("Sin", ["x"], ["sn"]),
         node("Cos", ["x"], ["cs"]),
         node("Gelu", ["x"], ["gl"]),
         node("Expand", ["x", "eshape"], ["ex"]),
         node("Range", ["r0", "r1", "r2"], ["rg"]),
         node("ConstantOfShape", ["cshape"], ["cz"],
              {"value": np.asarray([2.5], np.float32)})],
        "ext",
        inputs=[value_info("x", 1, [3, 4]),
                value_info("y", 1, [3, 4])],
        outputs=[value_info(n, 1, []) for n in
                 ("mx", "mx2", "mn", "eq", "tu", "rmax", "rmin",
                  "am", "sn", "cs", "gl", "ex", "rg", "cz")],
        initializers=[
            tensor_proto("eshape", np.asarray([2, 3, 4], np.int64)),
            tensor_proto("r0", np.asarray(0, np.int64)),
            tensor_proto("r1", np.asarray(8, np.int64)),
            tensor_proto("r2", np.asarray(2, np.int64)),
            tensor_proto("cshape", np.asarray([2, 2], np.int64))])
    out = build_fn(parse_model(model(g)))({"x": x, "y": y})

    np.testing.assert_allclose(out["mx"], np.maximum(x, y))
    np.testing.assert_allclose(out["mx2"], np.maximum(x, y))
    np.testing.assert_allclose(out["mn"], np.minimum(x, y))
    assert np.asarray(out["eq"]).all()
    np.testing.assert_allclose(out["tu"], np.triu(x))
    np.testing.assert_allclose(out["rmax"], x.max(), rtol=1e-6)
    np.testing.assert_allclose(out["rmin"], x.min(), rtol=1e-6)
    np.testing.assert_array_equal(out["am"], x.argmax(1))
    np.testing.assert_allclose(out["sn"], np.sin(x), atol=1e-6)
    np.testing.assert_allclose(out["cs"], np.cos(x), atol=1e-6)
    from scipy.stats import norm

    np.testing.assert_allclose(out["gl"], x * norm.cdf(x), atol=1e-5)
    assert np.asarray(out["ex"]).shape == (2, 3, 4)
    np.testing.assert_array_equal(out["rg"], np.arange(0, 8, 2))
    np.testing.assert_allclose(out["cz"],
                               np.full((2, 2), 2.5, np.float32))


def test_onnx_jax_round5_op_batch():
    """Round-5 op additions: variadic Sum/Mean, logical And/Or/Xor/
    Not, Sign, Tile, GatherElements, DepthToSpace/SpaceToDepth
    roundtrip, TopK (values + indices, largest and smallest), and the
    ReduceL1/L2/SumSquare/LogSum/LogSumExp family — numpy goldens."""
    from cyberether_tpu.ops.onnx_jax import build_fn, parse_model

    rng = np.random.default_rng(11)
    x = rng.standard_normal((3, 4)).astype(np.float32)
    y = rng.standard_normal((3, 4)).astype(np.float32)
    img = rng.standard_normal((1, 8, 4, 6)).astype(np.float32)
    idx = rng.integers(0, 3, (2, 4)).astype(np.int64)

    g = graph(
        [node("Sum", ["x", "y", "x"], ["sm"]),
         node("Mean", ["x", "y"], ["mean"]),
         node("Greater", ["x", "y"], ["gt"]),
         node("Less", ["x", "y"], ["lt"]),
         node("And", ["gt", "lt"], ["and_"]),
         node("Or", ["gt", "lt"], ["or_"]),
         node("Xor", ["gt", "lt"], ["xor_"]),
         node("Not", ["gt"], ["not_"]),
         node("Sign", ["x"], ["sg"]),
         node("Tile", ["x", "reps"], ["tl"]),
         node("GatherElements", ["x", "gidx"], ["ge"], {"axis": 0}),
         node("SpaceToDepth", ["img"], ["s2d"], {"blocksize": 2}),
         node("DepthToSpace", ["s2d"], ["d2s"],
              {"blocksize": 2, "mode": "DCR"}),
         node("TopK", ["x", "kk"], ["tv", "ti"], {"axis": 1}),
         node("TopK", ["x", "kk"], ["bv", "bi"],
              {"axis": 1, "largest": 0}),
         node("ReduceL1", ["x"], ["l1"], {"keepdims": 0}),
         node("ReduceL2", ["x"], ["l2"], {"keepdims": 0}),
         node("ReduceSumSquare", ["x"], ["ss"], {"keepdims": 0}),
         node("ReduceLogSumExp", ["x"], ["lse"], {"keepdims": 0})],
        "r5ops",
        inputs=[value_info("x", 1, [3, 4]),
                value_info("y", 1, [3, 4]),
                value_info("img", 1, [1, 8, 4, 6]),
                value_info("gidx", 7, [2, 4])],
        outputs=[value_info(n, 1, []) for n in
                 ("sm", "mean", "and_", "or_", "xor_", "not_", "sg",
                  "tl", "ge", "s2d", "d2s", "tv", "ti", "bv", "bi",
                  "l1", "l2", "ss", "lse")],
        initializers=[
            tensor_proto("reps", np.asarray([2, 3], np.int64)),
            tensor_proto("kk", np.asarray([2], np.int64))])
    out = build_fn(parse_model(model(g)))(
        {"x": x, "y": y, "img": img, "gidx": idx})

    np.testing.assert_allclose(out["sm"], x + y + x, atol=1e-6)
    np.testing.assert_allclose(out["mean"], (x + y) / 2, atol=1e-6)
    gt, lt = x > y, x < y
    np.testing.assert_array_equal(out["and_"], gt & lt)
    np.testing.assert_array_equal(out["or_"], gt | lt)
    np.testing.assert_array_equal(out["xor_"], gt ^ lt)
    np.testing.assert_array_equal(out["not_"], ~gt)
    np.testing.assert_allclose(out["sg"], np.sign(x))
    np.testing.assert_allclose(out["tl"], np.tile(x, (2, 3)))
    np.testing.assert_allclose(
        out["ge"], np.take_along_axis(x, idx, axis=0))
    # SpaceToDepth -> DepthToSpace(DCR) round-trips exactly
    assert np.asarray(out["s2d"]).shape == (1, 32, 2, 3)
    np.testing.assert_allclose(out["d2s"], img)
    sv = np.sort(x, axis=1)
    np.testing.assert_allclose(out["tv"], sv[:, ::-1][:, :2],
                               atol=1e-6)
    np.testing.assert_allclose(out["bv"], sv[:, :2], atol=1e-6)
    np.testing.assert_array_equal(
        np.take_along_axis(x, np.asarray(out["ti"]), axis=1),
        np.asarray(out["tv"]))
    np.testing.assert_allclose(out["l1"], np.abs(x).sum(), rtol=1e-6)
    np.testing.assert_allclose(out["l2"], np.sqrt((x * x).sum()),
                               rtol=1e-6)
    np.testing.assert_allclose(out["ss"], (x * x).sum(), rtol=1e-6)
    np.testing.assert_allclose(
        out["lse"], np.log(np.exp(x).sum()), rtol=1e-5)


def test_torch_exported_causal_block_both_opsets(monkeypatch):
    """A causal-masked attention block (tril buffer + masked_fill)
    exports with Where/Split at opset 13 and additionally native
    LayerNormalization at opset 17 — both execute exactly."""
    torch = pytest.importorskip("torch")
    nn = torch.nn
    from cyberether_tpu.ops.onnx_jax import build_fn, parse_model

    class CausalBlock(nn.Module):
        def __init__(self, d=32, h=4, t=10):
            super().__init__()
            self.h, self.dk = h, d // h
            self.ln = nn.LayerNorm(d)
            self.qkv = nn.Linear(d, 3 * d)
            self.o = nn.Linear(d, d)
            self.register_buffer(
                "mask", torch.tril(torch.ones(t, t)).bool())

        def forward(self, x):
            b, t, d = x.shape
            q, k, v = self.qkv(self.ln(x)).split(d, dim=-1)

            def sp(z):
                return z.view(b, t, self.h, self.dk).transpose(1, 2)

            q, k, v = sp(q), sp(k), sp(v)
            s = q @ k.transpose(-1, -2) / self.dk ** 0.5
            s = s.masked_fill(~self.mask[:t, :t], float("-inf"))
            y = (torch.softmax(s, -1) @ v).transpose(1, 2) \
                .reshape(b, t, d)
            return x + self.o(torch.nn.functional.gelu(y))

    torch.manual_seed(1)
    net = CausalBlock().eval()
    x = torch.randn(2, 10, 32)
    want = net(x).detach().numpy()
    for opset, op_probe in ((13, "Where"), (17,
                                            "LayerNormalization")):
        g = parse_model(_torch_export(net, x, monkeypatch,
                                      opset=opset))
        assert op_probe in {n.op_type for n in g.nodes}
        out = build_fn(g)({"input": np.asarray(x)})
        np.testing.assert_allclose(np.asarray(out["output"]), want,
                                   atol=1e-5)


def test_high_precision_knob(monkeypatch, tmp_path):
    """highPrecision threads Precision.HIGHEST into every
    MatMul/Gemm/Conv (TPU default is bf16-class; measured 3.3e-3 off
    on an attention block, ~1e-5 with the knob).  On CPU both routes
    are exact — this asserts plumbing, not numerics."""
    torch = pytest.importorskip("torch")
    nn = torch.nn
    from cyberether_tpu.ops.onnx_jax import build_fn, parse_model

    torch.manual_seed(2)
    net = nn.Sequential(nn.Linear(8, 16), nn.Tanh(),
                        nn.Linear(16, 4)).eval()
    x = torch.randn(3, 8)
    raw = _torch_export(net, x, monkeypatch)
    g = parse_model(raw)
    out = build_fn(g, precision="highest")({"input": np.asarray(x)})
    np.testing.assert_allclose(np.asarray(out["output"]),
                               net(x).detach().numpy(), atol=1e-5)

    path = tmp_path / "mlp.onnx"
    path.write_bytes(raw)
    ctx = TestContext("onnx_inference",
                      {"modelPath": str(path), "provider": "jax",
                       "highPrecision": True})
    ctx.set_input("input", np.asarray(x))
    ctx.run()
    np.testing.assert_allclose(np.asarray(ctx.output("output")),
                               net(x).detach().numpy(), atol=1e-5)


def test_onnx_pad_op():
    """ONNX Pad: begins-then-ends layout, constant value via operand
    or attribute, reflect/edge modes."""
    from cyberether_tpu.ops.onnx_jax import build_fn, parse_model

    x = np.arange(6, dtype=np.float32).reshape(2, 3)
    g = graph(
        [node("Pad", ["x", "pads", "val"], ["pc"]),
         node("Pad", ["x", "pads"], ["pr"], {"mode": "reflect"})],
        "pad",
        inputs=[value_info("x", 1, [2, 3])],
        outputs=[value_info("pc", 1, []), value_info("pr", 1, [])],
        initializers=[
            tensor_proto("pads", np.asarray([1, 0, 0, 2], np.int64)),
            tensor_proto("val", np.asarray([5.0], np.float32))])
    out = build_fn(parse_model(model(g)))({"x": x})
    np.testing.assert_allclose(
        out["pc"], np.pad(x, [(1, 0), (0, 2)], constant_values=5.0))
    np.testing.assert_allclose(
        out["pr"], np.pad(x, [(1, 0), (0, 2)], mode="reflect"))


def test_onnx_pad_axes_crop_and_argmax_last(monkeypatch):
    """Review findings: opset-18 Pad `axes` operand, negative pads
    (ONNX crop semantics), ArgMax select_last_index."""
    from cyberether_tpu.ops.onnx_jax import build_fn, parse_model

    x = np.arange(6, dtype=np.float32).reshape(2, 3)
    g = graph(
        [node("Pad", ["x", "p2", "", "axes1"], ["pa"]),
         node("Pad", ["x", "pneg"], ["pcrop"]),
         node("ArgMax", ["t"], ["am"],
              {"axis": 0, "keepdims": 0, "select_last_index": 1})],
        "pad2",
        inputs=[value_info("x", 1, [2, 3]),
                value_info("t", 1, [3])],
        outputs=[value_info("pa", 1, []), value_info("pcrop", 1, []),
                 value_info("am", 7, [])],
        initializers=[
            tensor_proto("p2", np.asarray([1, 2], np.int64)),
            tensor_proto("axes1", np.asarray([1], np.int64)),
            tensor_proto("pneg", np.asarray([-1, 0, 0, 1], np.int64))])
    out = build_fn(parse_model(model(g)))(
        {"x": x, "t": np.asarray([1.0, 3.0, 3.0], np.float32)})
    # axes=[1]: pad only axis 1 by (1, 2) -> (2, 6)
    np.testing.assert_allclose(out["pa"],
                               np.pad(x, [(0, 0), (1, 2)]))
    # pads=[-1,0,0,1]: crop first row, pad one col -> (1, 4)
    np.testing.assert_allclose(
        out["pcrop"], np.pad(x, [(0, 0), (0, 1)])[1:, :])
    assert int(out["am"]) == 2          # last max index on a tie


def test_wbfm_coherent_short_input():
    """Review finding: short inputs (nf < tile_r) must keep the
    crows-multiple tile invariant — previously a trace-time reshape
    crash for nf % crows != 0."""
    import jax.numpy as jnp

    from cyberether_tpu.ops.pallas_kernels import wbfm_fused_v2
    from cyberether_tpu.models.wbfm import WbfmReceiver

    rx = WbfmReceiver(audio_decim=6)        # crows = 3
    n = 100 * 128                           # nf = 100, not % 3
    iq = jnp.asarray(rx.make_input(n))
    audio = wbfm_fused_v2(iq, rx._taps, rx.init_state()["fir_hist"],
                          rx._ref, interpret=True, coherent_decim=6)
    assert audio.shape == (n // 6,)
    # against the classic path, averaged per window: statistical
    # agreement on the strong FM tone
    demod = wbfm_fused_v2(iq, rx._taps, rx.init_state()["fir_hist"],
                          rx._ref, interpret=True)
    k = (n // 6) * 6                        # n itself is not % 6
    classic = np.asarray(demod)[:k].reshape(-1, 6).mean(-1)
    d = np.abs(np.asarray(audio)[10:-10] - classic[10:-10]).mean()
    assert d < 5e-3, d


def test_onnx_softmax_opset_semantics():
    """Softmax before opset 13 is coalesced (flatten-to-2D from axis);
    opset>=13 is per-axis (ADVICE r4)."""
    from cyberether_tpu.ops.onnx_jax import build_fn, parse_model

    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 3, 4)).astype(np.float32)
    g = graph([node("Softmax", ["x"], ["out"], {"axis": 1})],
              "sm", inputs=[value_info("x", 1, [2, 3, 4])],
              outputs=[value_info("out", 1, [2, 3, 4])])

    got11 = np.asarray(build_fn(parse_model(model(g, opset=11)))(
        {"x": x})["out"])
    flat = x.reshape(2, 12)
    e = np.exp(flat - flat.max(axis=1, keepdims=True))
    ref11 = (e / e.sum(axis=1, keepdims=True)).reshape(2, 3, 4)
    np.testing.assert_allclose(got11, ref11, atol=1e-6)

    got13 = np.asarray(build_fn(parse_model(model(g, opset=13)))(
        {"x": x})["out"])
    e = np.exp(x - x.max(axis=1, keepdims=True))
    ref13 = e / e.sum(axis=1, keepdims=True)
    np.testing.assert_allclose(got13, ref13, atol=1e-6)
    assert not np.allclose(ref11, ref13)       # semantics differ


def test_onnx_fp16_initializer_int32_data():
    """float16 initializers stored via int32_data hold raw uint16 bit
    patterns — must be reinterpreted, not numerically cast (ADVICE
    r4)."""
    from cyberether_tpu.ops.onnx_jax import parse_model
    from tests.support.onnx_build import f_bytes, f_string, f_varint

    w = np.asarray([1.5, -2.25, 0.007812, 65504.0], np.float16)
    bits = w.view(np.uint16)
    tp = f_varint(1, 4)                       # dims
    tp += f_varint(2, 10)                     # data_type = FLOAT16
    for b in bits:
        tp += f_varint(5, int(b))             # int32_data (unpacked)
    tp += f_string(8, "w16")
    g = graph([node("Identity", ["w16"], ["out"])], "fp16",
              inputs=[], outputs=[value_info("out", 10, [4])],
              initializers=[tp])
    parsed = parse_model(model(g))
    np.testing.assert_array_equal(
        parsed.initializers["w16"].view(np.uint16), bits)
    assert parsed.initializers["w16"].dtype == np.float16


def test_onnx_instancenorm_and_resize_vs_torch():
    """InstanceNormalization and Resize (nearest/linear) against
    torch golden behavior (the export-common configurations)."""
    import torch
    import torch.nn.functional as F

    from cyberether_tpu.ops.onnx_jax import build_fn, parse_model

    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 3, 9, 7)).astype(np.float32)
    scale = rng.standard_normal(3).astype(np.float32)
    bias = rng.standard_normal(3).astype(np.float32)

    g = graph([node("InstanceNormalization", ["x", "s", "b"], ["out"],
                    {"epsilon": 1e-5})],
              "in", inputs=[value_info("x", 1, [2, 3, 9, 7])],
              outputs=[value_info("out", 1, [2, 3, 9, 7])],
              initializers=[tensor_proto("s", scale),
                            tensor_proto("b", bias)])
    got = np.asarray(build_fn(parse_model(model(g)))({"x": x})["out"])
    m = torch.nn.InstanceNorm2d(3, affine=True, eps=1e-5)
    with torch.no_grad():
        m.weight.copy_(torch.from_numpy(scale))
        m.bias.copy_(torch.from_numpy(bias))
        ref = m(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, ref, atol=2e-5)

    # nearest, asymmetric+floor = torch F.interpolate default nearest
    scales = np.asarray([1, 1, 2, 2], np.float32)
    g = graph([node("Resize", ["x", "", "sc"], ["out"],
                    {"mode": "nearest",
                     "coordinate_transformation_mode": "asymmetric",
                     "nearest_mode": "floor"})],
              "rs", inputs=[value_info("x", 1, [2, 3, 9, 7])],
              outputs=[value_info("out", 1, [2, 3, 18, 14])],
              initializers=[tensor_proto("sc", scales)])
    got = np.asarray(build_fn(parse_model(model(g)))({"x": x})["out"])
    ref = F.interpolate(torch.from_numpy(x), scale_factor=2,
                        mode="nearest").numpy()
    np.testing.assert_array_equal(got, ref)

    # linear, pytorch_half_pixel = bilinear align_corners=False
    g = graph([node("Resize", ["x", "", "sc"], ["out"],
                    {"mode": "linear",
                     "coordinate_transformation_mode":
                         "pytorch_half_pixel"})],
              "rs2", inputs=[value_info("x", 1, [2, 3, 9, 7])],
              outputs=[value_info("out", 1, [2, 3, 18, 14])],
              initializers=[tensor_proto("sc", scales)])
    got = np.asarray(build_fn(parse_model(model(g)))({"x": x})["out"])
    ref = F.interpolate(torch.from_numpy(x), scale_factor=2,
                        mode="bilinear", align_corners=False).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-5)


def _torch_gru_onnx_weights(m, H):
    """torch GRU layer params -> ONNX (W, R, B) with z,r,h gate order
    (torch order is r,z,n; ONNX linear_before_reset=1 matches torch's
    n-gate formula)."""
    import torch

    def reorder(w):
        r, z, nn_ = torch.split(w, H, dim=0)
        return torch.cat([z, r, nn_], dim=0)

    Ws, Rs, Bs = [], [], []
    for sfx in ([""] if not m.bidirectional else ["", "_reverse"]):
        Ws.append(reorder(getattr(m, f"weight_ih_l0{sfx}")))
        Rs.append(reorder(getattr(m, f"weight_hh_l0{sfx}")))
        Bs.append(torch.cat([
            reorder(getattr(m, f"bias_ih_l0{sfx}")),
            reorder(getattr(m, f"bias_hh_l0{sfx}"))]))
    return (torch.stack(Ws).detach().numpy(),
            torch.stack(Rs).detach().numpy(),
            torch.stack(Bs).detach().numpy())


def test_onnx_gru_vs_torch():
    import torch

    from cyberether_tpu.ops.onnx_jax import build_fn, parse_model

    torch.manual_seed(5)
    seq, batch, I, H = 7, 3, 4, 6
    for bidi in (False, True):
        m = torch.nn.GRU(I, H, bidirectional=bidi)
        W, R, B = _torch_gru_onnx_weights(m, H)
        dirs = 2 if bidi else 1
        x = np.random.default_rng(6).standard_normal(
            (seq, batch, I)).astype(np.float32)
        attrs = {"hidden_size": H, "linear_before_reset": 1}
        if bidi:
            attrs["direction"] = "bidirectional"
        g = graph([node("GRU", ["x", "W", "R", "B"], ["Y", "Yh"],
                        attrs)],
                  "gru", inputs=[value_info("x", 1, [seq, batch, I])],
                  outputs=[value_info("Y", 1,
                                      [seq, dirs, batch, H]),
                           value_info("Yh", 1, [dirs, batch, H])],
                  initializers=[tensor_proto("W", W),
                                tensor_proto("R", R),
                                tensor_proto("B", B)])
        out = build_fn(parse_model(model(g)))({"x": x})
        with torch.no_grad():
            ref_y, ref_h = m(torch.from_numpy(x))
        got_y = np.asarray(out["Y"])           # (seq,dirs,batch,H)
        ref_y = ref_y.numpy().reshape(seq, batch, dirs, H) \
            .transpose(0, 2, 1, 3)
        np.testing.assert_allclose(got_y, ref_y, atol=2e-5)
        np.testing.assert_allclose(np.asarray(out["Yh"]),
                                   ref_h.numpy(), atol=2e-5)


def test_onnx_lstm_vs_torch():
    import torch

    from cyberether_tpu.ops.onnx_jax import build_fn, parse_model

    torch.manual_seed(9)
    seq, batch, I, H = 5, 2, 3, 4

    def reorder(w):
        i, f, g_, o = torch.split(w, H, dim=0)
        return torch.cat([i, o, f, g_], dim=0)   # ONNX iofc

    for bidi in (False, True):
        m = torch.nn.LSTM(I, H, bidirectional=bidi)
        Ws, Rs, Bs = [], [], []
        for sfx in ([""] if not bidi else ["", "_reverse"]):
            Ws.append(reorder(getattr(m, f"weight_ih_l0{sfx}")))
            Rs.append(reorder(getattr(m, f"weight_hh_l0{sfx}")))
            Bs.append(torch.cat([
                reorder(getattr(m, f"bias_ih_l0{sfx}")),
                reorder(getattr(m, f"bias_hh_l0{sfx}"))]))
        W = torch.stack(Ws).detach().numpy()
        R = torch.stack(Rs).detach().numpy()
        B = torch.stack(Bs).detach().numpy()
        dirs = 2 if bidi else 1
        x = np.random.default_rng(7).standard_normal(
            (seq, batch, I)).astype(np.float32)
        attrs = {"hidden_size": H}
        if bidi:
            attrs["direction"] = "bidirectional"
        g = graph([node("LSTM", ["x", "W", "R", "B"],
                        ["Y", "Yh", "Yc"], attrs)],
                  "lstm",
                  inputs=[value_info("x", 1, [seq, batch, I])],
                  outputs=[value_info("Y", 1, [seq, dirs, batch, H]),
                           value_info("Yh", 1, [dirs, batch, H]),
                           value_info("Yc", 1, [dirs, batch, H])],
                  initializers=[tensor_proto("W", W),
                                tensor_proto("R", R),
                                tensor_proto("B", B)])
        out = build_fn(parse_model(model(g)))({"x": x})
        with torch.no_grad():
            ref_y, (ref_h, ref_c) = m(torch.from_numpy(x))
        ref_y = ref_y.numpy().reshape(seq, batch, dirs, H) \
            .transpose(0, 2, 1, 3)
        np.testing.assert_allclose(np.asarray(out["Y"]), ref_y,
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(out["Yh"]),
                                   ref_h.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(out["Yc"]),
                                   ref_c.numpy(), atol=2e-5)


def test_onnx_census_tool():
    from cyberether_tpu.ops.onnx_jax import load_model, op_census

    census = op_census(load_model(str(FIXTURES / "mlp.onnx")))
    assert census["runnable"] is True
    assert census["ops"]["Conv"] == 1 and census["node_count"] == 6
    assert census["opset"] == 13

    g = graph([node("STFT", ["x"], ["out"])], "bad",
              inputs=[value_info("x", 1, [4])],
              outputs=[value_info("out", 1, [4])])
    from cyberether_tpu.ops.onnx_jax import parse_model
    census = op_census(parse_model(model(g)))
    assert census["runnable"] is False
    assert census["unsupported"] == {"STFT": 1}


def test_squeezenet_fixture_runs_and_matches_torch():
    """A real published CNN architecture (SqueezeNet 1.1, Iandola et
    al. 2016) as a committed .onnx fixture: reproducible bytes, full
    census coverage, and exact execution parity against the torch
    forward pass (VERDICT r4 item 4)."""
    from squeezenet import (build_squeezenet_fixture, make_weights,
                            torch_model)

    from cyberether_tpu.ops.onnx_jax import (build_fn, op_census,
                                             parse_model)

    data = (FIXTURES / "squeezenet11.onnx").read_bytes()
    assert data == build_squeezenet_fixture()   # reproducible

    g = parse_model(data)
    census = op_census(g)
    assert census["runnable"] and census["node_count"] == 65
    assert census["ops"]["Conv"] == 26

    import torch
    x = np.random.default_rng(0).standard_normal(
        (1, 3, 111, 111)).astype(np.float32)
    got = np.asarray(build_fn(g)({"input": x})["output"])
    with torch.no_grad():
        ref = torch_model(make_weights())(torch.from_numpy(x)).numpy()
    assert got.shape == (1, 1000)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_squeezenet_through_module():
    """The same fixture through the onnx_inference module path."""
    x = np.random.default_rng(1).standard_normal(
        (1, 3, 111, 111)).astype(np.float32)
    ctx = TestContext("onnx_inference",
                      {"modelPath": str(FIXTURES / "squeezenet11.onnx")})
    ctx.set_input("input", x)
    ctx.run()
    out = np.asarray(ctx.output("output"))
    assert out.shape == (1, 1000) and np.isfinite(out).all()


def test_onnx_gru_accepts_default_activation_attr():
    """Exporters often write the spec-default activations explicitly;
    that must not be rejected — only genuinely custom sets are."""
    import pytest

    from cyberether_tpu.ops.onnx_jax import (UnsupportedOnnxOp,
                                             build_fn, parse_model)

    rng = np.random.default_rng(2)
    H, I, seq, batch = 3, 2, 4, 1
    W = rng.standard_normal((1, 3 * H, I)).astype(np.float32)
    R = rng.standard_normal((1, 3 * H, H)).astype(np.float32)

    def make(acts):
        g = graph([node("GRU", ["x", "W", "R"], ["Y", "Yh"],
                        {"hidden_size": H, "activations": acts})],
                  "g", inputs=[value_info("x", 1, [seq, batch, I])],
                  outputs=[value_info("Y", 1, [seq, 1, batch, H]),
                           value_info("Yh", 1, [1, batch, H])],
                  initializers=[tensor_proto("W", W),
                                tensor_proto("R", R)])
        return parse_model(model(g))

    x = rng.standard_normal((seq, batch, I)).astype(np.float32)
    out = build_fn(make(["Sigmoid", "Tanh"]))({"x": x})
    assert np.asarray(out["Y"]).shape == (seq, 1, batch, H)
    with pytest.raises(UnsupportedOnnxOp):
        build_fn(make(["Relu", "Tanh"]))({"x": x})


def test_onnx_mobile_ops_vs_torch():
    """Round-5 op widening (HardSwish/HardSigmoid/Elu/PRelu/Softplus/
    GlobalMaxPool/ConvTranspose) against torch goldens."""
    import torch
    import torch.nn.functional as F

    from cyberether_tpu.ops.onnx_jax import build_fn, parse_model

    rng = np.random.default_rng(21)
    x = rng.standard_normal((2, 3, 6, 5)).astype(np.float32)

    def run1(op, attrs=None, extra_inits=(), inputs=("x",)):
        g = graph([node(op, list(inputs), ["out"], attrs or {})],
                  "t", inputs=[value_info("x", 1, list(x.shape))],
                  outputs=[value_info("out", 1, [1])],
                  initializers=list(extra_inits))
        return np.asarray(
            build_fn(parse_model(model(g)))({"x": x})["out"])

    tx = torch.from_numpy(x)
    np.testing.assert_allclose(run1("HardSwish"),
                               F.hardswish(tx).numpy(), atol=1e-6)
    np.testing.assert_allclose(
        run1("HardSigmoid", {"alpha": 1 / 6, "beta": 0.5}),
        F.hardsigmoid(tx).numpy(), atol=1e-6)
    np.testing.assert_allclose(run1("Elu", {"alpha": 1.0}),
                               F.elu(tx).numpy(), atol=1e-6)
    np.testing.assert_allclose(run1("Softplus"),
                               F.softplus(tx).numpy(), atol=1e-5)
    slope = rng.standard_normal(3).astype(np.float32)
    got = run1("PRelu", inputs=("x", "s"),
               extra_inits=[tensor_proto("s", slope)])
    ref = F.prelu(tx, torch.from_numpy(slope)).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-6)
    np.testing.assert_allclose(
        run1("GlobalMaxPool"),
        F.adaptive_max_pool2d(tx, 1).numpy(), atol=1e-6)

    # ConvTranspose: strided, padded, grouped, with output_padding
    for (g_, stride, padv, opad) in ((1, 2, 1, 1), (3, 2, 0, 0),
                                     (1, 1, 1, 0)):
        m = torch.nn.ConvTranspose2d(3, 6, 3, stride=stride,
                                     padding=padv,
                                     output_padding=opad, groups=g_)
        W = m.weight.detach().numpy()      # (Cin, Cout/g, kH, kW)
        B = m.bias.detach().numpy()
        gph = graph(
            [node("ConvTranspose", ["x", "W", "B"], ["out"],
                  {"strides": [stride, stride],
                   "pads": [padv, padv, padv, padv],
                   "output_padding": [opad, opad],
                   "group": g_, "kernel_shape": [3, 3]})],
            "ct", inputs=[value_info("x", 1, list(x.shape))],
            outputs=[value_info("out", 1, [1])],
            initializers=[tensor_proto("W", W),
                          tensor_proto("B", B)])
        got = np.asarray(build_fn(parse_model(model(gph)))
                         ({"x": x})["out"])
        with torch.no_grad():
            ref = m(tx).numpy()
        assert got.shape == ref.shape, (got.shape, ref.shape)
        np.testing.assert_allclose(got, ref, atol=1e-4)


def test_mobilenetv3_small_matches_torch():
    """Second real published architecture: MobileNetV3-Small (Howard
    et al. 2019) — inverted residuals, depthwise convs, squeeze-
    excite, HardSwish/HardSigmoid, BatchNorm — built from the same
    seeded weights as a torch model and an ONNX proto, executed
    exactly by the pure-JAX route."""
    import torch

    from mobilenetv3 import build_onnx, make_weights, torch_model

    from cyberether_tpu.ops.onnx_jax import (build_fn, op_census,
                                             parse_model)

    w = make_weights()
    data = build_onnx(w, size=96)
    g = parse_model(data)
    census = op_census(g)
    assert census["runnable"], census["unsupported"]
    assert census["ops"]["HardSwish"] >= 9
    assert census["ops"]["HardSigmoid"] == 9   # SE blocks

    x = np.random.default_rng(3).standard_normal(
        (1, 3, 96, 96)).astype(np.float32)
    got = np.asarray(build_fn(g)({"input": x})["output"])
    with torch.no_grad():
        ref = torch_model(w)(torch.from_numpy(x)).numpy()
    assert got.shape == (1, 1000)
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_onnx_dynamic_batch_via_retrace():
    """Dynamic shapes in the XLA world = one retrace per shape: the
    executor's fn is shape-generic python, so the SAME parsed model
    runs at different batch sizes (models without hard Reshapes)."""
    from cyberether_tpu.ops.onnx_jax import build_fn, parse_model

    from onnx_build import reference_mlp

    fn = build_fn(parse_model(
        (FIXTURES / "mlp.onnx").read_bytes()))
    rng = np.random.default_rng(9)
    for batch in (1, 3):
        x = rng.standard_normal((batch, 1, 8, 8)).astype(np.float32)
        got = np.asarray(fn({"input": x})["output"])
        assert got.shape == (batch, 10)
        for b in range(batch):     # golden is batch-1
            np.testing.assert_allclose(
                got[b:b + 1], reference_mlp(x[b:b + 1]), atol=1e-5)


def test_onnx_gru_lbr0_numpy_golden():
    """ONNX-default linear_before_reset=0 against an independent
    numpy implementation of the spec recurrence (torch only covers
    lbr=1)."""
    from cyberether_tpu.ops.onnx_jax import build_fn, parse_model

    rng = np.random.default_rng(13)
    seq, batch, I, H = 5, 2, 3, 4
    W = rng.standard_normal((1, 3 * H, I)).astype(np.float32)
    R = rng.standard_normal((1, 3 * H, H)).astype(np.float32)
    B = rng.standard_normal((1, 6 * H)).astype(np.float32)
    x = rng.standard_normal((seq, batch, I)).astype(np.float32)

    g = graph([node("GRU", ["x", "W", "R", "B"], ["Y", "Yh"],
                    {"hidden_size": H, "linear_before_reset": 0})],
              "g", inputs=[value_info("x", 1, [seq, batch, I])],
              outputs=[value_info("Y", 1, [seq, 1, batch, H]),
                       value_info("Yh", 1, [1, batch, H])])
    gr = parse_model(model(g))
    gr.initializers.update(
        {"W": W, "R": R, "B": B})
    out = build_fn(gr)({"x": x})

    def sig(v):
        return 1.0 / (1.0 + np.exp(-v))

    Wd, Rd = W[0].astype(np.float64), R[0].astype(np.float64)
    wb, rb = B[0, :3 * H].astype(np.float64), \
        B[0, 3 * H:].astype(np.float64)
    h = np.zeros((batch, H))
    ys = []
    for t in range(seq):
        xt = x[t].astype(np.float64)
        xz = xt @ Wd[:H].T + wb[:H]
        xr = xt @ Wd[H:2 * H].T + wb[H:2 * H]
        xh = xt @ Wd[2 * H:].T + wb[2 * H:]
        z = sig(xz + h @ Rd[:H].T + rb[:H])
        r = sig(xr + h @ Rd[H:2 * H].T + rb[H:2 * H])
        # lbr=0: reset applies to the STATE before the R matmul
        hh = np.tanh(xh + (r * h) @ Rd[2 * H:].T + rb[2 * H:])
        h = (1 - z) * hh + z * h
        ys.append(h.copy())
    ref = np.stack(ys)[:, None, :, :]
    np.testing.assert_allclose(np.asarray(out["Y"]), ref, atol=2e-5)
