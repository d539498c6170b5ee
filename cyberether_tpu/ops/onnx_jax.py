"""Pure-JAX ONNX model executor.

The reference wraps an ONNX Runtime session
(/root/reference/src/domains/ml/onnx_inference/module_impl.cc,
include/jetstream/domains/ml/onnx_inference/module.hh:9-17).  The
TPU-native route needs no ORT: an ``.onnx`` file is plain protobuf
wire format, hand-parsed here with a ~100-line varint reader, and the
graph's common op subset executes as jax.numpy / lax ops — which means
imported models run **on the TPU, inside jit, fusable with the rest of
the flowgraph segment**, instead of bouncing to a host-side C++
runtime like the reference does.

Two layers:

- :func:`parse_model` — ModelProto bytes -> :class:`OnnxGraph` (nodes,
  initializers, input/output names).  Tolerant: unknown fields are
  skipped per protobuf rules.
- :func:`build_fn` — OnnxGraph -> a pure ``fn(inputs: dict) -> dict``
  of jnp ops, jittable.  Unsupported ops raise
  :class:`UnsupportedOnnxOp` at build time (never mid-run).

Supported ops (static shapes, inference mode): Add Sub Mul Div Pow
Sqrt Exp Log Neg Abs Erf Sin Cos Relu LeakyRelu Gelu Sigmoid Tanh
Softmax Clip Min Max Equal Greater Less Where MatMul Gemm Conv
MaxPool AveragePool GlobalAveragePool BatchNormalization
LayerNormalization Reshape Transpose Flatten Squeeze Unsqueeze Expand
Split Pad Concat Slice Gather ReduceMean ReduceSum ReduceMax
ReduceMin
ArgMax Trilu Range ConstantOfShape Identity Constant Cast Shape
Dropout.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


class UnsupportedOnnxOp(Exception):
    """Raised at build time for ops outside the executor's subset."""


class OnnxParseError(Exception):
    pass


# ---------------------------------------------------------------------------
# protobuf wire-format reader (the subset ONNX uses)
# ---------------------------------------------------------------------------

def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise OnnxParseError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise OnnxParseError("varint too long")


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a message buffer.

    wire 0 -> int, wire 1 -> 8 raw bytes, wire 2 -> bytes,
    wire 5 -> 4 raw bytes.
    """
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        fnum, wire = key >> 3, key & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 1:
            val, pos = buf[pos:pos + 8], pos + 8
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            val, pos = buf[pos:pos + ln], pos + ln
            if len(val) != ln:
                raise OnnxParseError("truncated length-delimited field")
        elif wire == 5:
            val, pos = buf[pos:pos + 4], pos + 4
        else:
            raise OnnxParseError(f"unsupported wire type {wire}")
        yield fnum, wire, val


def _signed(v: int) -> int:
    """Interpret a varint as two's-complement int64."""
    return v - (1 << 64) if v >= (1 << 63) else v


def _packed_varints(buf: bytes) -> List[int]:
    out, pos = [], 0
    while pos < len(buf):
        v, pos = _read_varint(buf, pos)
        out.append(_signed(v))
    return out


# ---------------------------------------------------------------------------
# ONNX message shapes (field numbers from onnx/onnx.proto3)
# ---------------------------------------------------------------------------

_ONNX_DTYPES = {
    1: np.float32, 2: np.uint8, 3: np.int8, 4: np.uint16, 5: np.int16,
    6: np.int32, 7: np.int64, 9: np.bool_, 10: np.float16,
    11: np.float64, 12: np.uint32, 13: np.uint64,
}


def _parse_tensor(buf: bytes) -> Tuple[str, np.ndarray]:
    dims: List[int] = []
    data_type = 1
    raw = None
    float_data: List[float] = []
    int32_data: List[int] = []
    int64_data: List[int] = []
    double_data: List[float] = []
    name = ""
    for fnum, wire, val in _fields(buf):
        if fnum == 1:
            if wire == 0:
                dims.append(_signed(val))
            else:
                dims.extend(_packed_varints(val))
        elif fnum == 2 and wire == 0:
            data_type = val
        elif fnum == 4:
            if wire == 5:
                float_data.append(struct.unpack("<f", val)[0])
            else:
                float_data.extend(
                    np.frombuffer(val, "<f4").tolist())
        elif fnum == 5:
            if wire == 0:
                int32_data.append(_signed(val))
            else:
                int32_data.extend(_packed_varints(val))
        elif fnum == 7:
            if wire == 0:
                int64_data.append(_signed(val))
            else:
                int64_data.extend(_packed_varints(val))
        elif fnum == 8 and wire == 2:
            name = val.decode()
        elif fnum == 9 and wire == 2:
            raw = val
        elif fnum == 13:
            if wire == 1:
                double_data.append(struct.unpack("<d", val)[0])
            else:
                double_data.extend(np.frombuffer(val, "<f8").tolist())
    np_dtype = _ONNX_DTYPES.get(data_type)
    if np_dtype is None:
        raise OnnxParseError(f"tensor dtype {data_type} unsupported")
    shape = tuple(dims)
    if raw is not None:
        arr = np.frombuffer(raw, np_dtype).reshape(shape)
    elif float_data:
        arr = np.asarray(float_data, np_dtype).reshape(shape)
    elif int64_data:
        arr = np.asarray(int64_data, np.int64).astype(
            np_dtype).reshape(shape)
    elif int32_data:
        if data_type == 10:
            # float16 initializers ride int32_data as raw uint16 bit
            # patterns (ONNX TensorProto spec) — reinterpret, don't
            # numerically cast (ADVICE r4)
            arr = np.asarray(int32_data, np.uint16).view(
                np.float16).reshape(shape)
        else:
            arr = np.asarray(int32_data, np.int32).astype(
                np_dtype).reshape(shape)
    elif double_data:
        arr = np.asarray(double_data, np.float64).astype(
            np_dtype).reshape(shape)
    else:
        arr = np.zeros(shape, np_dtype)
    return name, arr


def _parse_attribute(buf: bytes) -> Tuple[str, Any]:
    name = ""
    atype = 0
    f_val = None
    i_val = None
    s_val = None
    t_val = None
    floats: List[float] = []
    ints: List[int] = []
    strings: List[bytes] = []
    for fnum, wire, val in _fields(buf):
        if fnum == 1 and wire == 2:
            name = val.decode()
        elif fnum == 2 and wire == 5:
            f_val = struct.unpack("<f", val)[0]
        elif fnum == 3 and wire == 0:
            i_val = _signed(val)
        elif fnum == 4 and wire == 2:
            s_val = val
        elif fnum == 5 and wire == 2:
            t_val = _parse_tensor(val)[1]
        elif fnum == 7:
            if wire == 5:
                floats.append(struct.unpack("<f", val)[0])
            else:
                floats.extend(np.frombuffer(val, "<f4").tolist())
        elif fnum == 8:
            if wire == 0:
                ints.append(_signed(val))
            else:
                ints.extend(_packed_varints(val))
        elif fnum == 9 and wire == 2:
            strings.append(val)
        elif fnum == 20 and wire == 0:
            atype = val
    if atype == 1:
        return name, f_val
    if atype == 2:
        return name, i_val
    if atype == 3:
        return name, s_val.decode() if s_val is not None else ""
    if atype == 4:
        return name, t_val
    if atype == 6:
        return name, list(floats)
    if atype == 7:
        return name, list(ints)
    if atype == 8:
        return name, [s.decode() for s in strings]
    # type field absent (some writers omit it): pick whichever is set
    for v in (f_val, i_val, t_val):
        if v is not None:
            return name, v
    if ints:
        return name, list(ints)
    if floats:
        return name, list(floats)
    if s_val is not None:
        return name, s_val.decode()
    return name, None


@dataclass
class OnnxNode:
    op_type: str
    inputs: Tuple[str, ...]
    outputs: Tuple[str, ...]
    attrs: Dict[str, Any] = field(default_factory=dict)
    name: str = ""


def _parse_node(buf: bytes) -> OnnxNode:
    inputs: List[str] = []
    outputs: List[str] = []
    op_type = ""
    name = ""
    attrs: Dict[str, Any] = {}
    for fnum, wire, val in _fields(buf):
        if fnum == 1 and wire == 2:
            inputs.append(val.decode())
        elif fnum == 2 and wire == 2:
            outputs.append(val.decode())
        elif fnum == 3 and wire == 2:
            name = val.decode()
        elif fnum == 4 and wire == 2:
            op_type = val.decode()
        elif fnum == 5 and wire == 2:
            k, v = _parse_attribute(val)
            attrs[k] = v
    return OnnxNode(op_type, tuple(inputs), tuple(outputs), attrs,
                    name)


def _parse_value_info(buf: bytes
                      ) -> Tuple[str, Optional[int], Tuple]:
    """-> (name, elem_type, dims); symbolic dims come back as -1."""
    name = ""
    elem = None
    dims: Tuple = ()
    for fnum, wire, val in _fields(buf):
        if fnum == 1 and wire == 2:
            name = val.decode()
        elif fnum == 2 and wire == 2:          # TypeProto
            for f2, w2, v2 in _fields(val):
                if f2 == 1 and w2 == 2:        # tensor_type
                    for f3, w3, v3 in _fields(v2):
                        if f3 == 1 and w3 == 0:
                            elem = v3
                        elif f3 == 2 and w3 == 2:   # shape
                            ds = []
                            for f4, w4, v4 in _fields(v3):
                                if f4 == 1 and w4 == 2:  # dim
                                    dv = -1
                                    for f5, w5, v5 in _fields(v4):
                                        if f5 == 1 and w5 == 0:
                                            dv = _signed(v5)
                                    ds.append(dv)
                            dims = tuple(ds)
    return name, elem, dims


@dataclass
class OnnxGraph:
    nodes: List[OnnxNode]
    initializers: Dict[str, np.ndarray]
    inputs: List[Tuple[str, Optional[int], Tuple]]
    outputs: List[Tuple[str, Optional[int], Tuple]]
    name: str = ""
    opset: int = 13     # default-domain ai.onnx opset version

    @property
    def input_names(self) -> List[str]:
        init = self.initializers
        return [n for n, _, _ in self.inputs if n not in init]

    @property
    def output_names(self) -> List[str]:
        return [n for n, _, _ in self.outputs]


def _parse_graph(buf: bytes) -> OnnxGraph:
    nodes: List[OnnxNode] = []
    inits: Dict[str, np.ndarray] = {}
    inputs: List[Tuple[str, Optional[int], Tuple]] = []
    outputs: List[Tuple[str, Optional[int], Tuple]] = []
    name = ""
    for fnum, wire, val in _fields(buf):
        if fnum == 1 and wire == 2:
            nodes.append(_parse_node(val))
        elif fnum == 2 and wire == 2:
            name = val.decode()
        elif fnum == 5 and wire == 2:
            k, arr = _parse_tensor(val)
            inits[k] = arr
        elif fnum == 11 and wire == 2:
            inputs.append(_parse_value_info(val))
        elif fnum == 12 and wire == 2:
            outputs.append(_parse_value_info(val))
    return OnnxGraph(nodes, inits, inputs, outputs, name)


def parse_model(data: bytes) -> OnnxGraph:
    """ModelProto bytes -> OnnxGraph (field 7 = graph; field 8 =
    opset_import, whose default-domain version changes op semantics —
    e.g. Softmax is coalesced-2D before opset 13)."""
    graph = None
    opset = None
    for fnum, wire, val in _fields(data):
        if fnum == 7 and wire == 2:
            graph = _parse_graph(val)
        elif fnum == 8 and wire == 2:        # OperatorSetIdProto
            domain, version = "", None
            for f2, w2, v2 in _fields(val):
                if f2 == 1 and w2 == 2:
                    domain = v2.decode()
                elif f2 == 2 and w2 == 0:
                    version = _signed(v2)
            if domain in ("", "ai.onnx") and version is not None:
                opset = version
    if graph is None:
        raise OnnxParseError("no graph in model")
    if opset is not None:
        graph.opset = opset
    return graph


def load_model(path: str) -> OnnxGraph:
    with open(path, "rb") as f:
        return parse_model(f.read())


# ---------------------------------------------------------------------------
# executor: OnnxGraph -> jittable fn
# ---------------------------------------------------------------------------

def _auto_pad(attrs: Dict[str, Any], spatial: int,
              kshape: Tuple[int, ...],
              in_shape: Tuple[int, ...],
              strides, dilations=None) -> List[Tuple[int, int]]:
    """Resolve explicit/auto padding.  ``strides``/``dilations`` are
    the values the OP actually applies (callers resolve their own
    defaults — pooling defaults differ from conv).  SAME padding
    depends on the input size and the EFFECTIVE kernel
    (k-1)*dilation + 1: total = max((ceil(in/s)-1)*s + keff - in, 0)
    per the onnx spec."""
    pads = attrs.get("pads")
    auto = attrs.get("auto_pad", "NOTSET") or "NOTSET"
    if isinstance(auto, bytes):
        auto = auto.decode()
    if auto in ("SAME_UPPER", "SAME_LOWER"):
        out = []
        dil = dilations or [1] * spatial
        for i in range(spatial):
            s = int(strides[i])
            n = int(in_shape[i])
            keff = (int(kshape[i]) - 1) * int(dil[i]) + 1
            total = max((-(-n // s) - 1) * s + keff - n, 0)
            lo = total // 2
            hi = total - lo
            out.append((lo, hi) if auto == "SAME_UPPER" else (hi, lo))
        return out
    if pads is None:
        return [(0, 0)] * spatial
    return [(int(pads[i]), int(pads[i + spatial]))
            for i in range(spatial)]


def _conv_dims(spatial: int):
    dims = ("NCHW"[:2 + spatial] if spatial <= 2
            else "NCDHW"[:2 + spatial])
    return (dims, dims.replace("N", "O").replace("C", "I", 1), dims)


def _const_of(env: Dict[str, Any], name: str, what: str) -> np.ndarray:
    """Shape-ish operands (Reshape target, Slice starts, ...) must be
    compile-time constants for XLA static shapes."""
    v = env.get(name)
    if isinstance(v, np.ndarray):
        return v
    if isinstance(v, jnp.ndarray) and not isinstance(
            v, jax.core.Tracer):
        return np.asarray(v)
    raise UnsupportedOnnxOp(
        f"{what} requires a constant '{name}' (data-dependent shapes "
        f"do not map to XLA static shapes)")


def _resize(node: OnnxNode, env: Dict[str, Any],
            a: Dict[str, Any]) -> jnp.ndarray:
    """ONNX Resize (opset 11+): nearest / linear over any axes whose
    scale != 1, with the coordinate_transformation_modes real exports
    use (half_pixel / pytorch_half_pixel / asymmetric / align_corners).
    scales/sizes must be constants (XLA static shapes); the per-axis
    source coordinates are precomputed as numpy index/weight tables,
    so the lowering is static takes — no dynamic gather.

    Reference op surface:
    /root/reference/include/jetstream/domains/ml/onnx_inference/module.hh:9-17
    (ORT executes the full opset; this covers the export-common
    subset)."""
    x = env[node.inputs[0]]
    mode = a.get("mode", b"nearest")
    mode = mode.decode() if isinstance(mode, bytes) else mode
    ct = a.get("coordinate_transformation_mode", b"half_pixel")
    ct = ct.decode() if isinstance(ct, bytes) else ct
    nearest_mode = a.get("nearest_mode", b"round_prefer_floor")
    nearest_mode = (nearest_mode.decode()
                    if isinstance(nearest_mode, bytes)
                    else nearest_mode)
    if mode not in ("nearest", "linear"):
        raise UnsupportedOnnxOp(f"Resize mode {mode!r}")
    if a.get("axes"):
        # opset-18 per-axis form changes how scales/sizes are indexed
        raise UnsupportedOnnxOp("Resize with 'axes' attribute")
    if a.get("antialias"):
        # silently running plain separable resampling would return
        # wrong values for antialiased downscales
        raise UnsupportedOnnxOp("Resize antialias=1")
    if a.get("exclude_outside"):
        raise UnsupportedOnnxOp("Resize exclude_outside=1")
    if ct not in ("half_pixel", "pytorch_half_pixel", "asymmetric",
                  "align_corners"):
        raise UnsupportedOnnxOp(
            f"Resize coordinate_transformation_mode {ct!r}")
    # output extents from sizes (input 3) or scales (input 2)
    out_shape = None
    if len(node.inputs) > 3 and node.inputs[3]:
        out_shape = [int(d) for d in
                     _const_of(env, node.inputs[3], "Resize sizes")]
    else:
        scales = np.asarray(
            _const_of(env, node.inputs[2], "Resize scales"),
            np.float64).reshape(-1)
        if scales.size != x.ndim:
            raise UnsupportedOnnxOp(
                f"Resize: {scales.size} scales for rank {x.ndim}")
        out_shape = [int(np.floor(s * d))
                     for s, d in zip(scales, x.shape)]

    def src_coord(out_i: np.ndarray, n_out: int, n_in: int
                  ) -> np.ndarray:
        sc = n_out / n_in
        if ct == "asymmetric":
            return out_i / sc
        if ct == "align_corners":
            if n_out == 1:
                return np.zeros_like(out_i, np.float64)
            return out_i * (n_in - 1) / (n_out - 1)
        c = (out_i + 0.5) / sc - 0.5
        if ct == "pytorch_half_pixel" and n_out <= 1:
            return np.zeros_like(out_i, np.float64)
        return c

    y = x
    for ax in range(x.ndim):
        n_in, n_out = x.shape[ax], out_shape[ax]
        if n_in == n_out:
            continue
        oi = np.arange(n_out, dtype=np.float64)
        c = src_coord(oi, n_out, n_in)
        if mode == "nearest":
            if nearest_mode == "floor":
                idx = np.floor(c)
            elif nearest_mode == "ceil":
                idx = np.ceil(c)
            elif nearest_mode == "round_prefer_ceil":
                idx = np.floor(c + 0.5)
            else:                      # round_prefer_floor
                idx = np.ceil(c - 0.5)
            idx = np.clip(idx, 0, n_in - 1).astype(np.int32)
            y = jnp.take(y, jnp.asarray(idx), axis=ax)
        else:                          # linear
            lo = np.clip(np.floor(c), 0, n_in - 1).astype(np.int32)
            hi = np.clip(lo + 1, 0, n_in - 1)
            w = np.clip(c - lo, 0.0, 1.0).astype(np.float32)
            wshape = [1] * y.ndim
            wshape[ax] = n_out
            wj = jnp.asarray(w).reshape(wshape)
            y = (jnp.take(y, jnp.asarray(lo), axis=ax) * (1 - wj)
                 + jnp.take(y, jnp.asarray(hi), axis=ax) * wj)
    return y


def _recurrent(op: str, node: OnnxNode, env: Dict[str, Any],
               a: Dict[str, Any], inp, set_out) -> None:
    """ONNX GRU / LSTM (default activations, layout=0) via lax.scan.

    Gate order per spec: GRU = z r h, LSTM = i o f c.  Supports
    forward / reverse / bidirectional, optional bias and initial
    states; sequence_lens, peepholes, clip and custom activations
    raise UnsupportedOnnxOp."""
    if a.get("layout", 0):
        raise UnsupportedOnnxOp(f"{op} layout=1")
    if a.get("clip"):
        raise UnsupportedOnnxOp(f"{op} clip")
    acts = a.get("activations")
    if acts:
        # exporters often write the spec defaults explicitly; only a
        # genuinely custom set is unsupported
        names = [x.decode().lower() if isinstance(x, bytes)
                 else str(x).lower() for x in acts]
        per_dir = (["sigmoid", "tanh"] if op == "GRU"
                   else ["sigmoid", "tanh", "tanh"])
        dirs_attr = 2 if a.get("direction") in (
            b"bidirectional", "bidirectional") else 1
        if names not in (per_dir, per_dir * dirs_attr):
            raise UnsupportedOnnxOp(
                f"{op} custom activations {names}")
    ngates = 3 if op == "GRU" else 4
    X = env[node.inputs[0]]            # (seq, batch, input)
    W = jnp.asarray(env[node.inputs[1]])   # (dirs, G*H, input)
    R = jnp.asarray(env[node.inputs[2]])   # (dirs, G*H, H)
    dirs = W.shape[0]
    H = W.shape[1] // ngates
    seq, batch = X.shape[0], X.shape[1]
    Bb = inp(3)
    if len(node.inputs) > 4 and node.inputs[4]:
        raise UnsupportedOnnxOp(f"{op} sequence_lens")
    if op == "LSTM" and len(node.inputs) > 7 and node.inputs[7]:
        raise UnsupportedOnnxOp("LSTM peepholes")
    h0 = inp(5)
    if h0 is None:
        h0 = jnp.zeros((dirs, batch, H), X.dtype)
    c0 = inp(6) if op == "LSTM" else None
    if op == "LSTM" and c0 is None:
        c0 = jnp.zeros((dirs, batch, H), X.dtype)
    lbr = int(a.get("linear_before_reset", 0))
    direction = a.get("direction", b"forward")
    direction = (direction.decode()
                 if isinstance(direction, bytes) else direction)
    exp_dirs = 2 if direction == "bidirectional" else 1
    if dirs != exp_dirs:
        raise UnsupportedOnnxOp(
            f"{op}: W has {dirs} directions for {direction}")

    def run_dir(d: int, reverse: bool):
        Wd, Rd = W[d].T, R[d].T        # (input, G*H), (H, G*H)
        if Bb is not None:
            wb = jnp.asarray(Bb)[d, :ngates * H]
            rb = jnp.asarray(Bb)[d, ngates * H:]
        else:
            wb = rb = jnp.zeros((ngates * H,), X.dtype)
        xs = jnp.flip(X, 0) if reverse else X
        xg = jnp.dot(xs, Wd) + wb      # (seq, batch, G*H)

        if op == "GRU":
            def step(h, xt):
                hg = jnp.dot(h, Rd)
                z = jax.nn.sigmoid(xt[..., :H] + hg[..., :H]
                                   + rb[:H])
                r = jax.nn.sigmoid(xt[..., H:2 * H]
                                   + hg[..., H:2 * H] + rb[H:2 * H])
                if lbr:
                    hh = jnp.tanh(xt[..., 2 * H:]
                                  + r * (hg[..., 2 * H:]
                                         + rb[2 * H:]))
                else:
                    hh = jnp.tanh(xt[..., 2 * H:]
                                  + jnp.dot(r * h, Rd[:, 2 * H:])
                                  + rb[2 * H:])
                hn = (1 - z) * hh + z * h
                return hn, hn

            hT, ys = jax.lax.scan(step, h0[d], xg)
            cT = None
        else:
            def step(carry, xt):
                h, c = carry
                g = xt + jnp.dot(h, Rd) + rb
                i = jax.nn.sigmoid(g[..., :H])
                o = jax.nn.sigmoid(g[..., H:2 * H])
                f = jax.nn.sigmoid(g[..., 2 * H:3 * H])
                cc = jnp.tanh(g[..., 3 * H:])
                cn = f * c + i * cc
                hn = o * jnp.tanh(cn)
                return (hn, cn), hn

            (hT, cT), ys = jax.lax.scan(step, (h0[d], c0[d]), xg)
        if reverse:
            ys = jnp.flip(ys, 0)
        return ys, hT, cT

    outs = [run_dir(0, direction == "reverse")]
    if direction == "bidirectional":
        outs.append(run_dir(1, True))
    Y = jnp.stack([o[0] for o in outs], axis=1)  # (seq,dirs,batch,H)
    set_out(0, Y)
    set_out(1, jnp.stack([o[1] for o in outs], axis=0))
    if op == "LSTM":
        set_out(2, jnp.stack([o[2] for o in outs], axis=0))


def _apply_node(node: OnnxNode, env: Dict[str, Any],
                precision=None, opset: int = 13) -> None:
    op = node.op_type
    a = node.attrs

    def inp(i, default=None):
        if i >= len(node.inputs) or not node.inputs[i]:
            return default
        return env[node.inputs[i]]

    def set_out(i, v):
        if i < len(node.outputs) and node.outputs[i]:
            env[node.outputs[i]] = v

    binops = {"Add": jnp.add, "Sub": jnp.subtract,
              "Mul": jnp.multiply, "Div": jnp.divide,
              "Pow": jnp.power}
    unops = {"Sqrt": jnp.sqrt, "Exp": jnp.exp, "Log": jnp.log,
             "Neg": jnp.negative, "Abs": jnp.abs,
             "Erf": jax.scipy.special.erf,
             "Sin": jnp.sin, "Cos": jnp.cos,
             "Relu": lambda x: jnp.maximum(x, 0),
             "Sigmoid": jax.nn.sigmoid, "Tanh": jnp.tanh,
             "Identity": lambda x: x,
             "Floor": jnp.floor, "Ceil": jnp.ceil,
             "Round": jnp.round, "Reciprocal": lambda x: 1.0 / x,
             "Softplus": jax.nn.softplus,
             "HardSwish": lambda x: x * jnp.clip(
                 x / 6.0 + 0.5, 0.0, 1.0)}
    cmpops = {"Equal": jnp.equal, "Greater": jnp.greater,
              "Less": jnp.less}

    if op in binops:
        set_out(0, binops[op](inp(0), inp(1)))
    elif op in unops:
        set_out(0, unops[op](inp(0)))
    elif op in cmpops:
        set_out(0, cmpops[op](inp(0), inp(1)))
    elif op in ("Min", "Max"):          # variadic in ONNX
        red = jnp.minimum if op == "Min" else jnp.maximum
        out = env[node.inputs[0]]
        for nm in node.inputs[1:]:
            out = red(out, env[nm])
        set_out(0, out)
    elif op in ("Sum", "Mean"):         # variadic in ONNX
        out = env[node.inputs[0]]
        for nm in node.inputs[1:]:
            out = out + env[nm]
        if op == "Mean":
            out = out / float(len(node.inputs))
        set_out(0, out)
    elif op in ("And", "Or", "Xor"):
        lg = {"And": jnp.logical_and, "Or": jnp.logical_or,
              "Xor": jnp.logical_xor}[op]
        set_out(0, lg(inp(0), inp(1)))
    elif op == "Not":
        set_out(0, jnp.logical_not(inp(0)))
    elif op == "Sign":
        set_out(0, jnp.sign(inp(0)))
    elif op == "Tile":
        reps = [int(r) for r in _const_of(env, node.inputs[1],
                                          "Tile")]
        set_out(0, jnp.tile(inp(0), reps))
    elif op == "GatherElements":
        axis = int(a.get("axis", 0))
        set_out(0, jnp.take_along_axis(inp(0), inp(1), axis=axis))
    elif op in ("DepthToSpace", "SpaceToDepth"):
        x = inp(0)
        bs = int(a["blocksize"])
        n, c, h, w = x.shape
        if op == "SpaceToDepth":
            y = x.reshape(n, c, h // bs, bs, w // bs, bs) \
                 .transpose(0, 3, 5, 1, 2, 4) \
                 .reshape(n, c * bs * bs, h // bs, w // bs)
        else:
            mode = a.get("mode", "DCR")
            mode = mode.decode() if isinstance(mode, bytes) else mode
            if mode == "DCR":
                y = x.reshape(n, bs, bs, c // (bs * bs), h, w) \
                     .transpose(0, 3, 4, 1, 5, 2)
            else:                       # CRD
                y = x.reshape(n, c // (bs * bs), bs, bs, h, w) \
                     .transpose(0, 1, 4, 2, 5, 3)
            y = y.reshape(n, c // (bs * bs), h * bs, w * bs)
        set_out(0, y)
    elif op == "TopK":
        k = int(_const_of(env, node.inputs[1], "TopK")[0])
        axis = int(a.get("axis", -1))
        x = inp(0)
        if a.get("largest", 1) == 0:
            vals, idx = jax.lax.top_k(-jnp.moveaxis(x, axis, -1), k)
            vals = -vals
        else:
            vals, idx = jax.lax.top_k(jnp.moveaxis(x, axis, -1), k)
        set_out(0, jnp.moveaxis(vals, -1, axis))
        if len(node.outputs) > 1:
            # int32 indices: jax defaults to 32-bit ints (x64 off);
            # downstream Gather/compare consumers are dtype-agnostic
            set_out(1, jnp.moveaxis(idx.astype(jnp.int32), -1, axis))
    elif op == "Where":
        set_out(0, jnp.where(inp(0), inp(1), inp(2)))
    elif op == "Gelu":
        x = inp(0)
        approx = a.get("approximate", "none")
        ap = approx.decode() if isinstance(approx, bytes) else approx
        set_out(0, jax.nn.gelu(x, approximate=(ap == "tanh")))
    elif op == "LeakyRelu":
        alpha = a.get("alpha", 0.01)
        x = inp(0)
        set_out(0, jnp.where(x >= 0, x, alpha * x))
    elif op == "Clip":
        x = inp(0)
        lo = inp(1, a.get("min"))
        hi = inp(2, a.get("max"))
        if lo is not None:
            x = jnp.maximum(x, lo)
        if hi is not None:
            x = jnp.minimum(x, hi)
        set_out(0, x)
    elif op == "Softmax":
        x = inp(0)
        if opset >= 13:
            set_out(0, jax.nn.softmax(x, axis=a.get("axis", -1)))
        else:
            # opset < 13: coalesced semantics — flatten to 2D from
            # `axis` (default 1), softmax the trailing flat dim
            axis = a.get("axis", 1) % max(x.ndim, 1)
            flat = x.reshape(
                int(np.prod(x.shape[:axis], dtype=np.int64)), -1)
            set_out(0, jax.nn.softmax(flat, axis=-1).reshape(x.shape))
    elif op == "MatMul":
        set_out(0, jnp.matmul(inp(0), inp(1),
                              preferred_element_type=jnp.float32,
                              precision=precision))
    elif op == "Gemm":
        x, w = inp(0), inp(1)
        if a.get("transA", 0):
            x = x.T
        if a.get("transB", 0):
            w = w.T
        y = a.get("alpha", 1.0) * jnp.matmul(
            x, w, preferred_element_type=jnp.float32,
            precision=precision)
        c = inp(2)
        if c is not None:
            y = y + a.get("beta", 1.0) * c
        set_out(0, y)
    elif op == "Conv":
        x, w = inp(0), inp(1)
        spatial = x.ndim - 2
        kshape = w.shape[2:]
        strides = a.get("strides") or [1] * spatial
        dil = a.get("dilations") or [1] * spatial
        groups = int(a.get("group", 1))
        pads = _auto_pad(a, spatial, kshape, x.shape[2:], strides,
                         dil)
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=[int(s) for s in strides],
            padding=pads, rhs_dilation=[int(d) for d in dil],
            dimension_numbers=_conv_dims(spatial),
            feature_group_count=groups,
            preferred_element_type=jnp.float32,
            precision=precision)
        b = inp(2)
        if b is not None:
            y = y + jnp.reshape(b, (1, -1) + (1,) * spatial)
        set_out(0, y)
    elif op in ("MaxPool", "AveragePool"):
        x = inp(0)
        spatial = x.ndim - 2
        kshape = tuple(a["kernel_shape"])
        # onnx pooling strides default to 1 (NOT the kernel shape)
        strides = a.get("strides") or [1] * spatial
        pads = _auto_pad(a, spatial, kshape, x.shape[2:], strides)
        if a.get("ceil_mode", 0):
            # ceil output extent: widen the end pad so the last
            # (partial) window is included
            pads = list(pads)
            for i in range(spatial):
                n = x.shape[2 + i] + pads[i][0] + pads[i][1]
                s, k = int(strides[i]), int(kshape[i])
                extra = (-((n - k) % -s)) % s
                if extra:
                    pads[i] = (pads[i][0], pads[i][1] + extra)
        window = (1, 1) + kshape
        wstr = (1, 1) + tuple(int(s) for s in strides)
        pad4 = [(0, 0), (0, 0)] + pads
        if op == "MaxPool":
            y = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, window, wstr, pad4)
        else:
            s = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, window, wstr, pad4)
            if a.get("count_include_pad", 0) or not any(
                    p != (0, 0) for p in pads):
                y = s / float(np.prod(kshape))
            else:
                ones = jnp.ones(x.shape, x.dtype)
                cnt = jax.lax.reduce_window(
                    ones, 0.0, jax.lax.add, window, wstr, pad4)
                y = s / cnt
        set_out(0, y)
    elif op == "GlobalAveragePool":
        x = inp(0)
        set_out(0, jnp.mean(x, axis=tuple(range(2, x.ndim)),
                            keepdims=True))
    elif op == "GlobalMaxPool":
        x = inp(0)
        set_out(0, jnp.max(x, axis=tuple(range(2, x.ndim)),
                           keepdims=True))
    elif op == "HardSigmoid":
        alpha = a.get("alpha", 0.2)
        beta = a.get("beta", 0.5)
        set_out(0, jnp.clip(alpha * inp(0) + beta, 0.0, 1.0))
    elif op == "Elu":
        alpha = a.get("alpha", 1.0)
        x = inp(0)
        set_out(0, jnp.where(x > 0, x, alpha * (jnp.exp(x) - 1.0)))
    elif op == "PRelu":
        x, slope = inp(0), inp(1)
        slope = jnp.asarray(slope)
        if slope.ndim == 1 and x.ndim > 2 \
                and slope.shape[0] == x.shape[1]:
            # unidirectional broadcast along the channel axis
            slope = slope.reshape((1, -1) + (1,) * (x.ndim - 2))
        set_out(0, jnp.where(x >= 0, x, slope * x))
    elif op == "ReduceProd":
        x = inp(0)
        axes = a.get("axes")
        if axes is None and len(node.inputs) > 1 and node.inputs[1]:
            axes = [int(d) for d in _const_of(env, node.inputs[1],
                                              op)]
        set_out(0, jnp.prod(
            x, axis=tuple(int(v) for v in axes) if axes else None,
            keepdims=bool(a.get("keepdims", 1))))
    elif op == "ConvTranspose":
        x, w = inp(0), inp(1)
        spatial = x.ndim - 2
        if a.get("auto_pad", b"NOTSET") not in (b"NOTSET", "NOTSET"):
            raise UnsupportedOnnxOp("ConvTranspose auto_pad")
        strides = [int(s) for s in (a.get("strides")
                                    or [1] * spatial)]
        dil = [int(d) for d in (a.get("dilations") or [1] * spatial)]
        groups = int(a.get("group", 1))
        kshape = w.shape[2:]
        pads = a.get("pads") or [0] * (2 * spatial)
        opad = [int(v) for v in (a.get("output_pads")
                                 or a.get("output_padding")
                                 or [0] * spatial)]
        if a.get("output_shape"):
            raise UnsupportedOnnxOp("ConvTranspose output_shape")
        # ONNX weight (Cin, Cout/g, k...) -> conv kernel
        # (Cout, Cin/g, k...), spatially flipped; the transpose conv
        # is a stride-1 conv over the lhs-dilated input
        cin = w.shape[0]
        coutg = w.shape[1]
        wk = jnp.reshape(w, (groups, cin // groups, coutg)
                         + tuple(kshape))
        wk = jnp.moveaxis(wk, 2, 1)            # (g, Cout/g, Cin/g, k)
        wk = jnp.reshape(wk, (groups * coutg, cin // groups)
                         + tuple(kshape))
        wk = jnp.flip(wk, axis=tuple(range(2, wk.ndim)))
        pad = []
        for i in range(spatial):
            keff = (int(kshape[i]) - 1) * dil[i] + 1
            pad.append((keff - 1 - int(pads[i]),
                        keff - 1 - int(pads[spatial + i]) + opad[i]))
        y = jax.lax.conv_general_dilated(
            x, wk, window_strides=[1] * spatial, padding=pad,
            lhs_dilation=strides, rhs_dilation=dil,
            dimension_numbers=_conv_dims(spatial),
            feature_group_count=groups,
            preferred_element_type=jnp.float32, precision=precision)
        b = inp(2)
        if b is not None:
            y = y + jnp.reshape(b, (1, -1) + (1,) * spatial)
        set_out(0, y)
    elif op == "BatchNormalization":
        x, scale, bias, mean, var = (inp(0), inp(1), inp(2), inp(3),
                                     inp(4))
        eps = a.get("epsilon", 1e-5)
        shape = (1, -1) + (1,) * (x.ndim - 2)
        inv = jax.lax.rsqrt(var + eps)
        set_out(0, (x - mean.reshape(shape)) * (scale * inv)
                .reshape(shape) + bias.reshape(shape))
    elif op == "Reshape":
        target = [int(d) for d in _const_of(env, node.inputs[1],
                                            "Reshape")]
        x = inp(0)
        shape = [x.shape[i] if d == 0 and a.get("allowzero", 0) == 0
                 else d for i, d in enumerate(target)]
        set_out(0, jnp.reshape(x, shape))
    elif op == "Transpose":
        x = inp(0)
        perm = a.get("perm") or list(range(x.ndim))[::-1]
        set_out(0, jnp.transpose(x, perm))
    elif op == "Flatten":
        x = inp(0)
        axis = a.get("axis", 1)
        lead = int(np.prod(x.shape[:axis])) if axis else 1
        set_out(0, jnp.reshape(x, (lead, -1)))
    elif op == "Squeeze":
        axes = a.get("axes")
        if axes is None and len(node.inputs) > 1:
            axes = [int(d) for d in _const_of(env, node.inputs[1],
                                              "Squeeze")]
        x = inp(0)
        set_out(0, jnp.squeeze(x, tuple(axes) if axes else None))
    elif op == "Unsqueeze":
        axes = a.get("axes")
        if axes is None and len(node.inputs) > 1:
            axes = [int(d) for d in _const_of(env, node.inputs[1],
                                              "Unsqueeze")]
        x = inp(0)
        for ax in sorted(int(v) for v in axes):
            x = jnp.expand_dims(x, ax)
        set_out(0, x)
    elif op == "Pad":
        x = inp(0)
        mode = a.get("mode", b"constant")
        mode = mode.decode() if isinstance(mode, bytes) else mode
        pads = a.get("pads")
        if pads is None:
            pads = [int(d) for d in _const_of(env, node.inputs[1],
                                              "Pad")]
        val = 0.0
        if len(node.inputs) > 2 and node.inputs[2]:
            val = float(_const_of(env, node.inputs[2],
                                  "Pad").reshape(-1)[0])
        elif "value" in a:
            val = float(np.asarray(a["value"]).reshape(-1)[0])
        half = len(pads) // 2          # ONNX: all begins, then all ends
        if len(node.inputs) > 3 and node.inputs[3]:
            axes = [int(d) % x.ndim
                    for d in _const_of(env, node.inputs[3], "Pad")]
        else:
            axes = list(range(x.ndim))
        if half != len(axes):
            raise UnsupportedOnnxOp(
                f"Pad: {len(pads)} pad values for {len(axes)} axes")
        width = [(0, 0)] * x.ndim
        for i, ax in enumerate(axes):
            width[ax] = (pads[i], pads[half + i])
        jmode = {"constant": "constant", "reflect": "reflect",
                 "edge": "edge"}.get(mode)
        if jmode is None:
            raise UnsupportedOnnxOp(f"Pad mode {mode!r}")
        # negative pads are ONNX crop semantics: pad the positive
        # parts, slice away the negative ones
        pos = [(max(b, 0), max(e, 0)) for b, e in width]
        kw = {"constant_values": val} if jmode == "constant" else {}
        y = jnp.pad(x, pos, mode=jmode, **kw)
        idx = tuple(slice(-min(b, 0),
                          None if e >= 0 else e)
                    for b, e in width)
        set_out(0, y[idx])
    elif op == "Concat":
        xs = [env[n] for n in node.inputs]
        set_out(0, jnp.concatenate(xs, axis=a.get("axis", 0)))
    elif op == "Slice":
        x = inp(0)
        if len(node.inputs) > 1:       # opset >= 10: tensor operands
            starts = _const_of(env, node.inputs[1], "Slice")
            ends = _const_of(env, node.inputs[2], "Slice")
            axes = (_const_of(env, node.inputs[3], "Slice")
                    if len(node.inputs) > 3 and node.inputs[3]
                    else np.arange(len(starts)))
            steps = (_const_of(env, node.inputs[4], "Slice")
                     if len(node.inputs) > 4 and node.inputs[4]
                     else np.ones(len(starts), np.int64))
        else:                          # opset 1: attributes
            starts = np.asarray(a["starts"])
            ends = np.asarray(a["ends"])
            axes = np.asarray(a.get("axes",
                                    list(range(len(starts)))))
            steps = np.ones(len(starts), np.int64)
        idx = [slice(None)] * x.ndim
        for s, e, ax, st in zip(starts, ends, axes, steps):
            s, e, ax, st = int(s), int(e), int(ax), int(st)
            dim = x.shape[ax]
            if e > dim:
                e = dim
            if e < -dim:
                e = None if st < 0 else -dim
            idx[ax] = slice(s, e, st)
        set_out(0, x[tuple(idx)])
    elif op == "Gather":
        x, ind = inp(0), inp(1)
        set_out(0, jnp.take(x, jnp.asarray(ind),
                            axis=a.get("axis", 0)))
    elif op in ("ReduceMean", "ReduceSum", "ReduceMax", "ReduceMin",
                "ReduceL1", "ReduceL2", "ReduceSumSquare",
                "ReduceLogSum", "ReduceLogSumExp"):
        x = inp(0)
        axes = a.get("axes")
        if axes is None and len(node.inputs) > 1 and node.inputs[1]:
            axes = [int(d) for d in _const_of(env, node.inputs[1],
                                              op)]
        axes = tuple(int(v) for v in axes) if axes else None
        keep = bool(a.get("keepdims", 1))
        red = {
            "ReduceMean": jnp.mean, "ReduceSum": jnp.sum,
            "ReduceMax": jnp.max, "ReduceMin": jnp.min,
            "ReduceL1": lambda v, axis, keepdims: jnp.sum(
                jnp.abs(v), axis=axis, keepdims=keepdims),
            "ReduceL2": lambda v, axis, keepdims: jnp.sqrt(
                jnp.sum(v * v, axis=axis, keepdims=keepdims)),
            "ReduceSumSquare": lambda v, axis, keepdims: jnp.sum(
                v * v, axis=axis, keepdims=keepdims),
            "ReduceLogSum": lambda v, axis, keepdims: jnp.log(
                jnp.sum(v, axis=axis, keepdims=keepdims)),
            "ReduceLogSumExp": lambda v, axis, keepdims:
                jax.scipy.special.logsumexp(
                    v, axis=axis, keepdims=keepdims),
        }[op]
        set_out(0, red(x, axis=axes, keepdims=keep))
    elif op == "ArgMax":
        x = inp(0)
        ax = int(a.get("axis", 0))
        if a.get("select_last_index", 0):
            out = (x.shape[ax] - 1
                   - jnp.argmax(jnp.flip(x, ax), axis=ax))
        else:
            out = jnp.argmax(x, axis=ax)
        # ONNX mandates int64; with jax x64 disabled this yields
        # int32 — correct values, narrower carrier
        out = out.astype(jnp.int64)
        if a.get("keepdims", 1):
            out = jnp.expand_dims(out, ax)
        set_out(0, out)
    elif op == "Expand":
        x = inp(0)
        shape = [int(d) for d in _const_of(env, node.inputs[1],
                                           "Expand")]
        # ONNX Expand is bidirectional numpy broadcasting: a target
        # dim of 1 keeps the input's extent
        full = list(jnp.broadcast_shapes(tuple(x.shape),
                                         tuple(shape)))
        set_out(0, jnp.broadcast_to(x, full))
    elif op == "Split":
        x = inp(0)
        ax = int(a.get("axis", 0))
        sizes = a.get("split")
        if sizes is None and len(node.inputs) > 1 and node.inputs[1]:
            sizes = [int(d) for d in _const_of(env, node.inputs[1],
                                               "Split")]
        if sizes is None:
            k = len(node.outputs)
            if x.shape[ax] % k:
                raise UnsupportedOnnxOp(
                    f"Split: {x.shape[ax]} not divisible by {k}")
            sizes = [x.shape[ax] // k] * k
        off = 0
        for i, sz in enumerate(sizes):
            set_out(i, jax.lax.slice_in_dim(x, off, off + int(sz),
                                            axis=ax))
            off += int(sz)
    elif op == "Trilu":
        x = inp(0)
        k = int(_const_of(env, node.inputs[1], "Trilu")) \
            if len(node.inputs) > 1 and node.inputs[1] else 0
        fn = jnp.triu if a.get("upper", 1) else jnp.tril
        set_out(0, fn(x, k=k))
    elif op == "Range":
        start = _const_of(env, node.inputs[0], "Range")
        limit = _const_of(env, node.inputs[1], "Range")
        delta = _const_of(env, node.inputs[2], "Range")
        set_out(0, np.arange(start.item(), limit.item(),
                             delta.item(),
                             dtype=np.result_type(start, limit,
                                                  delta)))
    elif op == "ConstantOfShape":
        shape = [int(d) for d in _const_of(env, node.inputs[0],
                                           "ConstantOfShape")]
        val = np.asarray(a.get("value", np.zeros(1, np.float32)))
        set_out(0, np.full(shape, val.reshape(-1)[0],
                           dtype=val.dtype))
    elif op == "LayerNormalization":
        x, scale = inp(0), inp(1)
        bias = inp(2)
        ax = int(a.get("axis", -1))
        eps = a.get("epsilon", 1e-5)
        axes = tuple(range(ax % x.ndim, x.ndim))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=axes,
                       keepdims=True)
        inv = jax.lax.rsqrt(var + eps)
        y = (x - mean) * inv * scale
        if bias is not None:
            y = y + bias
        set_out(0, y)
        set_out(1, mean)
        set_out(2, inv)
    elif op == "Constant":
        for key in ("value", "value_float", "value_int",
                    "value_floats", "value_ints"):
            if key in a:
                set_out(0, np.asarray(a[key]))
                return
        raise UnsupportedOnnxOp("Constant with no value attribute")
    elif op == "Cast":
        to = _ONNX_DTYPES.get(a.get("to", 1))
        if to is None:
            raise UnsupportedOnnxOp(f"Cast to dtype {a.get('to')}")
        set_out(0, inp(0).astype(to))
    elif op == "Shape":
        x = inp(0)
        set_out(0, np.asarray(x.shape, np.int64))
    elif op == "Dropout":
        set_out(0, inp(0))             # inference mode: identity
        if len(node.outputs) > 1:
            set_out(1, jnp.ones(inp(0).shape, bool))
    elif op == "InstanceNormalization":
        x, scale, bias = inp(0), inp(1), inp(2)
        eps = a.get("epsilon", 1e-5)
        axes = tuple(range(2, x.ndim))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=axes,
                       keepdims=True)
        shape = (1, -1) + (1,) * (x.ndim - 2)
        y = (x - mean) * jax.lax.rsqrt(var + eps) \
            * scale.reshape(shape)
        if bias is not None:
            y = y + bias.reshape(shape)
        set_out(0, y)
    elif op == "Resize":
        set_out(0, _resize(node, env, a))
    elif op in ("GRU", "LSTM"):
        _recurrent(op, node, env, a,
                   lambda i, d=None: inp(i, d), set_out)
    else:
        raise UnsupportedOnnxOp(op)


#: ops the pure-JAX executor implements (the validation set for
#: build_fn and the census tool)
KNOWN_OPS = frozenset({
    "Add", "Sub", "Mul", "Div", "Pow", "Sqrt", "Exp", "Log",
    "Neg", "Abs", "Erf", "Sin", "Cos", "Relu", "LeakyRelu",
    "Gelu", "Sigmoid", "Tanh", "Identity", "Clip", "Softmax",
    "Min", "Max", "Equal", "Greater", "Less", "Where",
    "MatMul", "Gemm", "Conv",
    "MaxPool", "AveragePool", "GlobalAveragePool",
    "BatchNormalization", "LayerNormalization",
    "Reshape", "Transpose", "Flatten",
    "Squeeze", "Unsqueeze", "Expand", "Split", "Pad", "Concat",
    "Slice", "Gather",
    "ReduceMean", "ReduceSum", "ReduceMax", "ReduceMin",
    "ArgMax", "Trilu", "Range", "ConstantOfShape",
    "Constant", "Cast", "Shape",
    "Dropout",
    "InstanceNormalization", "Resize", "GRU", "LSTM",
    "Floor", "Ceil", "Round", "Reciprocal", "Softplus",
    "HardSwish", "HardSigmoid", "Elu", "PRelu",
    "GlobalMaxPool", "ReduceProd", "ConvTranspose",
    "Sum", "Mean", "And", "Or", "Xor", "Not", "Sign", "Tile",
    "GatherElements", "DepthToSpace", "SpaceToDepth", "TopK",
    "ReduceL1", "ReduceL2", "ReduceSumSquare", "ReduceLogSum",
    "ReduceLogSumExp",
})


def op_census(graph: OnnxGraph) -> Dict[str, Any]:
    """Per-op census of a parsed model: what it uses, what the pure-
    JAX executor covers, and which nodes would block execution.

    CLI: ``python -m cyberether_tpu onnx-census model.onnx``.
    (Reference delegates the full opset to ONNX Runtime —
    /root/reference/src/domains/ml/onnx_inference/module_impl.cc;
    this tool tells a user up front whether a given export runs on
    the JAX route or needs the optional ORT provider.)"""
    counts: Dict[str, int] = {}
    for n in graph.nodes:
        counts[n.op_type] = counts.get(n.op_type, 0) + 1
    unsupported = {k: v for k, v in counts.items()
                   if k not in KNOWN_OPS}
    return {
        "graph": graph.name,
        "opset": graph.opset,
        "node_count": len(graph.nodes),
        "ops": dict(sorted(counts.items())),
        "unsupported": dict(sorted(unsupported.items())),
        "runnable": not unsupported,
        "inputs": [(n, d) for n, _, d in graph.inputs
                   if n not in graph.initializers],
        "outputs": [(n, d) for n, _, d in graph.outputs],
    }


def build_fn(graph: OnnxGraph, precision: Optional[str] = None
             ) -> Callable[[Dict[str, Any]], Dict[str, Any]]:
    """OnnxGraph -> pure jittable fn(inputs dict) -> outputs dict.

    Validation pass: every node's op must be in the subset, checked
    here (not mid-run) by a dry scan of op types.

    ``precision`` ("highest" | "high" | None) applies to every
    MatMul/Gemm/Conv: the TPU default is bf16-class even for f32
    inputs (CLAUDE.md), ~3e-3 off a CPU run through an attention
    block; "highest" restores exact f32 at ~6x MXU passes.
    """
    prec = ({"highest": jax.lax.Precision.HIGHEST,
             "high": jax.lax.Precision.HIGH}[precision.lower()]
            if isinstance(precision, str) else precision)
    bad = sorted({n.op_type for n in graph.nodes} - KNOWN_OPS)
    if bad:
        raise UnsupportedOnnxOp(
            f"ops outside the pure-JAX subset: {bad}")

    inits = {k: v for k, v in graph.initializers.items()}
    out_names = graph.output_names

    def fn(inputs: Dict[str, Any]) -> Dict[str, Any]:
        env: Dict[str, Any] = dict(inits)
        env.update(inputs)
        for node in graph.nodes:
            _apply_node(node, env, precision=prec,
                        opset=graph.opset)
        return {n: env[n] for n in out_names}

    return fn
