"""MobileNetV3-Small (Howard et al. 2019, table 2) — second real
published architecture for the pure-JAX ONNX executor: inverted
residuals with depthwise convs, squeeze-excite, HardSwish/HardSigmoid
and BatchNorm, as (a) a torch.nn golden model and (b) an ONNX proto
from the same seeded weights.  Built at test time (not committed —
~10 MB); reproducible from the numpy seed.

Reference op surface:
/root/reference/include/jetstream/domains/ml/onnx_inference/module.hh:9-17.
"""

from __future__ import annotations

import numpy as np

from onnx_build import graph, model, node, tensor_proto, value_info

# (kernel, exp, out, SE, HardSwish, stride) per bneck — v3-Small
BNECK = [
    (3, 16, 16, True, False, 2),
    (3, 72, 24, False, False, 2),
    (3, 88, 24, False, False, 1),
    (5, 96, 40, True, True, 2),
    (5, 240, 40, True, True, 1),
    (5, 240, 40, True, True, 1),
    (5, 120, 48, True, True, 1),
    (5, 144, 48, True, True, 1),
    (5, 288, 96, True, True, 2),
    (5, 576, 96, True, True, 1),
    (5, 576, 96, True, True, 1),
]
LAST_CONV = 576
CLS_HIDDEN = 1024
N_CLASSES = 1000


def _se_reduce(exp: int) -> int:
    r = max(8, (exp // 4 + 3) // 8 * 8)
    return r


def make_weights(seed: int = 7) -> dict:
    rng = np.random.default_rng(seed)
    w = {}

    def conv(name, cout, cin, k):
        fan = cin * k * k
        w[f"{name}.w"] = (rng.standard_normal((cout, cin, k, k))
                          * np.sqrt(2.0 / fan)).astype(np.float32)

    def bias(name, c):
        w[f"{name}.b"] = (rng.standard_normal(c)
                          * 0.01).astype(np.float32)

    def bn(name, c):
        w[f"{name}.g"] = (1.0 + 0.1 * rng.standard_normal(c)) \
            .astype(np.float32)
        w[f"{name}.be"] = (0.05 * rng.standard_normal(c)) \
            .astype(np.float32)
        w[f"{name}.m"] = (0.1 * rng.standard_normal(c)) \
            .astype(np.float32)
        w[f"{name}.v"] = (0.5 + rng.random(c)).astype(np.float32)

    conv("stem", 16, 3, 3)
    bn("stem.bn", 16)
    cin = 16
    for i, (k, exp, out, se, hs, s) in enumerate(BNECK):
        p = f"b{i}"
        if exp != cin:
            conv(f"{p}.expand", exp, cin, 1)
            bn(f"{p}.expand.bn", exp)
        w[f"{p}.dw.w"] = (rng.standard_normal((exp, 1, k, k))
                          * np.sqrt(2.0 / (k * k))) \
            .astype(np.float32)
        bn(f"{p}.dw.bn", exp)
        if se:
            r = _se_reduce(exp)
            conv(f"{p}.se1", r, exp, 1)
            bias(f"{p}.se1", r)
            conv(f"{p}.se2", exp, r, 1)
            bias(f"{p}.se2", exp)
        conv(f"{p}.proj", out, exp, 1)
        bn(f"{p}.proj.bn", out)
        cin = out
    conv("head", LAST_CONV, cin, 1)
    bn("head.bn", LAST_CONV)
    conv("cls1", CLS_HIDDEN, LAST_CONV, 1)
    bias("cls1", CLS_HIDDEN)
    conv("cls2", N_CLASSES, CLS_HIDDEN, 1)
    bias("cls2", N_CLASSES)
    return w


def torch_model(weights: dict):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class SE(nn.Module):
        def __init__(self, exp):
            super().__init__()
            r = _se_reduce(exp)
            self.fc1 = nn.Conv2d(exp, r, 1)
            self.fc2 = nn.Conv2d(r, exp, 1)

        def forward(self, x):
            s = x.mean(dim=(2, 3), keepdim=True)
            s = F.relu(self.fc1(s))
            s = F.hardsigmoid(self.fc2(s))
            return x * s

    class Bneck(nn.Module):
        def __init__(self, cin, k, exp, out, se, hs, stride):
            super().__init__()
            self.expand = (nn.Conv2d(cin, exp, 1, bias=False)
                           if exp != cin else None)
            self.expand_bn = (nn.BatchNorm2d(exp)
                              if exp != cin else None)
            self.dw = nn.Conv2d(exp, exp, k, stride=stride,
                                padding=k // 2, groups=exp,
                                bias=False)
            self.dw_bn = nn.BatchNorm2d(exp)
            self.se = SE(exp) if se else None
            self.proj = nn.Conv2d(exp, out, 1, bias=False)
            self.proj_bn = nn.BatchNorm2d(out)
            self.act = F.hardswish if hs else F.relu
            self.res = stride == 1 and cin == out

        def forward(self, x):
            y = x
            if self.expand is not None:
                y = self.act(self.expand_bn(self.expand(y)))
            y = self.act(self.dw_bn(self.dw(y)))
            if self.se is not None:
                y = self.se(y)
            y = self.proj_bn(self.proj(y))
            return x + y if self.res else y

    class V3Small(nn.Module):
        def __init__(self):
            super().__init__()
            self.stem = nn.Conv2d(3, 16, 3, stride=2, padding=1,
                                  bias=False)
            self.stem_bn = nn.BatchNorm2d(16)
            blocks = []
            cin = 16
            for k, exp, out, se, hs, s in BNECK:
                blocks.append(Bneck(cin, k, exp, out, se, hs, s))
                cin = out
            self.blocks = nn.ModuleList(blocks)
            self.head = nn.Conv2d(cin, LAST_CONV, 1, bias=False)
            self.head_bn = nn.BatchNorm2d(LAST_CONV)
            self.cls1 = nn.Conv2d(LAST_CONV, CLS_HIDDEN, 1)
            self.cls2 = nn.Conv2d(CLS_HIDDEN, N_CLASSES, 1)

        def forward(self, x):
            x = F.hardswish(self.stem_bn(self.stem(x)))
            for b in self.blocks:
                x = b(x)
            x = F.hardswish(self.head_bn(self.head(x)))
            x = x.mean(dim=(2, 3), keepdim=True)
            x = F.hardswish(self.cls1(x))
            x = self.cls2(x)
            return x.flatten(1)

    m = V3Small().eval()
    w = weights
    with torch.no_grad():
        def load_conv(mod, name, has_bias=False):
            mod.weight.copy_(torch.from_numpy(w[f"{name}.w"]))
            if has_bias:
                mod.bias.copy_(torch.from_numpy(w[f"{name}.b"]))

        def load_bn(mod, name):
            mod.weight.copy_(torch.from_numpy(w[f"{name}.g"]))
            mod.bias.copy_(torch.from_numpy(w[f"{name}.be"]))
            mod.running_mean.copy_(torch.from_numpy(w[f"{name}.m"]))
            mod.running_var.copy_(torch.from_numpy(w[f"{name}.v"]))

        load_conv(m.stem, "stem")
        load_bn(m.stem_bn, "stem.bn")
        for i, b in enumerate(m.blocks):
            p = f"b{i}"
            if b.expand is not None:
                load_conv(b.expand, f"{p}.expand")
                load_bn(b.expand_bn, f"{p}.expand.bn")
            b.dw.weight.copy_(torch.from_numpy(w[f"{p}.dw.w"]))
            load_bn(b.dw_bn, f"{p}.dw.bn")
            if b.se is not None:
                load_conv(b.se.fc1, f"{p}.se1", True)
                load_conv(b.se.fc2, f"{p}.se2", True)
            load_conv(b.proj, f"{p}.proj")
            load_bn(b.proj_bn, f"{p}.proj.bn")
        load_conv(m.head, "head")
        load_bn(m.head_bn, "head.bn")
        load_conv(m.cls1, "cls1", True)
        load_conv(m.cls2, "cls2", True)
    return m


def build_onnx(weights: dict, size: int = 96) -> bytes:
    w = weights
    nodes = []
    inits = []

    def conv(name, src, dst, k=1, stride=1, pad=0, groups=1,
             has_bias=False):
        ins = [src, f"{name}.w"]
        inits.append(tensor_proto(f"{name}.w", w[f"{name}.w"]))
        if has_bias:
            inits.append(tensor_proto(f"{name}.b", w[f"{name}.b"]))
            ins.append(f"{name}.b")
        nodes.append(node("Conv", ins, [dst],
                          {"kernel_shape": [k, k],
                           "strides": [stride, stride],
                           "pads": [pad, pad, pad, pad],
                           "group": groups}))

    def bn(name, src, dst):
        for sfx, key in (("g", "g"), ("be", "be"), ("m", "m"),
                         ("v", "v")):
            inits.append(tensor_proto(f"{name}.{sfx}",
                                      w[f"{name}.{key}"]))
        nodes.append(node("BatchNormalization",
                          [src, f"{name}.g", f"{name}.be",
                           f"{name}.m", f"{name}.v"], [dst],
                          {"epsilon": 1e-5}))

    def act(src, dst, hs):
        nodes.append(node("HardSwish" if hs else "Relu", [src],
                          [dst]))

    conv("stem", "input", "c0", k=3, stride=2, pad=1)
    bn("stem.bn", "c0", "c0b")
    act("c0b", "x0", True)
    prev = "x0"
    cin = 16
    for i, (k, exp, out, se, hs, s) in enumerate(BNECK):
        p = f"b{i}"
        y = prev
        if exp != cin:
            conv(f"{p}.expand", y, f"{p}e", k=1)
            bn(f"{p}.expand.bn", f"{p}e", f"{p}eb")
            act(f"{p}eb", f"{p}ea", hs)
            y = f"{p}ea"
        conv(f"{p}.dw", y, f"{p}d", k=k, stride=s, pad=k // 2,
             groups=exp)
        bn(f"{p}.dw.bn", f"{p}d", f"{p}db")
        act(f"{p}db", f"{p}da", hs)
        y = f"{p}da"
        if se:
            nodes.append(node("GlobalAveragePool", [y], [f"{p}sp"]))
            conv(f"{p}.se1", f"{p}sp", f"{p}s1", k=1, has_bias=True)
            nodes.append(node("Relu", [f"{p}s1"], [f"{p}s1a"]))
            conv(f"{p}.se2", f"{p}s1a", f"{p}s2", k=1,
                 has_bias=True)
            nodes.append(node("HardSigmoid", [f"{p}s2"], [f"{p}s2a"],
                              {"alpha": 1.0 / 6.0, "beta": 0.5}))
            nodes.append(node("Mul", [y, f"{p}s2a"], [f"{p}se"]))
            y = f"{p}se"
        conv(f"{p}.proj", y, f"{p}p", k=1)
        bn(f"{p}.proj.bn", f"{p}p", f"{p}pb")
        y = f"{p}pb"
        if s == 1 and cin == out:
            nodes.append(node("Add", [prev, y], [f"{p}r"]))
            y = f"{p}r"
        prev = y
        cin = out
    conv("head", prev, "h0", k=1)
    bn("head.bn", "h0", "h0b")
    act("h0b", "h0a", True)
    nodes.append(node("GlobalAveragePool", ["h0a"], ["gap"]))
    conv("cls1", "gap", "c1", k=1, has_bias=True)
    act("c1", "c1a", True)
    conv("cls2", "c1a", "c2", k=1, has_bias=True)
    inits.append(tensor_proto("oshape",
                              np.asarray([1, N_CLASSES], np.int64)))
    nodes.append(node("Reshape", ["c2", "oshape"], ["output"]))
    g = graph(nodes, "mobilenet_v3_small",
              inputs=[value_info("input", 1, [1, 3, size, size])],
              outputs=[value_info("output", 1, [1, N_CLASSES])],
              initializers=inits)
    return model(g, opset=13)
