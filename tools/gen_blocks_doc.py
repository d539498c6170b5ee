#!/usr/bin/env python
"""Regenerate docs/blocks.md from the live registry (schemas + ports +
provider targets), so the block reference can never drift from the
code.  Run: JAX_PLATFORMS=cpu python tools/gen_blocks_doc.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from cyberether_tpu.core.registry import registry  # noqa: E402
import cyberether_tpu  # noqa: E402,F401  (registers everything)


def block_section(t: str) -> str:
    entry = registry.block_entry(t)
    cls = entry.cls
    ins = list(getattr(cls, "input_ports", ()))
    outs = list(getattr(cls, "output_ports", ()))
    fields = list(getattr(cls, "schema").fields.values())
    keys = registry.list_modules(t)
    if not (ins or outs or fields) and keys:
        mcls = registry.build_module(t, keys[0].device,
                                     keys[0].runtime, keys[0].provider)
        ins = list(getattr(mcls, "input_ports", ()))
        outs = list(getattr(mcls, "output_ports", ()))
        fields = list(getattr(mcls, "schema").fields.values())
    targets = sorted({f"{k.device.name.lower()}/{k.runtime.name.lower()}/{k.provider}"
                      for k in keys}) or ["(composite)"]
    lines = [f"## `{t}`", ""]
    if entry.summary:
        lines += [entry.summary, ""]
    lines += ["targets: " + " · ".join(targets), ""]
    if ins or outs:
        lines += [f"ports: in {', '.join(ins) or '—'} → "
                  f"out {', '.join(outs) or '—'}", ""]
    if fields:
        lines += ["| config | type | default |", "|---|---|---|"]
        for f in fields:
            d = f.default
            lines.append(f"| {f.name} | {f.type} | `{d!r}` |")
        lines.append("")
    return "\n".join(lines)


def main() -> None:
    out = ["# Block reference", "",
           "Auto-generated from the registry by "
           "`tools/gen_blocks_doc.py` — do not edit by hand.", ""]
    for t in sorted(registry.list_blocks()):
        out.append(block_section(t))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "blocks.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path} ({len(registry.list_blocks())} blocks)")


if __name__ == "__main__":
    main()
