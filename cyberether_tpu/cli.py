"""Command-line entry — the `cyberether` analog.

Reference CLI surface (/root/reference/src/run_native.cc:324-907):
``cyberether [flowgraph.yml]`` runs a graph, ``cyberether benchmark
[component] --format markdown|json|csv`` runs the measurement harness;
flags for headless/verbose/plugins; Ctrl-C handling with double-^C
force quit.

Usage:
    python -m cyberether_tpu run <flowgraph.yml> [--duration S]
        [--serve PORT] [--print-output BLOCK.PORT]
    python -m cyberether_tpu benchmark [component] [--format FMT]
    python -m cyberether_tpu list [blocks|modules|examples]
    python -m cyberether_tpu info
"""

from __future__ import annotations

import argparse
import json
import signal
import sys
import time
from typing import Optional

import numpy as np


def _cmd_run(args) -> int:
    from cyberether_tpu import Instance
    from cyberether_tpu.utils.logging import set_level

    if args.verbose:
        set_level("DEBUG" if args.verbose > 1 else "INFO")

    from cyberether_tpu.core import plugin as plugin_loader

    for p in args.plugin or []:
        info = plugin_loader.load(p)
        print(f"loaded plugin '{info.name}' v{info.version}",
              file=sys.stderr)

    inst = Instance(headless=True)
    from cyberether_tpu import registry as _registry

    if args.flowgraph in _registry.list_examples():
        fg = inst.flowgraph_import(
            _registry.example(args.flowgraph).yaml_text)
    else:
        fg = inst.flowgraph_import(args.flowgraph)
    bad = [n for n in fg.records
           if fg.block_state(n).value == "errored"]
    for n in bad:
        print(f"[warn] block '{n}' errored: {fg.block_error(n)}",
              file=sys.stderr)

    server = None
    supervisor = None
    if args.serve or args.remote:
        from cyberether_tpu.remote.server import RemoteServer

        token = ""
        if args.remote:
            import secrets

            token = secrets.token_urlsafe(8)
        server = RemoteServer(inst, port=args.serve or 8765,
                              token=token)
        server.start()
        if args.remote:
            # headless-remote supervisor: invite URL + QR + live status
            # (reference src/instance_remote_supervisor.cc)
            from cyberether_tpu.remote.supervisor import Supervisor

            supervisor = Supervisor(inst, server)
        else:
            print("serving flowgraph UI on "
                  f"http://0.0.0.0:{server.port}", file=sys.stderr)

    stop = {"flag": False, "count": 0}

    def on_int(sig, frame):
        stop["count"] += 1
        stop["flag"] = True
        if stop["count"] >= 2:   # double Ctrl-C force-kills
            sys.exit(130)

    signal.signal(signal.SIGINT, on_int)
    if args.trace:
        import jax

        jax.profiler.start_trace(args.trace)
    inst.start()
    t0 = time.monotonic()
    try:
        if supervisor is not None:
            supervisor.run(should_stop=lambda: stop["flag"],
                           duration=args.duration)
        else:
            while not stop["flag"]:
                if args.duration and \
                        time.monotonic() - t0 >= args.duration:
                    break
                time.sleep(0.05)
    finally:
        inst.stop()
        if args.trace:
            import jax

            jax.profiler.stop_trace()
            print(f"trace written to {args.trace}", file=sys.stderr)
        if server is not None:
            server.stop()
    if args.profile:
        prof = fg.scheduler.profile()
        print("\n# per-module compute time (ms)", file=sys.stderr)
        for name, ms in sorted(prof.items(), key=lambda kv: -kv[1]):
            print(f"  {name:32s} {ms:8.3f}", file=sys.stderr)
    if args.print_output:
        out = fg.scheduler.output(args.print_output)
        if out is None:
            print("null")
        else:
            np.set_printoptions(threshold=32)
            print(out)
    if args.export:
        fg.to_file(args.export)
    return 0


def _cmd_benchmark(args) -> int:
    from cyberether_tpu import benchmark

    results = benchmark.run(args.component)
    if not results:
        print(f"no benchmark cases for '{args.component}'",
              file=sys.stderr)
        return 1
    print(benchmark.format_results(results, args.format))
    return 0


def _cmd_list(args) -> int:
    from cyberether_tpu import registry

    kind = args.kind
    if kind in ("blocks", "all"):
        print("# blocks")
        for b in registry.list_blocks():
            e = registry.block_entry(b)
            print(f"  {b:24s} {e.summary}")
    if kind in ("modules", "all"):
        print("# modules")
        for k in registry.list_modules():
            print(f"  {k.type:24s} [{k.device.canonical()}/"
                  f"{k.runtime.value}/{k.provider}]")
    if kind in ("examples", "all"):
        print("# examples")
        for name in registry.list_examples():
            print(f"  {name}")
    return 0


def _cmd_describe(args) -> int:
    from cyberether_tpu import registry

    if not registry.has_block(args.block):
        print(f"unknown block '{args.block}'", file=sys.stderr)
        return 1
    entry = registry.block_entry(args.block)
    print(f"# {entry.label or args.block}")
    if entry.summary:
        print(entry.summary)
    schema = getattr(entry.cls, "schema", None)
    if (schema is None or not schema.fields) \
            and registry.has_module(args.block):
        # 1:1 wrapper blocks carry their config on the module class
        schema = getattr(registry.build_module(args.block), "schema",
                         schema)
    if schema is not None and schema.fields:
        print("\nconfig:")
        for f in schema.fields.values():
            print(f"  {f.name:24s} {f.type:12s} default={f.default!r}"
                  + (f"  {f.help}" if f.help else ""))
    cls = entry.cls
    ins = getattr(cls, "input_ports", ())
    outs = getattr(cls, "output_ports", ())
    if ins:
        print(f"\ninputs:  {', '.join(ins)}")
    if outs:
        print(f"outputs: {', '.join(outs)}")
    keys = registry.list_modules(args.block)
    if keys:
        print("\nmodule implementations:")
        for k in keys:
            print(f"  [{k.device.canonical()}/{k.runtime.value}/"
                  f"{k.provider}]")
    return 0


def _cmd_info(args) -> int:
    import jax

    import cyberether_tpu
    from cyberether_tpu import registry

    print(f"cyberether-tpu {cyberether_tpu.__version__}")
    print(f"jax {jax.__version__}")
    try:
        devs = jax.devices()
        print(f"devices: {devs}")
    except Exception as e:
        print(f"devices: unavailable ({e})")
    print(f"blocks: {len(registry.list_blocks())}, "
          f"modules: {len(registry.list_modules())}")
    return 0


def _cmd_onnx_census(args) -> int:
    import json as _json

    from cyberether_tpu.ops.onnx_jax import load_model, op_census

    census = op_census(load_model(args.model))
    if args.format == "json":
        print(_json.dumps(census, indent=1))
        return 0 if census["runnable"] else 3
    print(f"graph: {census['graph'] or '(unnamed)'}  "
          f"opset {census['opset']}  {census['node_count']} nodes")
    for name, dims in census["inputs"]:
        print(f"  input  {name}: {list(dims)}")
    for name, dims in census["outputs"]:
        print(f"  output {name}: {list(dims)}")
    for op_name, cnt in census["ops"].items():
        mark = " " if op_name not in census["unsupported"] else "!"
        print(f"  {mark} {op_name:<24} x{cnt}")
    if census["runnable"]:
        print("runnable on the pure-JAX executor")
        return 0
    print(f"NOT runnable: {', '.join(census['unsupported'])} "
          "unsupported (the optional onnxruntime provider covers "
          "the full opset)")
    return 3


def _cmd_sdr_server(args) -> int:
    import time as _time

    from cyberether_tpu.io.remote_sdr import RemoteSdrServer

    server = RemoteSdrServer(host=args.host, port=args.port,
                             token=args.token).start()
    tok = f",token={args.token}" if args.token else ""
    print(f"remote SDR server on {args.host}:{server.port} "
          f"(clients: deviceString "
          f"'remote=<this-host>:{server.port},driver=...{tok}')",
          flush=True)
    try:
        while True:
            _time.sleep(1.0)
    except KeyboardInterrupt:
        pass
    finally:
        server.stop()
    return 0


def main(argv: Optional[list] = None) -> int:
    p = argparse.ArgumentParser(prog="cyberether-tpu")
    p.add_argument("-v", "--verbose", action="count", default=0)
    sub = p.add_subparsers(dest="cmd")

    runp = sub.add_parser("run", help="run a flowgraph (file or "
                                      "example name)")
    runp.add_argument("flowgraph")
    runp.add_argument("--plugin", action="append", default=[],
                      help="load a plugin bundle/directory (repeatable)")
    runp.add_argument("--duration", type=float, default=0.0,
                      help="seconds to run (0 = until Ctrl-C)")
    runp.add_argument("--serve", type=int, default=0,
                      help="serve the web UI on this port")
    runp.add_argument("--remote", action="store_true",
                      help="headless remote mode: tokened web UI + "
                           "terminal supervisor (invite URL + QR)")
    runp.add_argument("--print-output", default="",
                      help="print BLOCK.PORT after the run")
    runp.add_argument("--export", default="",
                      help="re-export the flowgraph YAML on exit")
    runp.add_argument("--profile", action="store_true",
                      help="print per-module compute times on exit")
    runp.add_argument("--trace", default="",
                      help="write a jax profiler trace (xplane/"
                           "perfetto) to this directory")

    bp = sub.add_parser("benchmark", help="run component benchmarks")
    bp.add_argument("component", nargs="?", default=None)
    bp.add_argument("--format", default="markdown",
                    choices=("markdown", "json", "csv"))

    lp = sub.add_parser("list", help="list registered components")
    lp.add_argument("kind", nargs="?", default="all",
                    choices=("blocks", "modules", "examples", "all"))

    sub.add_parser("info", help="environment info")

    dp = sub.add_parser("describe", help="show a block's interface")
    dp.add_argument("block")

    cp = sub.add_parser(
        "onnx-census",
        help="report which ops a .onnx model uses and whether the "
             "pure-JAX executor covers them")
    cp.add_argument("model")
    cp.add_argument("--format", default="text",
                    choices=("text", "json"))

    sp = sub.add_parser(
        "sdr-server",
        help="serve local SDR drivers to remote clients (the "
             "SoapyRemote role); clients use deviceString "
             "'remote=host:port[,driver=...]'")
    sp.add_argument("--host", default="127.0.0.1",
                    help="bind address (default loopback; use "
                         "0.0.0.0 to serve a LAN, ideally with "
                         "--token)")
    sp.add_argument("--port", type=int, default=55132)
    sp.add_argument("--token", default="",
                    help="require this token from clients "
                         "(deviceString ...,token=<secret>)")

    args = p.parse_args(argv)
    if args.cmd == "describe":
        return _cmd_describe(args)
    if args.cmd == "onnx-census":
        return _cmd_onnx_census(args)
    if args.cmd == "sdr-server":
        return _cmd_sdr_server(args)
    if args.cmd == "run":
        return _cmd_run(args)
    if args.cmd == "benchmark":
        return _cmd_benchmark(args)
    if args.cmd == "list":
        return _cmd_list(args)
    if args.cmd == "info":
        return _cmd_info(args)
    p.print_help()
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
