"""Headless-remote supervisor: terminal status UI for `run --remote`.

Mirrors the reference supervisor
(/root/reference/src/instance_remote_supervisor.cc, wired at
src/run_native.cc:858-865): prints the invite URL and a scannable
terminal QR code, then keeps a one-line live status (block states,
connected clients, per-cycle time) until the instance stops.
"""

from __future__ import annotations

import socket
import sys
import time
from typing import List, Optional


def _host_addresses() -> List[str]:
    """Best-effort list of reachable host IPs (no egress needed)."""
    addrs = []
    try:
        hostname = socket.gethostname()
        for info in socket.getaddrinfo(hostname, None,
                                       socket.AF_INET):
            ip = info[4][0]
            if ip not in addrs and not ip.startswith("127."):
                addrs.append(ip)
    except OSError:
        pass
    # UDP-connect trick finds the egress-interface address without
    # sending anything
    try:
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.connect(("10.255.255.255", 1))
        ip = s.getsockname()[0]
        s.close()
        if ip not in addrs and not ip.startswith("127."):
            addrs.insert(0, ip)
    except OSError:
        pass
    return addrs or ["127.0.0.1"]


class Supervisor:
    """Prints invite info once, then live status lines.

    ``server`` is a started RemoteServer; ``instance`` the app root.
    """

    def __init__(self, instance, server, out=None):
        self.instance = instance
        self.server = server
        self.out = out if out is not None else sys.stderr

    def invite_url(self) -> str:
        host = _host_addresses()[0]
        url = f"http://{host}:{self.server.port}/"
        if self.server.token:
            url += f"?token={self.server.token}"
        return url

    def print_banner(self, qr: bool = True) -> None:
        url = self.invite_url()
        w = self.out.write
        w("\n  cyberether-tpu remote session\n")
        w("  -----------------------------\n")
        for host in _host_addresses():
            tok = f"?token={self.server.token}" if self.server.token \
                else ""
            w(f"  invite: http://{host}:{self.server.port}/{tok}\n")
        if qr:
            try:
                from cyberether_tpu.utils.qr import qr_terminal

                w("\n" + _indent(qr_terminal(url), "  ") + "\n")
            except ValueError:
                w("  (URL too long for a QR code)\n")
        w("\n")
        self.out.flush()

    def status_line(self) -> str:
        states: dict = {}
        clients = len(getattr(self.server, "_clients", ()))
        cyc = 0
        last_ms = 0.0
        for fg in self.instance.flowgraphs.values():
            for name in fg.records:
                s = fg.block_state(name).value
                states[s] = states.get(s, 0) + 1
            for t in fg.scheduler.timings().values():
                cyc = max(cyc, t.cycles)
                last_ms += t.last_ms
        st = " ".join(f"{k}:{v}" for k, v in sorted(states.items()))
        return (f"clients:{clients} cycles:{cyc} "
                f"cycle_ms:{last_ms:.2f} blocks[{st}]")

    def run(self, interval: float = 1.0,
            should_stop=None, duration: float = 0.0) -> None:
        self.print_banner()
        t0 = time.monotonic()
        try:
            while True:
                if should_stop is not None and should_stop():
                    break
                if duration and time.monotonic() - t0 >= duration:
                    break
                self.out.write("\r  " + self.status_line() + "   ")
                self.out.flush()
                time.sleep(interval)
        finally:
            self.out.write("\n")
            self.out.flush()


def _indent(text: str, prefix: str) -> str:
    return "\n".join(prefix + line for line in text.splitlines())
