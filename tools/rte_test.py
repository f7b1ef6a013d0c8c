#!/usr/bin/env python
"""Exhaustive online test of every realtime effect and parameter — the
lives-rte-test.pl successor (reference `tools/lives-rte-test.pl`: map
each plugin on an effect key over OSC while playing, sweep every
parameter across its range, and watch for errors/crashes).

Usage:
    python tools/rte_test.py [--match SUBSTR] [--limit N] [--port P]
        [--frames N] [--key K]

Without --port it self-hosts a player (plasma generator foreground,
colour-bars background so transitions have two channels) and renders
--frames real frames per filter with the effect enabled. Against a
running instance (--port) it drives the same sweep over UDP.

Per filter: map on the key, enable, render; for every parameter, set
min / midpoint / max (num), both states (bool), every choice index
(string_list), and the default back (string); each set is followed by
an /app/ping barrier that collects /error replies, and numeric sets
must echo back through value/get. Exits nonzero listing the failures.
"""

from __future__ import annotations

import argparse
import os
import socket
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lives_tpu.osc.client import OSCClient  # noqa: E402

P = "/effect_key/parameter"


def _sweep_values(cli: OSCClient, key: int, i: int):
    """Yield the wire values to try for parameter i of the key's filter."""
    kind = cli.query1(f"{P}/type/get", key, i)
    if kind in ("float", "int"):
        lo = float(cli.query1(f"{P}/min/get", key, i))
        hi = float(cli.query1(f"{P}/max/get", key, i))
        vals = [lo, (lo + hi) / 2.0, hi]
        if kind == "int":
            vals = sorted({int(round(v)) for v in vals})
        for v in vals:
            yield kind, v
    elif kind == "bool":
        yield kind, 1
        yield kind, 0
    elif kind == "string_list":
        n = int(cli.query1(f"{P}/gui/choices/count", key, i) or 0)
        for c in range(n):
            yield kind, c
    elif kind == "string":
        d = cli.query1(f"{P}/default/get", key, i)
        yield kind, str(d if d is not None else "")
    # color params: exercised via default/get round trip only (value/set
    # takes component lists; the param UI covers those paths)


def test_filter(cli: OSCClient, name: str, key: int,
                pump=None, frames: int = 2) -> list[str]:
    """Map, enable, render, sweep every param, disable. Returns errors."""
    errs: list[str] = []
    cli.send("/effect_key/map", key, name)
    cli.send("/effect_key/enable", key)
    errs += [f"{name}: {e}" for e in cli.barrier()]
    if errs:
        cli.send("/effect_key/disable", key)
        cli.barrier()
        return errs                      # could not even instantiate
    if pump:
        pump(frames)                     # render with defaults
    n = int(cli.query1(f"{P}/count", key) or 0)
    for i in range(n):
        pname = cli.query1(f"{P}/name/get", key, i)
        for kind, v in _sweep_values(cli, key, i):
            cli.send(f"{P}/value/set", key, i, v)
            for e in cli.barrier():
                errs.append(f"{name}.{pname}={v!r}: {e}")
            if kind == "float":
                got = cli.query1(f"{P}/value/get", key, i)
                if abs(float(got) - float(v)) > 1e-4 * (abs(v) + 1.0):
                    errs.append(
                        f"{name}.{pname}: set {v} read back {got}")
            if pump:
                pump(1)                  # render a frame at this setting
    if pump:
        pump(frames)                     # render at the swept end state
    cli.send("/effect_key/disable", key)
    errs += [f"{name} (disable): {e}" for e in cli.barrier()]
    return errs


def run_rte_test(port: int | None = None, host: str = "127.0.0.1",
                 match: str | None = None, limit: int | None = None,
                 key: int = 1, frames: int = 2, timeout: float = 10.0,
                 log=lambda s: print(s, flush=True)):
    """Returns (tested_names, {filter: [error, ...]})."""
    owned = None
    pump = None
    if port is None:
        from lives_tpu.io.genclip import GeneratorClip
        from lives_tpu.osc.server import OSCServer
        from lives_tpu.player import NullSink, Player
        p = Player(sink=NullSink())
        p.state.fg_clip = GeneratorClip("plasma", 192, 128)
        p.state.bg_clip = GeneratorClip("colour_bars", 192, 128)
        srv = OSCServer(p, port=0)
        srv.start()
        p.state.playing = True
        port = srv.port
        owned = (p, srv)

        def pump(k):
            for _ in range(k):
                p.process_one()

    cli = OSCClient(host, port, timeout)
    try:
        names = str(cli.query1("/effects/list") or "").split()
        if match:
            names = [n for n in names if match in n]
        if limit:
            names = names[:int(limit)]
        failures: dict[str, list[str]] = {}
        for j, name in enumerate(names):
            errs = test_filter(cli, name, key, pump, frames)
            if errs:
                failures[name] = errs
                for e in errs:
                    log(f"FAIL {e}")
            else:
                log(f"ok   [{j + 1}/{len(names)}] {name}")
        return names, failures
    finally:
        cli.close()
        if owned:
            owned[0].stop()
            owned[1].stop()


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--match", help="only filters containing SUBSTR")
    ap.add_argument("--limit", type=int, help="stop after N filters")
    ap.add_argument("--key", type=int, default=1)
    ap.add_argument("--frames", type=int, default=2,
                    help="frames rendered per filter (self-host only)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=None,
                    help="attach to a running instance instead of "
                         "self-hosting")
    ap.add_argument("--timeout", type=float, default=10.0)
    a = ap.parse_args()
    try:
        names, failures = run_rte_test(
            a.port, a.host, a.match, a.limit, a.key, a.frames, a.timeout)
    except (RuntimeError, socket.timeout, OSError) as e:
        print(f"engine not responding: {e}", file=sys.stderr)
        return 2
    nerr = sum(len(v) for v in failures.values())
    print(f"rte_test: {len(names)} filters, "
          f"{len(failures)} failing, {nerr} errors")
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
