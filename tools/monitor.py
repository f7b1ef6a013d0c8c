#!/usr/bin/env python
"""Notify-socket monitor (reference tools/monitorlives.pl): subscribes to a
running instance's notify socket and prints decoded events.

Usage: python tools/monitor.py --osc-port 49999 [--seconds 30]
"""

import argparse
import os
import socket
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lives_tpu.osc import build_message  # noqa: E402
from lives_tpu.osc.server import NOTIFY  # noqa: E402

NAMES = {v: k for k, v in vars(NOTIFY).items() if isinstance(v, int)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--osc-port", type=int, default=49999)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--seconds", type=float, default=None)
    args = ap.parse_args()

    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("0.0.0.0", 0))
    rx.settimeout(1.0)
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    tx.sendto(build_message("/lives/open_notify_socket",
                            rx.getsockname()[1]),
              (args.host, args.osc_port))
    print(f"listening for notifications from {args.host}:{args.osc_port}")
    import time
    t_end = time.time() + args.seconds if args.seconds else None
    try:
        while t_end is None or time.time() < t_end:
            try:
                data, _ = rx.recvfrom(4096)
            except socket.timeout:
                continue
            msg = data.decode(errors="replace").rstrip("\n\x00")
            num, _, rest = msg.partition("|")
            name = NAMES.get(int(num), num) if num.isdigit() else num
            print(f"{name}: {rest}")
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
