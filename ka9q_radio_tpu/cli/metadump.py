"""metadump-tpu — TLV status/command packet tracer (reference metadump.c).

    metadump-tpu --radio test.local [--count N]
"""
from __future__ import annotations

import argparse
import datetime
import select
import sys

from ..net.status import dump_text
from ..net.multicast import resolve_dest, listen_socket, DEFAULT_STAT_PORT


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="metadump-tpu")
    ap.add_argument("--radio", required=True)
    ap.add_argument("--count", type=int, default=None, help="exit after N packets")
    ap.add_argument("--timeout", type=float, default=None)
    args = ap.parse_args(argv)

    rx = listen_socket(resolve_dest(args.radio, DEFAULT_STAT_PORT))
    n = 0
    while args.count is None or n < args.count:
        r, _, _ = select.select([rx], [], [], args.timeout)
        if not r:
            break
        pkt, addr = rx.recvfrom(65536)
        ts = datetime.datetime.now().strftime("%H:%M:%S.%f")[:-3]
        print(f"{ts} {addr[0]}:{addr[1]} {len(pkt)} bytes")
        try:
            print(dump_text(pkt))
        except Exception as e:  # keep tracing on malformed packets
            print(f"  <decode error: {e}>")
        n += 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
