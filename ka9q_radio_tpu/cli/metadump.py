"""metadump-tpu — TLV status/command packet tracer (reference metadump.c).

    metadump-tpu --radio test.local [--count N]
"""
from __future__ import annotations

import argparse
import datetime
import select
import sys

from ..net.status import StatusType as T, encode_status, decode_status, dump_text
from ..net.multicast import resolve_dest, listen_socket, output_socket, DEFAULT_STAT_PORT


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="metadump-tpu")
    ap.add_argument("--radio", required=True)
    ap.add_argument("--count", type=int, default=None, help="exit after N packets")
    ap.add_argument("--ssrc", type=int, default=None, help="trace only this SSRC")
    ap.add_argument("--all", action="store_true",
                    help="poll the all-channel dump (ssrc 0xffffffff) first")
    ap.add_argument("--timeout", type=float, default=None)
    args = ap.parse_args(argv)

    dest = resolve_dest(args.radio, DEFAULT_STAT_PORT)
    rx = listen_socket(dest)
    if args.all:
        import random
        tx = output_socket(dest)
        tx.send(encode_status({T.OUTPUT_SSRC: 0xFFFFFFFF,
                               T.COMMAND_TAG: random.getrandbits(31)}, cmd=True))
    n = 0
    while args.count is None or n < args.count:
        r, _, _ = select.select([rx], [], [], args.timeout)
        if not r:
            break
        pkt, addr = rx.recvfrom(65536)
        if args.ssrc is not None:
            try:
                _, f, _ = decode_status(pkt)
            except Exception:
                continue
            if f.get(T.OUTPUT_SSRC) != args.ssrc:
                continue
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
