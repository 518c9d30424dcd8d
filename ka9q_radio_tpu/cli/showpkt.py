"""show-pkt-tpu — live RTP stream statistics (reference show-pkt.c).

    show-pkt-tpu --data test-pcm.local [--interval 1] [--duration N]
"""
from __future__ import annotations

import argparse
import select
import sys
import time

from ..net.rtp import RtpHeader, RtpState, PayloadRegistry
from ..net.multicast import resolve_dest, listen_socket, DEFAULT_RTP_PORT


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="show-pkt-tpu")
    ap.add_argument("--data", required=True)
    ap.add_argument("--interval", type=float, default=1.0)
    ap.add_argument("--duration", type=float, default=None)
    args = ap.parse_args(argv)

    rx = listen_socket(resolve_dest(args.data, DEFAULT_RTP_PORT))
    registry = PayloadRegistry()
    stats: dict[int, RtpState] = {}
    octets: dict[int, int] = {}
    t_end = time.monotonic() + args.duration if args.duration else None
    t_rep = time.monotonic() + args.interval
    try:
        while t_end is None or time.monotonic() < t_end:
            r, _, _ = select.select([rx], [], [], 0.2)
            if r:
                pkt, _ = rx.recvfrom(65536)
                try:
                    h, payload = RtpHeader.unpack(pkt)
                except Exception:
                    continue
                st = stats.setdefault(h.ssrc, RtpState())
                info = registry.info_from_pt(h.type)
                frames = len(payload) // 2 if info is None else len(payload) // (2 * info[1])
                st.process(h, frames)
                st.bytes += len(payload)
                octets[h.ssrc] = octets.get(h.ssrc, 0) + len(payload)
            if time.monotonic() >= t_rep:
                t_rep += args.interval
                for ssrc, st in sorted(stats.items()):
                    print(f"ssrc {ssrc:>10}: pkts {st.packets:>8} drops {st.drops:>5} "
                          f"dupes {st.dupes:>4} bytes {st.bytes:>10}", flush=True)
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
