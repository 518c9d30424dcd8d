"""rdsd-tpu — FM broadcast RDS decoder daemon (rdsd.c).

Consumes the radiod WFM channel's RDS-baseband RTP stream (emitted with
`rds = yes`, SSRC = station SSRC + 1, f16le mono 48 kHz) and reports
PI / PTY / PS name / RadioText.

    rdsd-tpu --data fm-pcm.local --ssrc 89501 [--duration N]
"""
from __future__ import annotations

import argparse
import select
import sys
import time

from ..net.rtp import RtpHeader, Encoding, decode_samples
from ..net.multicast import resolve_dest, listen_socket, DEFAULT_RTP_PORT
from ..daemons.rds import RdsDecoder


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="rdsd-tpu")
    ap.add_argument("--data", required=True)
    ap.add_argument("--ssrc", type=int, default=None, help="RDS stream SSRC (station+1)")
    ap.add_argument("--duration", type=float, default=None)
    ap.add_argument("--interval", type=float, default=2.0, help="report period")
    args = ap.parse_args(argv)

    rx = listen_socket(resolve_dest(args.data, DEFAULT_RTP_PORT))
    decoders: dict[int, RdsDecoder] = {}
    t_end = time.monotonic() + args.duration if args.duration else None
    t_report = time.monotonic() + args.interval
    try:
        while t_end is None or time.monotonic() < t_end:
            left = 0.25 if t_end is None else max(min(t_end - time.monotonic(), 0.25), 0)
            r, _, _ = select.select([rx], [], [], left)
            if r:
                pkt, _ = rx.recvfrom(65536)
                try:
                    hdr, payload = RtpHeader.unpack(pkt)
                except Exception:
                    continue
                if args.ssrc is not None and hdr.ssrc != args.ssrc:
                    continue
                dec = decoders.setdefault(hdr.ssrc, RdsDecoder(48_000.0))
                dec.feed(decode_samples(payload, Encoding.F16LE))
            if time.monotonic() >= t_report:
                t_report += args.interval
                for ssrc, dec in decoders.items():
                    st = dec.station
                    if st.groups:
                        print(f"[{ssrc}] PI={st.pi:04X} PTY={st.pty} PS='{st.ps_name}' "
                              f"RT='{st.radiotext}' ({st.groups} groups, "
                              f"{st.block_errors} errs)", flush=True)
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
