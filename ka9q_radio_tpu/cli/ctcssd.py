"""ctcssd-tpu — standalone CTCSS/PL tone decoder daemon (ctcss.c).

Scans FM-demodulated audio RTP streams with a Goertzel bank over the 55
standard PL tones and reports detections per SSRC.

    ctcssd-tpu --data rpt-pcm.local [--duration N] [--min-snr 3]
"""
from __future__ import annotations

import argparse
import select
import sys
import time

from ..net.rtp import RtpHeader, Encoding, PayloadRegistry, decode_samples
from ..net.multicast import resolve_dest, listen_socket, DEFAULT_RTP_PORT
from ..daemons.ctcss import GoertzelBank


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="ctcssd-tpu")
    ap.add_argument("--data", required=True)
    ap.add_argument("--duration", type=float, default=None)
    ap.add_argument("--min-snr", type=float, default=12.0)
    args = ap.parse_args(argv)

    rx = listen_socket(resolve_dest(args.data, DEFAULT_RTP_PORT))
    registry = PayloadRegistry()
    banks: dict[int, GoertzelBank] = {}
    t_end = time.monotonic() + args.duration if args.duration else None
    try:
        while t_end is None or time.monotonic() < t_end:
            left = 0.25 if t_end is None else max(min(t_end - time.monotonic(), 0.25), 0)
            r, _, _ = select.select([rx], [], [], left)
            if not r:
                continue
            pkt, _ = rx.recvfrom(65536)
            try:
                hdr, payload = RtpHeader.unpack(pkt)
            except Exception:
                continue
            fmt = registry.info_from_pt(hdr.type)
            if fmt is None:
                fmt = (24_000, 1, Encoding.S16BE)
            samprate, channels, enc = fmt
            bank = banks.get(hdr.ssrc)
            if bank is None:
                bank = banks[hdr.ssrc] = GoertzelBank(samprate)
            audio = decode_samples(payload, enc)
            if channels == 2:
                audio = audio[0::2]
            result = bank.feed(audio)
            if result is not None:
                tone, snr = result
                if snr >= args.min_snr:
                    print(f"[{hdr.ssrc}] PL {tone:.1f} Hz ({snr:.1f} dB)", flush=True)
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
