"""packetd-tpu — AFSK/AX.25 packet decoder daemon (packetd.c + aprs.c).

Consumes FM-demodulated audio RTP streams, decodes Bell-202 AX.25 frames,
prints TNC2 monitor lines, and optionally decodes APRS payloads.

    packetd-tpu --data pkt-pcm.local [--status pkt.local] [--aprs]
                [--duration N]
"""
from __future__ import annotations

import argparse
import select
import sys
import time

from ..net.rtp import RtpHeader, Encoding, PayloadRegistry, decode_samples
from ..net.status import StatusType as T, PacketType, decode_status
from ..net.multicast import resolve_dest, listen_socket, DEFAULT_RTP_PORT, DEFAULT_STAT_PORT
from ..daemons.afsk import AfskDecoder
from ..daemons.ax25 import parse_frame
from ..daemons.aprs import decode_aprs, tnc2_format


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="packetd-tpu")
    ap.add_argument("--data", required=True)
    ap.add_argument("--status", default=None)
    ap.add_argument("--aprs", action="store_true", help="decode APRS payloads")
    ap.add_argument("--duration", type=float, default=None)
    args = ap.parse_args(argv)

    rx = listen_socket(resolve_dest(args.data, DEFAULT_RTP_PORT))
    srx = listen_socket(resolve_dest(args.status, DEFAULT_STAT_PORT)) if args.status else None
    registry = PayloadRegistry()
    fmt_by_ssrc: dict[int, tuple] = {}
    decoders: dict[int, AfskDecoder] = {}
    socks = [rx] + ([srx] if srx else [])
    t_end = time.monotonic() + args.duration if args.duration else None
    n_frames = 0
    try:
        while t_end is None or time.monotonic() < t_end:
            left = 0.25 if t_end is None else max(min(t_end - time.monotonic(), 0.25), 0)
            r, _, _ = select.select(socks, [], [], left)
            for s in r:
                pkt, _ = s.recvfrom(65536)
                if s is srx:
                    try:
                        ptype, f, _ = decode_status(pkt)
                        if ptype == PacketType.STATUS and T.OUTPUT_SSRC in f:
                            fmt_by_ssrc[f[T.OUTPUT_SSRC]] = (
                                int(f[T.OUTPUT_SAMPRATE]),
                                int(f.get(T.OUTPUT_CHANNELS, 1)),
                                Encoding(int(f.get(T.OUTPUT_ENCODING, Encoding.S16BE))),
                            )
                    except Exception:
                        pass
                    continue
                try:
                    hdr, payload = RtpHeader.unpack(pkt)
                except Exception:
                    continue
                fmt = fmt_by_ssrc.get(hdr.ssrc) or registry.info_from_pt(hdr.type)
                if fmt is None:
                    continue
                samprate, channels, enc = fmt
                dec = decoders.get(hdr.ssrc)
                if dec is None:
                    dec = decoders[hdr.ssrc] = AfskDecoder(samprate)
                audio = decode_samples(payload, enc)
                if channels == 2:
                    audio = audio[0::2]
                for frame in dec.feed(audio):
                    ax = parse_frame(frame)
                    if ax is None:
                        continue
                    n_frames += 1
                    print(f"[{hdr.ssrc}] {tnc2_format(ax)}", flush=True)
                    if args.aprs:
                        rep = decode_aprs(ax.info)
                        if rep.kind == "position":
                            print(f"  APRS pos {rep.lat:.4f},{rep.lon:.4f} sym={rep.symbol} {rep.comment}", flush=True)
                        elif rep.kind != "other":
                            print(f"  APRS {rep.kind}: {rep.text}", flush=True)
    except KeyboardInterrupt:
        pass
    print(f"{n_frames} frames decoded", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
