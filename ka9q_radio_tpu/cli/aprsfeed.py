"""aprsfeed-tpu — APRS-IS gateway (aprsfeed.c).

Decodes AX.25 from AFSK audio RTP (like packetd) and forwards TNC2 lines
to an APRS-IS server over TCP with the standard login handshake.

    aprsfeed-tpu --data aprs-pcm.local --callsign N0CALL --server host:14580
"""
from __future__ import annotations

import argparse
import select
import socket
import sys
import time

from ..net.rtp import RtpHeader, Encoding, PayloadRegistry, decode_samples
from ..net.multicast import resolve_dest, listen_socket, DEFAULT_RTP_PORT
from ..daemons.afsk import AfskDecoder
from ..daemons.ax25 import parse_frame
from ..daemons.aprs import tnc2_format


def aprs_passcode(callsign: str) -> int:
    """The standard APRS-IS passcode hash."""
    call = callsign.split("-")[0].upper()
    h = 0x73E2
    for i, ch in enumerate(call):
        if i % 2 == 0:
            h ^= ord(ch) << 8
        else:
            h ^= ord(ch)
    return h & 0x7FFF


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="aprsfeed-tpu")
    ap.add_argument("--data", required=True)
    ap.add_argument("--callsign", required=True)
    ap.add_argument("--server", default="rotate.aprs2.net:14580")
    ap.add_argument("--duration", type=float, default=None)
    ap.add_argument("--dry-run", action="store_true", help="print instead of send")
    args = ap.parse_args(argv)

    upstream = None
    if not args.dry_run:
        host, _, port = args.server.partition(":")
        upstream = socket.create_connection((host, int(port or 14580)), timeout=10)
        login = f"user {args.callsign} pass {aprs_passcode(args.callsign)} vers ka9q-radio-tpu 1.0\r\n"
        upstream.sendall(login.encode())

    rx = listen_socket(resolve_dest(args.data, DEFAULT_RTP_PORT))
    registry = PayloadRegistry()
    decoders: dict[int, AfskDecoder] = {}
    t_end = time.monotonic() + args.duration if args.duration else None
    n = 0
    try:
        while t_end is None or time.monotonic() < t_end:
            r, _, _ = select.select([rx], [], [], 0.2)
            if not r:
                continue
            pkt, _ = rx.recvfrom(65536)
            try:
                h, payload = RtpHeader.unpack(pkt)
            except Exception:
                continue
            fmt = registry.info_from_pt(h.type)
            if fmt is None:
                continue
            samprate, channels, enc = fmt
            dec = decoders.setdefault(h.ssrc, AfskDecoder(samprate))
            audio = decode_samples(payload, enc)
            if channels == 2:
                audio = audio[0::2]
            for frame in dec.feed(audio):
                ax = parse_frame(frame)
                if ax is None:
                    continue
                line = tnc2_format(ax) + "\r\n"
                n += 1
                if upstream is not None:
                    try:
                        upstream.sendall(line.encode("latin1"))
                    except OSError:
                        print("APRS-IS connection lost", file=sys.stderr)
                        return 1
                else:
                    print(line.strip(), flush=True)
    except KeyboardInterrupt:
        pass
    print(f"{n} packets gated", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
