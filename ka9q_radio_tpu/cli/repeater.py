"""repeater-tpu — FM repeater controller (monitor-repeater.c).

Votes the best receiver (by status SNR), relays its audio to the output
RTP group while "PTT" is active, holds a hang time after input drops, and
keys a Morse ID at the required interval.

    repeater-tpu --input rx-pcm.local --status rx.local --output tx-pcm.local
                 --id "DE KA9Q/R" [--hang 2] [--id-interval 600]
"""
from __future__ import annotations

import argparse
import select
import sys
import time

import numpy as np

from ..net.rtp import RtpHeader, Encoding, PayloadRegistry, decode_samples, encode_samples
from ..net.status import StatusType as T, PacketType, decode_status
from ..net.multicast import resolve_dest, output_socket, listen_socket, DEFAULT_RTP_PORT, DEFAULT_STAT_PORT
from ..daemons.morse import morse_audio


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="repeater-tpu")
    ap.add_argument("--input", required=True)
    ap.add_argument("--status", default=None)
    ap.add_argument("--output", required=True)
    ap.add_argument("--id", dest="ident", default=None, help="Morse ID text")
    ap.add_argument("--id-interval", type=float, default=600.0)
    ap.add_argument("--id-wpm", type=float, default=20.0)
    ap.add_argument("--hang", type=float, default=2.0, help="tail seconds")
    ap.add_argument("--samprate", type=int, default=24_000)
    ap.add_argument("--ssrc", type=int, default=7777, help="output stream SSRC")
    ap.add_argument("--duration", type=float, default=None)
    args = ap.parse_args(argv)

    rx = listen_socket(resolve_dest(args.input, DEFAULT_RTP_PORT))
    srx = listen_socket(resolve_dest(args.status, DEFAULT_STAT_PORT)) if args.status else None
    tx = output_socket(resolve_dest(args.output, DEFAULT_RTP_PORT))
    registry = PayloadRegistry()
    pt = registry.pt_from_info(args.samprate, 1, Encoding.S16BE)

    snr: dict[int, float] = {}
    seq = ts = 0
    ptt_until = 0.0
    last_id = 0.0
    id_due = False
    t_end = time.monotonic() + args.duration if args.duration else None
    socks = [rx] + ([srx] if srx else [])

    def send_audio(audio: np.ndarray, marker=False):
        nonlocal seq, ts
        for off in range(0, audio.size, 700):
            chunk = audio[off : off + 700]
            tx.send(RtpHeader(type=pt, seq=seq, timestamp=ts, ssrc=args.ssrc,
                              marker=marker and off == 0).pack()
                    + encode_samples(chunk, Encoding.S16BE))
            seq = (seq + 1) & 0xFFFF
            ts = (ts + chunk.size) & 0xFFFFFFFF

    def send_id():
        nonlocal last_id
        audio = morse_audio(args.ident, args.samprate, args.id_wpm, 800.0, 0.3)
        send_audio(audio, marker=True)
        last_id = time.monotonic()
        print("ID sent", file=sys.stderr)

    try:
        while t_end is None or time.monotonic() < t_end:
            now = time.monotonic()
            if args.ident:
                if now - last_id >= args.id_interval and (id_due or last_id == 0.0):
                    send_id()
                    id_due = False
            r, _, _ = select.select(socks, [], [], 0.1)
            for s in r:
                pkt, _ = s.recvfrom(65536)
                if s is srx:
                    try:
                        ptype, f, _ = decode_status(pkt)
                        if ptype == PacketType.STATUS and T.OUTPUT_SSRC in f:
                            v = f.get(T.FM_SNR, f.get(T.PLL_SNR))
                            if v is not None:
                                snr[f[T.OUTPUT_SSRC]] = float(v)
                    except Exception:
                        pass
                    continue
                try:
                    h, payload = RtpHeader.unpack(pkt)
                except Exception:
                    continue
                if snr and h.ssrc != max(snr, key=snr.get):
                    continue  # voting: relay only the best receiver
                fmt = registry.info_from_pt(h.type)
                if fmt is None:
                    continue
                audio = decode_samples(payload, fmt[2])
                if fmt[1] == 2:
                    audio = audio[0::2]
                send_audio(audio, marker=now >= ptt_until)
                ptt_until = now + args.hang
                id_due = True  # ID after next interval once we've transmitted
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
