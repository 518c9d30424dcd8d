"""cwd-tpu — CW (Morse) audio generator daemon (cwd.c + morse.c).

Renders text to keyed CW and streams it as RTP (for repeater IDs etc).

    cwd-tpu --data id.local --ssrc 1 --wpm 20 --tone 600 "DE KA9Q/R"
    echo "text" | cwd-tpu --data id.local        # read lines from stdin
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from ..net.rtp import RtpHeader, Encoding, encode_samples
from ..net.multicast import resolve_dest, output_socket, DEFAULT_RTP_PORT
from ..daemons.morse import morse_audio


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="cwd-tpu")
    ap.add_argument("text", nargs="*")
    ap.add_argument("--data", required=True)
    ap.add_argument("--ssrc", type=int, default=1)
    ap.add_argument("--samprate", type=int, default=48_000)
    ap.add_argument("--wpm", type=float, default=20.0)
    ap.add_argument("--tone", type=float, default=600.0)
    ap.add_argument("--level", type=float, default=-15.0, help="dBFS")
    ap.add_argument("--pt", type=int, default=122)
    ap.add_argument("--flat-out", action="store_true")
    args = ap.parse_args(argv)

    tx = output_socket(resolve_dest(args.data, DEFAULT_RTP_PORT))
    fs = args.samprate
    seq = ts = 0

    def send_text(text: str):
        nonlocal seq, ts
        audio = morse_audio(text, fs, args.wpm, args.tone, 10 ** (args.level / 20.0))
        frames = fs // 50  # 20 ms packets
        t0 = time.monotonic()
        sent = 0
        for off in range(0, audio.size, frames):
            chunk = audio[off : off + frames]
            hdr = RtpHeader(type=args.pt, seq=seq, timestamp=ts, ssrc=args.ssrc, marker=off == 0)
            tx.send(hdr.pack() + encode_samples(chunk, Encoding.S16BE))
            seq = (seq + 1) & 0xFFFF
            ts = (ts + chunk.size) & 0xFFFFFFFF
            sent += chunk.size
            if not args.flat_out:
                dt = t0 + sent / fs - time.monotonic()
                if dt > 0:
                    time.sleep(dt)

    if args.text:
        send_text(" ".join(args.text))
    else:
        for line in sys.stdin:
            send_text(line.strip())
    return 0


if __name__ == "__main__":
    sys.exit(main())
