"""pcmsend-tpu — stream raw samples from a file/stdin as RTP (pcmsend.c).

Feeds the TPU radiod's `rtp` front end, or any stock ka9q consumer:

    pcmsend-tpu --data feed.local --samprate 1m024 --format cs16le \
                --ssrc 1 capture.iq
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from ..net.rtp import RtpHeader, Encoding, encode_samples
from ..net.multicast import resolve_dest, output_socket, DEFAULT_RTP_PORT
from ..utils.parse import parse_frequency

_WIDTH = {"f32le": 1, "s16le": 1, "s16be": 1, "cf32le": 2, "cs16le": 2}
_DTYPE = {"f32le": "<f4", "s16le": "<i2", "s16be": ">i2", "cf32le": "<f4", "cs16le": "<i2"}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="pcmsend-tpu")
    ap.add_argument("file", nargs="?", default="-")
    ap.add_argument("--data", required=True)
    ap.add_argument("--samprate", required=True)
    ap.add_argument("--format", default="cs16le", choices=sorted(_WIDTH))
    ap.add_argument("--ssrc", type=int, default=1)
    ap.add_argument("--pt", type=int, default=97)
    ap.add_argument("--flat-out", action="store_true", help="no wall-clock pacing")
    ap.add_argument("--encoding", default="s16be", help="wire encoding (s16be/f32be/...)")
    args = ap.parse_args(argv)

    fs = parse_frequency(args.samprate)
    width = _WIDTH[args.format]
    dtype = np.dtype(_DTYPE[args.format])
    wire_enc = Encoding[args.encoding.upper()]
    tx = output_socket(resolve_dest(args.data, DEFAULT_RTP_PORT))
    fh = sys.stdin.buffer if args.file == "-" else open(args.file, "rb")

    frames_per_pkt = max(1400 // (width * 2), 1)  # s16 wire frames per packet
    seq = ts = 0
    t0 = time.monotonic()
    sent = 0
    try:
        while True:
            raw = fh.read(frames_per_pkt * width * dtype.itemsize)
            if not raw:
                break
            x = np.frombuffer(raw, dtype).astype(np.float32)
            if dtype.kind == "i":
                x /= 32767.0
            nframes = x.size // width
            hdr = RtpHeader(type=args.pt, seq=seq, timestamp=ts, ssrc=args.ssrc)
            tx.send(hdr.pack() + encode_samples(x, wire_enc))
            seq = (seq + 1) & 0xFFFF
            ts = (ts + nframes) & 0xFFFFFFFF
            sent += nframes
            if not args.flat_out:
                target = t0 + sent / fs
                dt = target - time.monotonic()
                if dt > 0:
                    time.sleep(dt)
    except (KeyboardInterrupt, BrokenPipeError):
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
