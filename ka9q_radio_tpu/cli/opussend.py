"""opussend-tpu — Opus-encode a PCM file/stdin to RTP (opussend.c).

    opussend-tpu audio.s16 --data opus.local --samprate 48k [--bitrate 32000]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from ..net.rtp import RtpHeader, Encoding, PayloadRegistry
from ..net.multicast import resolve_dest, output_socket, DEFAULT_RTP_PORT
from ..utils.parse import parse_frequency


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="opussend-tpu")
    ap.add_argument("file", nargs="?", default="-")
    ap.add_argument("--data", required=True)
    ap.add_argument("--samprate", default="48k")
    ap.add_argument("--channels", type=int, default=1)
    ap.add_argument("--bitrate", type=int, default=32_000)
    ap.add_argument("--ssrc", type=int, default=1)
    ap.add_argument("--flat-out", action="store_true")
    args = ap.parse_args(argv)

    from ..net.opus import OpusEncoder, available

    if not available():
        print("libopus not available", file=sys.stderr)
        return 1
    fs = int(parse_frequency(args.samprate))
    if fs not in (8000, 12000, 16000, 24000, 48000):
        print(f"unsupported opus rate {fs}", file=sys.stderr)
        return 1
    enc = OpusEncoder(fs, 2, bitrate=args.bitrate)
    registry = PayloadRegistry()
    pt = registry.pt_from_info(48_000, 2, Encoding.OPUS)
    tx = output_socket(resolve_dest(args.data, DEFAULT_RTP_PORT))
    fh = sys.stdin.buffer if args.file == "-" else open(args.file, "rb")

    frame = fs // 50  # 20 ms
    seq = ts = 0
    sent = 0
    t0 = time.monotonic()
    while True:
        raw = fh.read(frame * args.channels * 2)
        if len(raw) < frame * args.channels * 2:
            break
        pcm = np.frombuffer(raw, "<i2").astype(np.float32).reshape(-1, args.channels) / 32767.0
        stereo = np.repeat(pcm, 2, axis=1) if args.channels == 1 else pcm[:, :2]
        data = enc.encode(stereo)
        tx.send(RtpHeader(type=pt, seq=seq, timestamp=ts, ssrc=args.ssrc).pack() + data)
        seq = (seq + 1) & 0xFFFF
        ts = (ts + frame * 48_000 // fs) & 0xFFFFFFFF
        sent += frame
        if not args.flat_out:
            dt = t0 + sent / fs - time.monotonic()
            if dt > 0:
                time.sleep(dt)
    return 0


if __name__ == "__main__":
    sys.exit(main())
