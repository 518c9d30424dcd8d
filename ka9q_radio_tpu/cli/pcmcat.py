"""pcmcat-tpu — dump one RTP stream's PCM to stdout (pcmcat.c).

    pcmcat-tpu --data test-pcm.local --ssrc 200 [--duration N] > audio.s16
"""
from __future__ import annotations

import argparse
import sys

from .pcmrecord import main as _pcmrecord_main


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="pcmcat-tpu")
    ap.add_argument("--data", required=True)
    ap.add_argument("--ssrc", type=int, required=True)
    ap.add_argument("--status", default=None)
    ap.add_argument("--duration", type=float, default=None)
    args = ap.parse_args(argv)
    fwd = ["--data", args.data, "--ssrc", str(args.ssrc), "--stdout"]
    if args.status:
        fwd += ["--status", args.status]
    if args.duration:
        fwd += ["--duration", str(args.duration)]
    return _pcmrecord_main(fwd)


if __name__ == "__main__":
    sys.exit(main())
