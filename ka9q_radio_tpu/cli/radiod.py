"""radiod-tpu — the daemon CLI (reference main.c).

    radiod-tpu [-v] [--blocks N] [--flat-out] config.conf
"""
from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="radiod-tpu", description="TPU-native multichannel SDR daemon")
    ap.add_argument("config")
    ap.add_argument("-v", "--verbose", action="count", default=0)
    ap.add_argument("--blocks", type=int, default=None, help="exit after N blocks (default: run forever)")
    ap.add_argument("--flat-out", action="store_true", help="don't pace to wall clock (benchmarking)")
    ap.add_argument("--no-network", action="store_true", help="don't open sockets (dry run)")
    args = ap.parse_args(argv)

    from ..config import load_config
    from ..runtime.radiod import Radiod

    cfg = load_config(args.config)
    rd = Radiod(cfg, use_network=not args.no_network)
    if args.verbose:
        print(f"master: L={rd.engine.L} N={rd.engine.master.N} "
              f"fs={rd.engine.samprate:.0f} {'real' if rd.engine.master.real else 'complex'}",
              file=sys.stderr)
        for ssrc, ch in rd.chans.items():
            print(f"  ssrc {ssrc}: {ch.group}[{ch.idx}] {ch.freq:.0f} Hz "
                  f"{ch.samprate} Hz out pt={ch.pt}", file=sys.stderr)
    t0 = time.monotonic()
    try:
        if args.verbose:
            # periodic stats like the reference's 10 s verbose loop
            remaining = args.blocks
            while remaining is None or remaining > 0:
                n = 500 if remaining is None else min(500, remaining)
                rd.run(nblocks=n, realtime=not args.flat_out)
                if remaining is not None:
                    remaining -= n
                print(rd.stats_line(), file=sys.stderr)
        else:
            rd.run(nblocks=args.blocks, realtime=not args.flat_out)
    except KeyboardInterrupt:
        pass
    if args.verbose:
        dt = time.monotonic() - t0
        print(f"{rd.blocks} blocks in {dt:.2f}s "
              f"({rd.blocks * rd.engine.L / max(dt, 1e-9) / 1e6:.1f} Msps)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
