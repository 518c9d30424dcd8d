"""fft-gen-tpu — compilation-cache warmer (fft-gen.c / fftwf-wisdom).

The reference pre-plans its giant FFTs offline into FFTW wisdom, with
missing-wisdom events appended to fft.log for later planning
(filter.c:95-101, fft-gen.c reads the suggestions); the TPU analog is
the persistent XLA compilation cache, with slow cold starts logged to
<wisdom>/fft.log by the daemon. This tool compiles a config's full
engine step (and init) ahead of time so a production radiod-tpu start
is instant.

    fft-gen-tpu radiod.conf [--wisdom /var/lib/ka9q-radio-tpu/xla]
    fft-gen-tpu --wisdom DIR          # warm every config in DIR/fft.log
"""
from __future__ import annotations

import argparse
import os
import sys
import time


def _warm_one(config: str, wisdom: str) -> int:
    import jax
    from ..config import load_config
    from ..runtime.radiod import Radiod

    cfg = load_config(config)
    # warm through the SAME construction path as production (matmul/mesh/
    # spurs/prealloc all change the compiled program — an Engine built
    # with different options would miss the cache at radiod start)
    cfg.options["wisdom"] = wisdom
    t0 = time.monotonic()
    # construction transfers initial params h2d; the tunnel flakes in
    # bouts — retry with backoff like bench.py's init
    for attempt in range(6):
        try:
            rd = Radiod(cfg, use_network=False)
            break
        except Exception:
            if attempt == 5:
                raise
            time.sleep(15.0)
    # Radiod sets a 0.5 s persistence floor; a warmer wants EVERY program
    # written, so lower it after construction, before the compiling step
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    for _ in range(10):  # tunnel flakes drop blocks; warm until one lands
        if rd.step_block() is not None:
            break
        time.sleep(5.0)
    eng = rd.engine
    print(f"compiled master N={eng.master.N} + {sum(g.C for g in eng.groups.values())} "
          f"channels in {time.monotonic() - t0:.1f}s; cache at {wisdom}", file=sys.stderr)
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="fft-gen-tpu")
    ap.add_argument("config", nargs="?", default=None,
                    help="radiod config to warm; omit to warm every config "
                         "recorded in <wisdom>/fft.log")
    ap.add_argument("--wisdom", default="/tmp/ka9q_radio_tpu_xla_cache")
    args = ap.parse_args(argv)

    if args.config is not None:
        return _warm_one(args.config, args.wisdom)

    log = os.path.join(args.wisdom, "fft.log")
    try:
        with open(log) as fh:
            configs = {line.rsplit("config=", 1)[1].strip()
                       for line in fh if "config=" in line}
    except OSError:
        print(f"no {log}; nothing to warm", file=sys.stderr)
        return 1
    configs.discard("<inline>")
    if not configs:
        print(f"{log} lists no config files", file=sys.stderr)
        return 1
    rc = 0
    for c in sorted(configs):
        if not os.path.exists(c):
            print(f"skipping {c} (gone)", file=sys.stderr)
            continue
        rc |= _warm_one(c, args.wisdom)
    return rc


if __name__ == "__main__":
    sys.exit(main())
