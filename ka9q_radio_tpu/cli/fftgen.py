"""fft-gen-tpu — compilation-cache warmer (fft-gen.c / fftwf-wisdom).

The reference pre-plans its giant FFTs offline into FFTW wisdom; the TPU
analog is the persistent XLA compilation cache. This tool compiles a
config's full engine step (and init) ahead of time so a production
radiod-tpu start is instant.

    fft-gen-tpu radiod.conf [--wisdom /var/lib/ka9q-radio-tpu/xla]
"""
from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="fft-gen-tpu")
    ap.add_argument("config")
    ap.add_argument("--wisdom", default="/tmp/ka9q_radio_tpu_xla_cache")
    args = ap.parse_args(argv)

    import jax
    from ..config import load_config
    from ..runtime.radiod import Radiod

    cfg = load_config(args.config)
    # warm through the SAME construction path as production (matmul/mesh/
    # spurs/prealloc all change the compiled program — an Engine built
    # with different options would miss the cache at radiod start)
    cfg.options["wisdom"] = args.wisdom
    t0 = time.monotonic()
    rd = Radiod(cfg, use_network=False)
    # Radiod sets a 0.5 s persistence floor; a warmer wants EVERY program
    # written, so lower it after construction, before the compiling step
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    rd.step_block()
    eng = rd.engine
    print(f"compiled master N={eng.master.N} + {sum(g.C for g in eng.groups.values())} "
          f"channels in {time.monotonic() - t0:.1f}s; cache at {args.wisdom}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
