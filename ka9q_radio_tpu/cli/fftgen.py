"""fft-gen-tpu — compilation-cache warmer (fft-gen.c / fftwf-wisdom).

The reference pre-plans its giant FFTs offline into FFTW wisdom; the TPU
analog is the persistent XLA compilation cache. This tool compiles a
config's full engine step (and init) ahead of time so a production
radiod-tpu start is instant.

    fft-gen-tpu radiod.conf [--wisdom /var/lib/ka9q-radio-tpu/xla]
"""
from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="fft-gen-tpu")
    ap.add_argument("config")
    ap.add_argument("--wisdom", default="/tmp/ka9q_radio_tpu_xla_cache")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from ..config import load_config
    from ..runtime.engine import Engine

    os.makedirs(args.wisdom, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", args.wisdom)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    cfg = load_config(args.config)
    eng = Engine(samprate=cfg.samprate, real=cfg.real, groups=cfg.groups,
                 blocktime=cfg.blocktime, overlap=cfg.overlap)
    t0 = time.monotonic()
    state = jax.jit(eng.init_state)()
    params = eng.init_params()
    block = jnp.zeros((eng.L,), jnp.float32 if eng.master.real else jnp.complex64)
    step = jax.jit(eng.step, donate_argnums=0)
    state, out = step(state, params, block)
    jax.block_until_ready(out)
    print(f"compiled master N={eng.master.N} + {sum(g.C for g in eng.groups.values())} "
          f"channels in {time.monotonic() - t0:.1f}s; cache at {args.wisdom}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
