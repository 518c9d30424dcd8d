"""Scratch: multi-front-end master batching strategies on the real TPU.

rx888x8's block time (~14 ms) far exceeds 8 x the single master (3.8 ms)
plus the 8000-channel work (~1.2 ms). Suspect: the [B, N] batched MXU
cascade (swapaxes across a leading batch axis forces materialized
transposes). Variants, B=8, N=3,240,000 real:
  batched   master_transform on [B, N] (the current engine path)
  looped    B x master_transform on [N] (unrolled; program O(B))
  fullstep  the full rx888x8 Engine.step (for the overall split)
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_engine
from ka9q_radio_tpu.ops.filterbank import master_fft, master_transform

B = 8
eng, FS, baseline = build_engine(f"rx888x{B}")
m = eng.master

K, R = 4, 16


@jax.jit
def _mkblocks():
    key = jax.random.PRNGKey(0)
    return jax.random.normal(key, (K, B, eng.L), jnp.float32) * 1e-3


def stage_batched(st, blk):
    mst, F = master_fft(m, st, blk)
    return mst, jnp.sum(jnp.abs(F[:, :64]))


def stage_looped(st, blk):
    x = jnp.concatenate([st["tail"], blk], axis=-1)
    Fs = [master_transform(m, x[b]) for b in range(B)]
    mst = {"tail": x[..., m.L:], "jobnum": st["jobnum"] + 1}
    return mst, sum(jnp.sum(jnp.abs(Fb[:64])) for Fb in Fs)


def stage_fullstep(state, params, blk):
    st, out = eng.step(state, params, blk)
    acc = jnp.float32(0)
    for name, g in out.items():
        if not name.startswith("_"):
            acc = acc + jnp.sum(g["audio"])
    return st, acc


def runner(body, with_params):
    def run(state, params, blocks):
        def body_fn(carry, blk):
            st, acc = carry
            if with_params:
                st, add = body(st, params, blk)
            else:
                st, add = body(st, blk)
            return (st, acc + add), None

        def rep(_, carry):
            carry, _ = jax.lax.scan(body_fn, carry, blocks)
            return carry

        st, acc = jax.lax.fori_loop(0, R, rep, (state, jnp.float32(0)))
        return st, acc

    return jax.jit(run)


def main():
    names = sys.argv[1:] or ["batched", "looped", "fullstep"]
    blocks = _mkblocks()
    params = eng.init_params()
    init_m = jax.jit(lambda: {"tail": jnp.zeros((B, m.M - 1), jnp.float32),
                              "jobnum": jnp.zeros((), jnp.int32)})
    init_full = jax.jit(eng.init_state)
    for name in names:
        body = {"batched": stage_batched, "looped": stage_looped,
                "fullstep": stage_fullstep}[name]
        rn = runner(body, name == "fullstep")
        for attempt in range(5):
            try:
                st = init_full() if name == "fullstep" else init_m()
                jax.block_until_ready(st)

                def span():
                    t0 = time.perf_counter()
                    _st, acc = rn(st, params, blocks)
                    float(acc)
                    return time.perf_counter() - t0

                span(); span()
                dt = min(span() for _ in range(3)) / (R * K)
                print(json.dumps({"stage": name, "ms_per_block": round(dt * 1e3, 3)}), flush=True)
                break
            except Exception as e:
                print(f"# {name} attempt {attempt}: {type(e).__name__}: {str(e)[:100]}", flush=True)
                time.sleep(15.0)


if __name__ == "__main__":
    main()
