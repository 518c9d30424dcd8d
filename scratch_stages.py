"""Scratch: per-stage ablation for any hfN/rx888 bench config on the TPU.

    python scratch_stages.py hf32000 [stages...]

Stages: master, chan (tiled channelize+tune), noise (gather+estimate),
demod (channelize+tune+linear_demod), full (Engine.step). Same
scan+checksum+d2h discipline as profile_stages.py.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_engine
from ka9q_radio_tpu.ops.filterbank import master_fft, fine_tune
from ka9q_radio_tpu.models.linear import linear_demod

cfg_name = sys.argv[1] if len(sys.argv) > 1 else "hf32000"
eng, FS, baseline = build_engine(cfg_name)
m = eng.master
g = eng.groups["hf"]
params = eng.init_params()

K, R = 4, 16


@jax.jit
def _mkblocks():
    key = jax.random.PRNGKey(0)
    shape = (K, eng.L) if eng.n_inputs == 1 else (K, eng.n_inputs, eng.L)
    return jax.random.normal(key, shape, jnp.float32) * 1e-3


def chan_bb(st, F, params):
    p = params["hf"]
    bb = g._channelize(p, F)
    bb, acc = fine_tune(bb, st["acc"], p["inc_q32"], p["adj_q32"])
    return bb, acc


def stage_master(st, blk, prms):
    mst, F = master_fft(m, st["m"], blk)
    return {**st, "m": mst}, jnp.sum(jnp.abs(F[..., :64]))


def stage_chan(st, blk, prms):
    mst, F = master_fft(m, st["m"], blk)
    bb, acc = chan_bb(st, F, prms)
    return {**st, "m": mst, "acc": acc}, jnp.sum(bb.real)


def stage_noise(st, blk, prms):
    mst, F = master_fft(m, st["m"], blk)
    n0 = g._noise_est(prms["hf"], F)
    return {**st, "m": mst}, jnp.sum(n0)


def stage_demod(st, blk, prms):
    mst, F = master_fft(m, st["m"], blk)
    bb, acc = chan_bb(st, F, prms)
    bbp = jnp.mean(bb.real * bb.real + bb.imag * bb.imag, axis=-1)
    dst, audio, info = linear_demod(
        st["d"], bb, bbp, st["n0"], prms["hf"]["demod"],
        samprate=g.spec.samprate, blocktime=g.blocktime)
    return {**st, "m": mst, "acc": acc, "d": dst}, jnp.sum(audio)


def stage_full(st, blk, prms):
    st, out = eng.step(st, prms, blk)
    acc = jnp.float32(0)
    for name, gg in out.items():
        if not name.startswith("_"):
            acc = acc + jnp.sum(gg["audio"])
    return st, acc


STAGES = {"master": stage_master, "chan": stage_chan, "noise": stage_noise,
          "demod": stage_demod, "full": stage_full}


def runner(body):
    def run(state, prms, blocks):
        def body_fn(carry, blk):
            st, acc = carry
            st, add = body(st, blk, prms)
            return (st, acc + add), None

        def rep(_, carry):
            carry, _ = jax.lax.scan(body_fn, carry, blocks)
            return carry

        st, acc = jax.lax.fori_loop(0, R, rep, (state, jnp.float32(0)))
        return st, acc

    return jax.jit(run)


def main():
    names = sys.argv[2:] or list(STAGES)
    blocks = _mkblocks()
    from ka9q_radio_tpu.models.linear import linear_init

    def mk_small():
        return {"m": eng.init_state()["master"],
                "acc": jnp.zeros((g.C,), jnp.int32),
                "d": linear_init(g.C),
                "n0": jnp.full((g.C,), 1e-12, jnp.float32)}

    init_small = jax.jit(mk_small)
    init_full = jax.jit(eng.init_state)
    for name in names:
        rn = runner(STAGES[name])
        for attempt in range(5):
            try:
                st = init_full() if name == "full" else init_small()
                jax.block_until_ready(st)

                def span():
                    t0 = time.perf_counter()
                    _st, acc = rn(st, params, blocks)
                    float(acc)
                    return time.perf_counter() - t0

                span(); span()
                dt = min(span() for _ in range(3)) / (R * K)
                print(json.dumps({"cfg": cfg_name, "stage": name,
                                  "ms_per_block": round(dt * 1e3, 3)}), flush=True)
                break
            except Exception as e:
                print(f"# {name} attempt {attempt}: {type(e).__name__}: {str(e)[:100]}", flush=True)
                time.sleep(15.0)


if __name__ == "__main__":
    main()
