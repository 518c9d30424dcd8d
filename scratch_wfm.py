"""Scratch: WFM stage ablation on the real TPU (bench config `wfm`).

Stages (scan+checksum+d2h discipline of profile_stages):
  master   N=192,000 complex master transform alone
  chan     master + channelize (per-element gather, 8 x 9600 bins) + tune
  disc     chan + discriminator (arctan2 + wrap)
  comp     disc + composite rfft (8 x 30720)
  slaves   comp + mono irfft + 3 complex slave ifft batch
  full     the complete Engine.step
Not part of the suite; perf scratch only.
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
from ka9q_radio_tpu.models.wfm import _slave_fd

eng, FS, baseline = build_engine("wfm")
m = eng.master
g = eng.groups["wfm"]
geo = g.wfm_geo
resp = g.wfm_responses
params = eng.init_params()

K, R = 8, 32


@jax.jit
def _mkblocks():
    key = jax.random.PRNGKey(0)
    n = jax.random.normal(key, (K, eng.L, 2), jnp.float32) * 1e-3
    return (n[..., 0] + 1j * n[..., 1]).astype(jnp.complex64)


def chan_bb(st, params, F):
    p = params["wfm"]
    bb = g._channelize(p, F)
    bb, acc = fine_tune(bb, st["acc"], p["inc_q32"], p["adj_q32"])
    return bb, acc


def stage_master(st, params, blk):
    mst, F = master_fft(m, st["m"], blk)
    return {"m": mst, "acc": st["acc"]}, jnp.sum(jnp.abs(F[:64]))


def stage_chan(st, params, blk):
    mst, F = master_fft(m, st["m"], blk)
    bb, acc = chan_bb(st, params, F)
    return {"m": mst, "acc": acc}, jnp.sum(bb.real)


def stage_disc(st, params, blk):
    mst, F = master_fft(m, st["m"], blk)
    bb, acc = chan_bb(st, params, F)
    ph = jnp.arctan2(bb.imag, bb.real) * np.float32(1.0 / np.pi)
    x = ph - jnp.roll(ph, 1, axis=1)
    x = jnp.where(x > 1.0, x - 2.0, jnp.where(x < -1.0, x + 2.0, x))
    return {"m": mst, "acc": acc}, jnp.sum(x)


def stage_comp(st, params, blk):
    mst, F = master_fft(m, st["m"], blk)
    bb, acc = chan_bb(st, params, F)
    ph = jnp.arctan2(bb.imag, bb.real) * np.float32(1.0 / np.pi)
    x = ph - jnp.roll(ph, 1, axis=1)
    x = jnp.where(x > 1.0, x - 2.0, jnp.where(x < -1.0, x + 2.0, x))
    comp = jnp.concatenate([jnp.zeros((x.shape[0], geo.Mc - 1), jnp.float32), x], axis=1)
    Fc = jnp.fft.rfft(comp, axis=-1).astype(jnp.complex64)
    return {"m": mst, "acc": acc}, jnp.sum(jnp.abs(Fc[:, :64]))


def stage_slaves(st, params, blk):
    mst, F = master_fft(m, st["m"], blk)
    bb, acc = chan_bb(st, params, F)
    ph = jnp.arctan2(bb.imag, bb.real) * np.float32(1.0 / np.pi)
    x = ph - jnp.roll(ph, 1, axis=1)
    x = jnp.where(x > 1.0, x - 2.0, jnp.where(x < -1.0, x + 2.0, x))
    comp = jnp.concatenate([jnp.zeros((x.shape[0], geo.Mc - 1), jnp.float32), x], axis=1)
    Fc = jnp.fft.rfft(comp, axis=-1).astype(jnp.complex64)
    nb, aL = geo.nb, geo.audio_L
    hm = Fc[:, : nb // 2 + 1] * jnp.asarray(resp["mono"])[None, :]
    mono = jnp.fft.irfft(hm, n=nb, axis=-1)[:, nb - aL :]
    fds = jnp.stack([
        _slave_fd(Fc, jnp.asarray(resp["pilot"]), geo.pilot_shift, nb, geo.Nc),
        _slave_fd(Fc, jnp.asarray(resp["lminusr"]), geo.subc_shift, nb, geo.Nc),
        _slave_fd(Fc, jnp.asarray(resp["rds"]), geo.rds_shift, nb, geo.Nc),
    ])
    sl = jnp.fft.ifft(fds, axis=-1)[..., nb - aL :]
    return {"m": mst, "acc": acc}, jnp.sum(mono) + jnp.sum(sl.real)


def stage_full(st, params, blk):
    s2, out = eng.step(st, params, blk)
    return s2, jnp.sum(out["wfm"]["audio"])


STAGES = {
    "master": stage_master,
    "chan": stage_chan,
    "disc": stage_disc,
    "comp": stage_comp,
    "slaves": stage_slaves,
    "full": stage_full,
}


def scan_runner(body_fn):
    def run(state, params, blocks):
        def body(carry, blk):
            st, acc = carry
            st, add = body_fn(st, params, blk)
            return (st, acc + add), None

        def rep(_, carry):
            carry, _ = jax.lax.scan(body, carry, blocks)
            return carry

        st, acc = jax.lax.fori_loop(0, R, rep, (state, jnp.float32(0)))
        return st, acc

    return jax.jit(run)


def main():
    names = sys.argv[1:] or list(STAGES)
    blocks = _mkblocks()
    init_small = jax.jit(lambda: {"m": eng.init_state()["master"],
                                  "acc": jnp.zeros((g.C,), jnp.int32)})
    init_full = jax.jit(eng.init_state)
    for name in names:
        runner = scan_runner(STAGES[name])
        for attempt in range(6):
            try:
                st = init_full() if name == "full" else init_small()
                jax.block_until_ready(st)

                def span():
                    t0 = time.perf_counter()
                    _st, acc = runner(st, params, blocks)
                    float(acc)
                    return time.perf_counter() - t0

                span(); span()
                dt = min(span() for _ in range(3)) / (R * K)
                print(json.dumps({"stage": name, "ms_per_block": round(dt * 1e3, 4)}), flush=True)
                break
            except Exception as e:
                print(f"# {name} attempt {attempt}: {type(e).__name__}: {e}", flush=True)
                time.sleep(15.0)


if __name__ == "__main__":
    main()
