"""Scratch: noise-estimator variant shootout on the real TPU (flagship geom).

Variants per block (same scan+checksum+d2h discipline as profile_stages):
  base      master + current gather_noise_bins (full-master |F|^2) + 31-step x2
  cgather   master + complex tile gather, square AFTER gather (no master pass)
  trunc     master + current gather + 16-step bisection on keys>>15
  cg_trunc  both
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
from ka9q_radio_tpu.ops.filterbank import master_fft
from ka9q_radio_tpu.ops.noise import (
    gather_noise_bins, estimate_noise, NQ, N_CUTOFF, noise_correction, _TILE,
)

eng, FS, baseline = build_engine("rx888")
m = eng.master
hf = eng.groups["hf"]
params = eng.init_params()

K, R = 8, 32


@jax.jit
def _mkblocks():
    key = jax.random.PRNGKey(0)
    return jax.random.normal(key, (K, eng.L), jnp.float32) * 1e-3


def gather_noise_complex(F, shifts, nbins):
    """Tile-row gather of COMPLEX master bins, squared after the gather."""
    T = _TILE
    m_bins = m.N // 2 + 1
    ntiles = -(-nbins // T)
    pad = (-m_bins) % T
    rows = jnp.pad(F, (0, pad)).reshape(-1, T)
    lo = jnp.abs(shifts) - (ntiles * T) // 2
    lo_t = jnp.clip(lo, 0, m_bins - ntiles * T) // T
    tidx = lo_t[:, None] + jnp.arange(ntiles, dtype=jnp.int32)[None, :]
    v = rows[tidx].reshape(shifts.shape[0], ntiles * T)
    return (v.real * v.real + v.imag * v.imag).astype(jnp.float32)


def estimate_noise_trunc(energies, master_bins, samprate, steps=16, shift=15):
    nbins = energies.shape[-1]
    pos = NQ * (nbins - 1)
    i = int(np.floor(pos))
    frac = pos - i
    keys = jax.lax.bitcast_convert_type(energies, jnp.int32) >> shift

    def kth_smallest(kk):
        def step(c, _):
            lo, hi = c
            mid = lo + ((hi - lo) >> 1)
            cnt = jnp.sum((keys <= mid[..., None]).astype(jnp.int32), axis=-1)
            take_lo = cnt >= (kk + 1)
            return (jnp.where(take_lo, lo, mid + 1), jnp.where(take_lo, mid, hi)), None

        lo0 = jnp.zeros(keys.shape[:-1], jnp.int32)
        hi0 = jnp.full(keys.shape[:-1], np.int32((2**31 - 1) >> shift))
        (lo, _), _ = jax.lax.scan(step, (lo0, hi0), None, length=steps)
        return jax.lax.bitcast_convert_type(lo << shift, jnp.float32)

    q = kth_smallest(i) * (1.0 - frac) + kth_smallest(min(i + 1, nbins - 1)) * frac
    thresh = N_CUTOFF * q
    mask = energies <= thresh[..., None]
    count = jnp.maximum(jnp.sum(mask, axis=-1), 1)
    mean = jnp.sum(jnp.where(mask, energies, 0.0), axis=-1) / count
    return (mean * noise_correction() / (float(master_bins) * float(samprate))).astype(jnp.float32)


def stage_base(st, params, blk):
    mst, F = master_fft(m, st, blk)
    p = params["hf"]
    e = gather_noise_bins(F, p["shifts"], hf.noise_bins, m.real, m.N)
    return mst, jnp.sum(estimate_noise(e, m.bins, hf.fs_in))


def stage_cgather(st, params, blk):
    mst, F = master_fft(m, st, blk)
    p = params["hf"]
    e = gather_noise_complex(F, p["shifts"], hf.noise_bins)
    return mst, jnp.sum(estimate_noise(e, m.bins, hf.fs_in))


def stage_trunc(st, params, blk):
    mst, F = master_fft(m, st, blk)
    p = params["hf"]
    e = gather_noise_bins(F, p["shifts"], hf.noise_bins, m.real, m.N)
    return mst, jnp.sum(estimate_noise_trunc(e, m.bins, hf.fs_in))


def stage_cg_trunc(st, params, blk):
    mst, F = master_fft(m, st, blk)
    p = params["hf"]
    e = gather_noise_complex(F, p["shifts"], hf.noise_bins)
    return mst, jnp.sum(estimate_noise_trunc(e, m.bins, hf.fs_in))


def stage_master(st, params, blk):
    mst, F = master_fft(m, st, blk)
    return mst, jnp.sum(jnp.abs(F[:64]))


STAGES = {
    "master": stage_master,
    "base": stage_base,
    "cgather": stage_cgather,
    "trunc": stage_trunc,
    "cg_trunc": stage_cg_trunc,
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
    init = jax.jit(lambda: eng.init_state()["master"])
    init_cad = jax.jit(lambda: {"m": eng.init_state()["master"], "n0": jnp.zeros((1000,), jnp.float32)})
    for name in names:
        runner = scan_runner(STAGES[name])
        for attempt in range(6):
            try:
                st = init_cad() if name == "cadence4" else init()
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


def stage_gather_only(st, params, blk):
    mst, F = master_fft(m, st, blk)
    p = params["hf"]
    e = gather_noise_bins(F, p["shifts"], hf.noise_bins, m.real, m.N)
    return mst, jnp.sum(e[:, ::64])


def stage_est_only(st, params, blk):
    mst, F = master_fft(m, st, blk)
    # fixed energies derived without a gather: first 1024 bins broadcast
    e = jnp.broadcast_to((F[:1024].real**2 + F[:1024].imag**2)[None, :], (1000, 1024))
    return mst, jnp.sum(estimate_noise(e, m.bins, hf.fs_in))


def stage_cadence4(st, params, blk):
    mst, F = master_fft(m, st["m"], blk)
    p = params["hf"]

    def do(F):
        e = gather_noise_bins(F, p["shifts"], hf.noise_bins, m.real, m.N)
        return estimate_noise(e, m.bins, hf.fs_in)

    n0 = jax.lax.cond(mst["jobnum"] % 4 == 0, do, lambda F: st["n0"], F)
    return {"m": mst, "n0": n0}, jnp.sum(n0)


STAGES["gather_only"] = stage_gather_only
STAGES["est_only"] = stage_est_only


def _cad_runner():
    runner = scan_runner(stage_cadence4)
    return runner


STAGES["cadence4"] = stage_cadence4


if __name__ == "__main__":
    main()
