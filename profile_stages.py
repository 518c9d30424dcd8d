"""Stage ablation profile of the flagship rx888 config on the real TPU.

Times (per block, via the same scan+checksum+d2h-barrier discipline as
bench.py):
  master   — the 3.24M-point master transform alone
  chan     — master + hf tiled channelizer (+ fine tune)
  noise    — master + noise gather/estimate
  wide     — the wideband spectrum accumulate alone
  full     — the complete Engine.step

Measured on v5e (round 3, after the lax.cond noise cadence):
  master 0.486, chan-master ~0.09, noise-master 0.196 every-block /
  0.055 at cadence 4, full ~0.89 ms/block (= 2,911 Msps sustained).
  Rejected experiments, measured same setup (scratch_noise.py):
  complex-tile noise gather (square after gather) 0.207 vs 0.196;
  16-step truncated-key bisection saves only 0.023 (the stage is
  gather-bound, not compare-bound); round-2 rejects: fused two-order-
  stat bisection scan 0.685 vs 0.675; packed even/odd half-length rfft
  cascade 0.469 + 0.113 unpack vs 0.494 full-length (out_bins halving +
  f32 first stage already capture the real-input saving).

Prints one JSON line per stage. NOT part of the test suite; a scratch
tool for perf work (run in a background shell, tunnel is flaky/slow).
"""
from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_engine
from ka9q_radio_tpu.ops.filterbank import master_fft, tiled_channelize, fine_tune
from ka9q_radio_tpu.ops.noise import gather_noise_bins, estimate_noise

import sys as _sys

_cfg = "rx888"
if "--config" in _sys.argv:
    _cfg = _sys.argv[_sys.argv.index("--config") + 1]
eng, FS, baseline = build_engine(_cfg)
m = eng.master
hf = eng.groups["hf"]
params = eng.init_params()

K, R = 8, 32


@jax.jit
def _mkblocks():
    key = jax.random.PRNGKey(0)
    return jax.random.normal(key, (K, eng.L), jnp.float32) * 1e-3


def scan_runner(body_fn, init_fn):
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

    return jax.jit(run), jax.jit(init_fn)


def stage_master(st, params, blk):
    mst, F = master_fft(m, st, blk)
    return mst, jnp.sum(jnp.abs(F[:64]))


def stage_chan(st, params, blk):
    mst, F = master_fft(m, st["master"], blk)
    p = params["hf"]
    bb = tiled_channelize(F, p["resp_tiles"], p["tile_lo"], p["slope"], p["shifts"],
                          hf.tile_E, hf.n_bins, hf.olen, m.real, m.N)
    bb, acc = fine_tune(bb, st["acc"], p["inc_q32"], p["adj_q32"])
    return {"master": mst, "acc": acc}, jnp.sum(bb.real)


def stage_noise(st, params, blk):
    mst, F = master_fft(m, st, blk)
    p = params["hf"]
    energies = gather_noise_bins(F, p["shifts"], hf.noise_bins, m.real, m.N)
    n0 = estimate_noise(energies, m.bins, hf.fs_in)
    return mst, jnp.sum(n0)


def stage_full(st, params, blk):
    st, out = eng.step(st, params, blk)
    acc = jnp.float32(0)
    for name, g in out.items():
        if not name.startswith("_"):
            acc = acc + jnp.sum(g["audio"])
    return st, acc


def stage_demod(st, params, blk):
    """chan + the full linear demod tail (AGC/squelch/PLL) — the marginal
    per-channel cost beyond the shared master splits as (chan - master) +
    (noise - master) + (demod - chan)."""
    from ka9q_radio_tpu.models.linear import linear_demod

    mst, F = master_fft(m, st["master"], blk)
    p = params["hf"]
    bb = tiled_channelize(F, p["resp_tiles"], p["tile_lo"], p["slope"], p["shifts"],
                          hf.tile_E, hf.n_bins, hf.olen, m.real, m.N)
    bb, acc = fine_tune(bb, st["g"]["dc"]["acc_q32"], p["inc_q32"], p["adj_q32"])
    bb_power = jnp.mean(bb.real * bb.real + bb.imag * bb.imag, axis=-1)
    n0 = st["g"]["dc"]["n0"]
    ds, audio, info = linear_demod(st["g"]["demod"], bb, bb_power, n0, p["demod"],
                                   samprate=hf.spec.samprate, blocktime=eng.blocktime)
    g = dict(st["g"])
    g["demod"] = ds
    dc = dict(st["g"]["dc"])
    dc["acc_q32"] = acc
    g["dc"] = dc
    return {"master": mst, "g": g}, jnp.sum(audio)


STAGES = {
    "master": (stage_master, lambda: eng.init_state()["master"]),
    "chan": (stage_chan, lambda: {"master": eng.init_state()["master"],
                                  "acc": jnp.zeros((hf.C,), jnp.int32)}),
    "noise": (stage_noise, lambda: eng.init_state()["master"]),
    "demod": (stage_demod, lambda: {"master": eng.init_state()["master"],
                                    "g": eng.init_state()["groups"]["hf"]}),
    "full": (stage_full, eng.init_state),
}

if "sweep" in eng.groups:
    from ka9q_radio_tpu.models.spectrum import wide_accumulate

    sweep = eng.groups["sweep"]

    def stage_wide(st, params, blk):
        dst, pwr = wide_accumulate(st, blk, sweep.wide_geo)
        return dst, jnp.sum(pwr[:64])

    STAGES["wide"] = (stage_wide,
                      lambda: eng.init_state()["groups"]["sweep"]["demod"])


def mesh_stages():
    """--mesh: ablate the SHARDED engine (mesh over all local devices; a
    mesh of 1 isolates the distributed master's overhead vs the dense path
    with zero actual ICI traffic).  Stages:
      m_digit  — DigitMaster.fft (two corner turns, digit order)
      m_rowin  — fft_natural from a ROW-sharded window (all three turns,
                 the pre-digit_cols per-block path)
      m_fft    — fft_natural as the engine now runs it (digit_cols
                 column layout when the geometry allows: two turns)
      m_chan   — m_fft + hf tiled channelizer + fine tune
      m_noise  — m_fft + noise gather/estimate
      m_full   — complete sharded Engine.step
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ka9q_radio_tpu.parallel import make_mesh
    from ka9q_radio_tpu.runtime.engine import Engine as _E

    mesh = make_mesh()
    engm = _E(samprate=eng.samprate, real=eng.master.real, groups=eng.specs,
              blocktime=eng.blocktime, mesh=mesh)
    m = engm.master
    hfm = engm.groups["hf"]
    spec_in = NamedSharding(mesh, P(engm.shard_axis))
    n2 = engm.digit.n2
    colspec = NamedSharding(mesh, P(None, engm.shard_axis))

    def rowin_fft(st, blk):
        x = jnp.concatenate([st["tail"].reshape(-1), blk], axis=-1)
        xc = jax.lax.with_sharding_constraint(x, spec_in)
        F = engm.digit.fft_natural(xc)[: m.bins]
        return {"tail": x[m.L:].reshape(-1, n2), "jobnum": st["jobnum"] + 1}, F

    def nat_fft(st, blk):
        if not engm.digit_cols:
            return rowin_fft(st, blk)
        blk2 = jax.lax.with_sharding_constraint(
            blk.reshape(m.L // n2, n2), colspec)
        x = jnp.concatenate([st["tail"], blk2], axis=-2)
        xc = jax.lax.with_sharding_constraint(x, colspec)
        F = engm.digit.fft_natural(xc, cols_in=True)[: m.bins]
        return {"tail": x[m.L // n2:, :], "jobnum": st["jobnum"] + 1}, F

    def stage_m_digit(st, params, blk):
        x = jnp.concatenate([st["tail"].reshape(-1), blk], axis=-1)
        xc = jax.lax.with_sharding_constraint(x, spec_in)
        Zd = engm.digit.fft(xc if not m.real else xc.astype(jnp.complex64))
        return ({"tail": x[m.L:].reshape(-1, n2), "jobnum": st["jobnum"] + 1},
                jnp.sum(jnp.abs(Zd[:8, :8])))

    def stage_m_rowin(st, params, blk):
        st, F = rowin_fft(st, blk)
        return st, jnp.sum(jnp.abs(F[:64]))

    def stage_m_fft(st, params, blk):
        st, F = nat_fft(st, blk)
        return st, jnp.sum(jnp.abs(F[:64]))

    def stage_m_chan(st, params, blk):
        mst, F = nat_fft(st["master"], blk)
        p = params["hf"]
        rt = (p["resp_tiles"] if "resp_tiles" in p
              else jax.lax.complex(p["chan_rr"][: hfm.C], p["chan_ri"][: hfm.C]))
        bb = tiled_channelize(F, rt, p["tile_lo"], p["slope"],
                              p["shifts"], hfm.tile_E, hfm.n_bins, hfm.olen,
                              m.real, m.N)
        bb, acc = fine_tune(bb, st["acc"], p["inc_q32"], p["adj_q32"])
        return {"master": mst, "acc": acc}, jnp.sum(bb.real)

    def nat_fft_full(st, blk):
        """Like nat_fft but UNSLICED (the fused-kernel path all-gathers
        the evenly-sharded natural array inside shard_map)."""
        if not engm.digit_cols:
            x = jnp.concatenate([st["tail"].reshape(-1), blk], axis=-1)
            xc = jax.lax.with_sharding_constraint(x, spec_in)
            return ({"tail": x[m.L:].reshape(-1, n2),
                     "jobnum": st["jobnum"] + 1}, engm.digit.fft_natural(xc))
        blk2 = jax.lax.with_sharding_constraint(
            blk.reshape(m.L // n2, n2), colspec)
        x = jnp.concatenate([st["tail"], blk2], axis=-2)
        xc = jax.lax.with_sharding_constraint(x, colspec)
        return ({"tail": x[m.L // n2:, :], "jobnum": st["jobnum"] + 1},
                engm.digit.fft_natural(xc, cols_in=True))

    def stage_m_kern(st, params, blk):
        # round-5 fused kernels under the mesh: one shard_map all-gather
        # + per-device pallas channelize AND noise estimate
        mst, Fn = nat_fft_full(st["master"], blk)
        bb, n0 = hfm._chan_noise_mesh(params["hf"], Fn)
        bb, acc = fine_tune(bb, st["acc"], params["hf"]["inc_q32"],
                            params["hf"]["adj_q32"])
        return ({"master": mst, "acc": acc},
                jnp.sum(bb.real) + jnp.sum(n0))

    def stage_m_noise(st, params, blk):
        mst, F = nat_fft(st, blk)
        p = params["hf"]
        energies = gather_noise_bins(F, p["shifts"], hfm.noise_bins, m.real, m.N)
        n0 = estimate_noise(energies, m.bins, hfm.fs_in)
        return mst, jnp.sum(n0)

    def stage_m_full(st, params, blk):
        st, out = engm.step(st, params, blk)
        acc = jnp.float32(0)
        for name, g in out.items():
            if not name.startswith("_"):
                acc = acc + jnp.sum(g["audio"])
        return st, acc

    def mst0():
        s = jax.jit(engm.init_state)()["master"]
        return s

    stages = {
        "m_digit": (stage_m_digit, mst0),
        "m_rowin": (stage_m_rowin, mst0),
        "m_fft": (stage_m_fft, mst0),
        "m_chan": (stage_m_chan, lambda: {"master": mst0(),
                                          "acc": jnp.zeros((hfm.C,), jnp.int32)}),
        "m_noise": (stage_m_noise, mst0),
        "m_full": (stage_m_full, lambda: jax.jit(engm.init_state)()),
    }
    if hfm.chan_kernel:
        stages["m_kern"] = (stage_m_kern,
                            lambda: {"master": mst0(),
                                     "acc": jnp.zeros((hfm.C,), jnp.int32)})
    return stages, engm.init_params()


def main():
    import sys
    global params
    argv = sys.argv[1:]
    if "--config" in argv:
        i = argv.index("--config")
        argv = argv[:i] + argv[i + 2:]
    names = [a for a in argv if not a.startswith("--")]
    if "--mesh" in sys.argv:
        mst, params = mesh_stages()
        STAGES.clear()
        STAGES.update(mst)
    names = names or list(STAGES)
    blocks = _mkblocks()
    for name in names:
        body, init = STAGES[name]
        runner, jinit = scan_runner(body, init)
        for attempt in range(6):
            try:
                st = jinit()
                jax.block_until_ready(st)

                def span():
                    t0 = time.perf_counter()
                    _st, acc = runner(st, params, blocks)
                    float(acc)
                    return time.perf_counter() - t0

                span()  # compile
                span()  # warm
                dt = min(span() for _ in range(3)) / (R * K)
                print(json.dumps({"stage": name, "ms_per_block": round(dt * 1e3, 4)}),
                      flush=True)
                break
            except Exception as e:
                print(f"# {name} attempt {attempt}: {type(e).__name__}: {e}",
                      flush=True)
                time.sleep(15.0)


if __name__ == "__main__":
    main()
