"""Fused Pallas channelizer == tiled_channelize (the XLA reference path).

Runs in interpret mode on the CPU suite; the same kernel runs compiled
on TPU (bench.py / the engine's dense-group path)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ka9q_radio_tpu.ops.filterbank import (
    build_tile_params, tiled_channelize, tiled_idft_matrix)
from ka9q_radio_tpu.ops.filter_design import design_bandpass_response
from ka9q_radio_tpu.ops.pallas_channelize import (
    _CB, plan_runs, check_runs, recompute_row0, pallas_channelize, build_ramp)


def _setup(real_master: bool, C: int = 256, seed: int = 0):
    rng = np.random.default_rng(seed)
    master_N = 65_536
    m_bins = master_N // 2 + 1 if real_master else master_N
    n_bins = 256
    olen = 200
    resp = np.zeros((C, n_bins), np.complex64)
    for c in range(C):
        r = design_bandpass_response(n_bins, olen, 50.0 / 12_000.0,
                                     3_000.0 / 12_000.0, 11.0,
                                     real_master=real_master,
                                     master_points=master_N)
        resp[c] = r * np.exp(1j * rng.uniform(0, 2 * np.pi))
    # dense shift ladder (some negative = inverted for the real master)
    if real_master:
        shifts = np.linspace(-8000, 20_000, C).astype(np.int32)
    else:
        shifts = np.linspace(2000, 24_000, C).astype(np.int32)
    rt, tl, sl = build_tile_params(resp, shifts, real_master, master_N)
    S = rt.shape[-1]
    E = tiled_idft_matrix(n_bins, olen, S)
    F = (rng.standard_normal(m_bins) + 1j * rng.standard_normal(m_bins)
         ).astype(np.complex64)
    return dict(F=F, rt=rt, tl=tl, sl=sl, shifts=shifts, E=E, S=S,
                n_bins=n_bins, olen=olen, master_N=master_N, m_bins=m_bins)


@pytest.mark.parametrize("real_master", [True, False])
def test_kernel_matches_tiled(real_master):
    s = _setup(real_master)
    T = 128
    ntiles = s["S"] // T
    pad = (-s["m_bins"]) % T
    nrows = (s["m_bins"] + pad) // T

    plan = plan_runs(s["tl"], ntiles, nrows)
    assert plan is not None, "dense ladder must be kernel-eligible"
    row0, span = plan
    assert check_runs(s["tl"], row0, ntiles, span)

    off = (s["tl"] - np.repeat(row0, _CB)).astype(np.int32)[:, None]
    sgn = np.where(real_master & (s["shifts"] < 0), -1.0, 1.0
                   ).astype(np.float32)[:, None]
    olen_pad = -(-s["olen"] // 128) * 128
    Epad = np.zeros((s["S"], olen_pad), np.complex64)
    Epad[:, : s["olen"]] = s["E"]

    want = np.asarray(jax.jit(
        lambda F: tiled_channelize(F, jnp.asarray(s["rt"]), jnp.asarray(s["tl"]),
                                   jnp.asarray(s["sl"]), jnp.asarray(s["shifts"]),
                                   s["E"], s["n_bins"], s["olen"], real_master,
                                   s["master_N"]))(jnp.asarray(s["F"])))
    rr_t, ri_t = build_ramp(s["sl"], s["n_bins"], s["olen"], olen_pad)
    got = np.asarray(pallas_channelize(
        jnp.asarray(s["F"]),
        jnp.asarray(s["rt"].real.astype(np.float32)),
        jnp.asarray(s["rt"].imag.astype(np.float32)),
        jnp.asarray(off), jnp.asarray(sgn),
        jnp.asarray(rr_t), jnp.asarray(ri_t),
        jnp.asarray(row0),
        jnp.asarray(Epad.real), jnp.asarray(Epad.imag),
        ntiles=ntiles, span=span, olen=s["olen"],
        nrows=nrows, interpret=jax.default_backend() != "tpu"))

    scale = np.abs(want).max()
    assert np.max(np.abs(got - want)) < 3e-5 * scale


def test_plan_rejects_sparse_and_recovers():
    ntiles, nrows = 4, 12_000
    # sparse: 128 channels spread over 11k rows
    tl = np.linspace(0, 11_000, 256).astype(np.int32)
    assert plan_runs(tl, ntiles, nrows) is None
    # dense ladder plans, survives a small retune, rejects a wild one
    tl = (np.arange(256) // 2).astype(np.int32)
    plan = plan_runs(tl, ntiles, nrows)
    assert plan is not None
    row0, span = plan
    tl2 = tl.copy()
    tl2[7] += 3  # small retune stays inside the span
    assert check_runs(tl2, row0, ntiles, span)
    assert recompute_row0(tl2, ntiles, nrows, span) is not None
    tl2[7] = 9_000  # scattered beyond any span
    assert not check_runs(tl2, row0, ntiles, span)
    assert recompute_row0(tl2, ntiles, nrows, span) is None


def test_engine_kernel_matches_xla(monkeypatch):
    """Full Engine.step with the fused channelizer (forced on, interpret
    mode) == the XLA engine, including a retune that scatters a run
    beyond its span (runtime fallback via chan_ok, same compiled step)."""
    monkeypatch.setenv("KA9Q_CHAN_KERNEL", "force")
    from ka9q_radio_tpu.runtime import ChannelSpec, GroupSpec, Engine
    from ka9q_radio_tpu.runtime.engine import _Group  # noqa: F401

    FS = 2_048_000
    C = 512
    freqs = np.linspace(0.05 * FS, 0.45 * FS, C)
    groups = [GroupSpec(name="hf", demod="linear", samprate=8_000,
                        channels=tuple(ChannelSpec(freq=float(f), low=50.0,
                                                   high=2_700.0)
                                       for f in freqs))]
    ek = Engine(samprate=FS, real=True, groups=groups)
    assert ek.groups["hf"].chan_kernel, "dense ladder must arm the kernel"
    monkeypatch.delenv("KA9Q_CHAN_KERNEL")
    ex = Engine(samprate=FS, real=True, groups=groups)
    assert not ex.groups["hf"].chan_kernel

    rng = np.random.default_rng(2)
    t = np.arange(4 * ek.L) / FS
    x = (0.02 * rng.standard_normal(4 * ek.L)
         + 0.3 * np.cos(2 * np.pi * (freqs[C // 3] + 700.0) * t)).astype(np.float32)
    blocks = x.reshape(4, ek.L)

    sk, pk = jax.jit(ek.init_state)(), ek.init_params()
    sx, px = jax.jit(ex.init_state)(), ex.init_params()
    assert float(pk["hf"]["chan_ok"]) == 1.0
    step_k, step_x = jax.jit(ek.step), jax.jit(ex.step)
    for i in range(2):
        sk, ok_ = step_k(sk, pk, jnp.asarray(blocks[i]))
        sx, ox_ = step_x(sx, px, jnp.asarray(blocks[i]))
    a_k = np.asarray(ok_["hf"]["audio"])
    a_x = np.asarray(ox_["hf"]["audio"])
    scale = max(np.abs(a_x).max(), 1e-9)
    assert np.max(np.abs(a_k - a_x)) < 5e-4 * scale

    # a retune inside the run keeps the kernel armed...
    pk = ek.retune(pk, "hf", 10, float(freqs[12]))
    px = ex.retune(px, "hf", 10, float(freqs[12]))
    assert float(np.asarray(pk["hf"]["chan_ok"])) == 1.0
    # ...a far retune disarms it (fallback, values still correct)
    pk = ek.retune(pk, "hf", 10, 1_000_000.0)
    px = ex.retune(px, "hf", 10, 1_000_000.0)
    assert float(np.asarray(pk["hf"]["chan_ok"])) == 0.0
    # put a carrier AT the retuned channel so the disarmed-fallback path
    # is pinned on actual signal, not just noise (advisor r4: a stale
    # response table passed the global max-abs check undetected)
    x2 = (x + 0.3 * np.cos(2 * np.pi * (1_000_000.0 + 700.0) * t)
          ).astype(np.float32)
    blocks2 = x2.reshape(4, ek.L)
    for i in range(2, 4):
        sk, ok_ = step_k(sk, pk, jnp.asarray(blocks2[i]))
        sx, ox_ = step_x(sx, px, jnp.asarray(blocks2[i]))
    a_k = np.asarray(ok_["hf"]["audio"])
    a_x = np.asarray(ox_["hf"]["audio"])
    # the kernel-vs-XLA rounding delta from the first two blocks has been
    # through two blocks of nonlinear AGC/squelch state by now; the paths
    # agree to ~f32 rounding per block (asserted above), the carried state
    # just amplifies it
    assert np.max(np.abs(a_k - a_x)) < 2e-2 * max(np.abs(a_x).max(), 1e-9)
    # the retuned channel demodulates its carrier correctly on ITS scale
    ch_scale = max(np.abs(a_x[10]).max(), 1e-9)
    assert np.abs(a_x[10]).max() > 1e-3, "retuned channel must hear its carrier"
    assert np.max(np.abs(a_k[10] - a_x[10])) < 2e-2 * ch_scale
    # retune BACK inside the dense ladder: the run fits again, the kernel
    # re-arms, and the rebuilt tables match the XLA engine
    pk = ek.retune(pk, "hf", 10, float(freqs[10]))
    px = ex.retune(px, "hf", 10, float(freqs[10]))
    assert float(np.asarray(pk["hf"]["chan_ok"])) == 1.0
    sk, ok_ = step_k(sk, pk, jnp.asarray(blocks[0]))
    sx, ox_ = step_x(sx, px, jnp.asarray(blocks[0]))
    a_k = np.asarray(ok_["hf"]["audio"])
    a_x = np.asarray(ox_["hf"]["audio"])
    assert np.max(np.abs(a_k - a_x)) < 2e-2 * max(np.abs(a_x).max(), 1e-9)


def test_engine_noise_kernel_pinned(monkeypatch):
    """Engine-level N0 pin (radio.c:1821-1904 estimate_noise parity):
    the fused noise kernel (nz_ok=1), its runtime-disarmed XLA fallback
    (nz_ok=0) and the unfused engine all report the same per-channel N0,
    and a noise-only disarm leaves the channel kernel armed."""
    monkeypatch.setenv("KA9Q_CHAN_KERNEL", "force")
    from ka9q_radio_tpu.runtime import ChannelSpec, GroupSpec, Engine

    FS = 2_048_000
    C = 512
    freqs = np.linspace(0.05 * FS, 0.45 * FS, C)
    groups = [GroupSpec(name="hf", demod="linear", samprate=8_000,
                        channels=tuple(ChannelSpec(freq=float(f), low=50.0,
                                                   high=2_700.0)
                                       for f in freqs))]
    ek = Engine(samprate=FS, real=True, groups=groups)
    gk = ek.groups["hf"]
    assert gk.chan_kernel and gk.noise_kernel
    monkeypatch.delenv("KA9Q_CHAN_KERNEL")
    ex = Engine(samprate=FS, real=True, groups=groups)
    assert not ex.groups["hf"].noise_kernel

    rng = np.random.default_rng(7)
    t = np.arange(3 * ek.L) / FS
    x = (0.05 * rng.standard_normal(3 * ek.L)
         + 0.2 * np.cos(2 * np.pi * (freqs[C // 2] + 700.0) * t)
         ).astype(np.float32)
    blocks = x.reshape(3, ek.L)
    sk, pk = jax.jit(ek.init_state)(), ek.init_params()
    sx, px = jax.jit(ex.init_state)(), ex.init_params()
    assert float(np.asarray(pk["hf"]["nz_ok"])) == 1.0
    step_k, step_x = jax.jit(ek.step), jax.jit(ex.step)

    sk, ok_ = step_k(sk, pk, jnp.asarray(blocks[0]))
    sx, ox_ = step_x(sx, px, jnp.asarray(blocks[0]))
    n0_k = np.asarray(ok_["hf"]["info"]["n0"])
    n0_x = np.asarray(ox_["hf"]["info"]["n0"])
    assert n0_x.min() > 0
    np.testing.assert_allclose(n0_k, n0_x, rtol=2e-4)

    # disarm ONLY the noise plan (runtime flag — same compiled step):
    # the lax.cond fallback must produce the same estimates while the
    # channel kernel stays armed
    gk.host["nz_ok"] = np.float32(0.0)
    pk2 = dict(pk)
    gp = dict(pk2["hf"])
    gp["nz_ok"] = gk.put(gk.host["nz_ok"])
    pk2["hf"] = gp
    assert float(np.asarray(pk2["hf"]["chan_ok"])) == 1.0
    sk, ok_ = step_k(sk, pk2, jnp.asarray(blocks[1]))
    sx, ox_ = step_x(sx, px, jnp.asarray(blocks[1]))
    np.testing.assert_allclose(np.asarray(ok_["hf"]["info"]["n0"]),
                               np.asarray(ox_["hf"]["info"]["n0"]),
                               rtol=2e-4)

    # re-arm via an ordinary retune (surgery re-plans the windows)
    pk3 = ek.retune(pk2, "hf", 5, float(freqs[5]) + 1_000.0)
    px3 = ex.retune(px, "hf", 5, float(freqs[5]) + 1_000.0)
    assert float(np.asarray(pk3["hf"]["nz_ok"])) == 1.0
    sk, ok_ = step_k(sk, pk3, jnp.asarray(blocks[2]))
    sx, ox_ = step_x(sx, px3, jnp.asarray(blocks[2]))
    np.testing.assert_allclose(np.asarray(ok_["hf"]["info"]["n0"]),
                               np.asarray(ox_["hf"]["info"]["n0"]),
                               rtol=2e-4)


def test_noise_kernel_matches_xla():
    """pallas_noise_est == estimate_noise(gather_noise_bins(...)) on a
    dense real-master ladder (interpret mode on CPU)."""
    from ka9q_radio_tpu.ops.noise import (gather_noise_bins, estimate_noise,
                                          noise_correction)
    from ka9q_radio_tpu.ops.pallas_channelize import (plan_runs,
                                                      pallas_noise_est)

    rng = np.random.default_rng(3)
    master_N = 262_144
    m_bins = master_N // 2 + 1
    C, nbins, T = 256, 1024, 128
    ntiles = nbins // T
    F = (rng.standard_normal(m_bins) + 1j * rng.standard_normal(m_bins)
         ).astype(np.complex64) * rng.uniform(0.1, 10.0, m_bins)
    shifts = np.linspace(2_000, 120_000, C).astype(np.int32)
    shifts[10] = -shifts[10]  # an inverted channel (|shift| window)
    fs = 1.0e6

    want = np.asarray(jax.jit(lambda Fv: estimate_noise(
        gather_noise_bins(Fv, jnp.asarray(shifts), nbins, True, master_N),
        m_bins, fs))(jnp.asarray(F)))

    nrows = (m_bins + ((-m_bins) % T)) // T
    lo = np.abs(shifts.astype(np.int64)) - nbins // 2
    tl = (np.clip(lo, 0, m_bins - nbins) // T).astype(np.int32)
    plan = plan_runs(tl, ntiles, nrows)
    assert plan is not None
    row0, span = plan
    from ka9q_radio_tpu.ops.pallas_channelize import _CB
    off = (tl - np.repeat(row0, _CB)).astype(np.int32)[:, None]
    got = np.asarray(pallas_noise_est(
        jnp.asarray(F), jnp.asarray(off), jnp.asarray(row0),
        ntiles=ntiles, span=span, nrows=nrows, nbins=nbins,
        scale=noise_correction() / (float(m_bins) * fs),
        interpret=jax.default_backend() != "tpu"))
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_kernel_in_timeshard_scan(monkeypatch):
    """Opt-in (KA9Q_CHAN_KERNEL_SCAN): the fused kernel runs inside the
    no-mesh time-shards scan dispatch — the daemon's remote-link mode —
    and matches the per-block kernel engine."""
    monkeypatch.setenv("KA9Q_CHAN_KERNEL", "force")
    monkeypatch.setenv("KA9Q_CHAN_KERNEL_SCAN", "1")
    from ka9q_radio_tpu.runtime import ChannelSpec, GroupSpec, Engine

    FS = 2_048_000
    C = 512
    D = 2
    freqs = np.linspace(0.05 * FS, 0.45 * FS, C)

    def mk():
        return [GroupSpec(name="hf", demod="linear", samprate=8_000,
                          channels=tuple(ChannelSpec(freq=float(f), low=50.0,
                                                     high=2_700.0)
                                         for f in freqs))]

    et = Engine(samprate=FS, real=True, groups=mk())  # per-block reference
    assert et.groups["hf"].chan_kernel

    rng = np.random.default_rng(4)
    t = np.arange(2 * D * et.L) / FS
    x = (0.01 * rng.standard_normal(t.size)
         + 0.3 * np.cos(2 * np.pi * (freqs[C // 3] + 700.0) * t)).astype(np.float32)
    blocks = x.reshape(2, D, et.L)

    st, pt = jax.jit(et.init_state)(), et.init_params()
    stept = jax.jit(et.step)
    ref = []
    for i in range(2):
        for d in range(D):
            st, ot = stept(st, pt, jnp.asarray(blocks[i, d]))
            ref.append(np.asarray(ot["hf"]["audio"]))

    # the daemon's scan-dispatch form (radiod._mk_step without a mesh)
    es = Engine(samprate=FS, real=True, groups=mk())
    assert es.groups["hf"].chan_kernel

    def step_many(state, prms, blks):
        def body(s, blk):
            s, out = es.step(s, prms, blk)
            return s, out

        return jax.lax.scan(body, state, blks)

    ss, ps = jax.jit(es.init_state)(), es.init_params()
    stepm = jax.jit(step_many)
    got = []
    for i in range(2):
        ss, os_ = stepm(ss, ps, jnp.asarray(blocks[i]))
        for d in range(D):
            got.append(np.asarray(os_["hf"]["audio"][d]))
    for k, (a, b) in enumerate(zip(got, ref)):
        assert np.abs(a - b).max() < 2e-5 * max(np.abs(b).max(), 1e-9), k
