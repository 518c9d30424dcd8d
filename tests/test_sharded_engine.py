"""Sharded Engine (mesh=...) == single-device Engine.

The distributed digit-order master FFT + sharded bin gather
(parallel/master.py) must produce the same audio as the dense single-chip
path — the multi-chip analog of the reference's guarantee that every
channel reads the same master bins (filter.c:654-695). Runs on the 8-way
virtual CPU mesh from conftest.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ka9q_radio_tpu.runtime import ChannelSpec, GroupSpec, Engine
from ka9q_radio_tpu.parallel import make_mesh, shard_engine_tree

FS = 128_000  # L=2560, M=641, N=3200=2^7*5^2 -> 8-way split 40x80


def _groups(real: bool):
    span = FS / 2 * 0.8 if not real else FS / 2 * 0.8
    fm_lo = 1000.0 if real else -span
    fm_freqs = np.linspace(fm_lo, span, 8)
    lin_freqs = np.linspace(2000.0 if real else -span * 0.9, span * 0.9, 8)
    return [
        GroupSpec(name="nbfm", demod="fm", samprate=8000,
                  channels=tuple(ChannelSpec(freq=float(f), low=-3000, high=3000)
                                 for f in fm_freqs)),
        GroupSpec(name="usb", demod="linear", samprate=8000, filter2=1,
                  channels=tuple(ChannelSpec(freq=float(f), low=50, high=2700)
                                 for f in lin_freqs)),
    ]


def _blocks(eng, real: bool, n=4, seed=0):
    rng = np.random.default_rng(seed)
    t = (np.arange(n * eng.L) / FS)
    if real:
        x = (0.05 * rng.standard_normal(n * eng.L)
             + 0.5 * np.cos(2 * np.pi * 20_000 * t)).astype(np.float32)
    else:
        x = (0.05 * (rng.standard_normal(n * eng.L) + 1j * rng.standard_normal(n * eng.L))
             + 0.5 * np.exp(2j * np.pi * 20_000 * t)).astype(np.complex64)
    return x.reshape(n, eng.L)


@pytest.mark.parametrize("real", [True, False])
def test_sharded_equals_single(real):
    groups = _groups(real)
    spurs = [20_000.0]
    ref = Engine(samprate=FS, groups=groups, real=real, spurs=spurs)
    mesh = make_mesh()
    sh = Engine(samprate=FS, groups=groups, real=real, spurs=spurs, mesh=mesh)

    blocks = _blocks(ref, real)
    # single-device run
    st_r, p_r = jax.jit(ref.init_state)(), ref.init_params()
    step_r = jax.jit(ref.step)
    # sharded run
    st_s = shard_engine_tree(sh, mesh, jax.jit(sh.init_state)())
    p_s = shard_engine_tree(sh, mesh, sh.init_params())
    step_s = jax.jit(sh.step, donate_argnums=0)

    for k in range(blocks.shape[0]):
        b = jnp.asarray(blocks[k])
        st_r, out_r = step_r(st_r, p_r, b)
        st_s, out_s = step_s(st_s, p_s, b)
    for g in ("nbfm", "usb"):
        a_r = np.asarray(out_r[g]["audio"])
        a_s = np.asarray(out_s[g]["audio"])
        # identical math up to FFT-algorithm roundoff (six-step vs dense)
        assert np.max(np.abs(a_r - a_s)) < 2e-3, g
        n0_r = np.asarray(out_r[g]["info"]["n0"])
        n0_s = np.asarray(out_s[g]["info"]["n0"])
        np.testing.assert_allclose(n0_s, n0_r, rtol=1e-3)
        bb_r = np.asarray(out_r[g]["info"]["baseband_power"])
        bb_s = np.asarray(out_s[g]["info"]["baseband_power"])
        np.testing.assert_allclose(bb_s, bb_r, rtol=1e-3, atol=1e-12)


def test_sharded_retune_no_recompile():
    groups = _groups(False)
    mesh = make_mesh()
    sh = Engine(samprate=FS, groups=groups, real=False, mesh=mesh)
    st = shard_engine_tree(sh, mesh, jax.jit(sh.init_state)())
    p = shard_engine_tree(sh, mesh, sh.init_params())
    step = jax.jit(sh.step)
    b = jnp.asarray(_blocks(sh, False, n=1)[0])
    # two warmup steps: the first step's output state shardings (e.g. the
    # master tail, now time-sharded) differ from the initial host placement,
    # costing one extra compile before the steady state
    st, _ = step(st, p, b)
    st, _ = step(st, p, b)
    n_compiles = step._cache_size()
    p = sh.retune(p, "nbfm", 3, 12_345.0)
    p = sh.set_edges(p, "usb", 2, 100.0, 2400.0)
    st, out = step(st, p, b)
    assert step._cache_size() == n_compiles  # retune is pure data
    assert np.isfinite(np.asarray(out["nbfm"]["audio"])).all()


def test_sharded_beam():
    span = FS / 2 * 0.8
    freqs = np.linspace(-span, span, 8)
    groups = [GroupSpec(name="beam", demod="linear", samprate=8000, beam=True,
                        a_weight=0.8 + 0.1j, b_weight=0.2 - 0.3j,
                        channels=tuple(ChannelSpec(freq=float(f), low=-3000, high=3000)
                                       for f in freqs))]
    ref = Engine(samprate=FS, groups=groups, real=False)
    mesh = make_mesh()
    sh = Engine(samprate=FS, groups=groups, real=False, mesh=mesh)
    blocks = _blocks(ref, False, n=2)
    st_r, p_r = jax.jit(ref.init_state)(), ref.init_params()
    st_s = shard_engine_tree(sh, mesh, jax.jit(sh.init_state)())
    p_s = shard_engine_tree(sh, mesh, sh.init_params())
    step_r, step_s = jax.jit(ref.step), jax.jit(sh.step)
    for k in range(blocks.shape[0]):
        b = jnp.asarray(blocks[k])
        st_r, out_r = step_r(st_r, p_r, b)
        st_s, out_s = step_s(st_s, p_s, b)
    a_r = np.asarray(out_r["beam"]["audio"])
    a_s = np.asarray(out_s["beam"]["audio"])
    assert np.max(np.abs(a_r - a_s)) < 2e-3


def test_sharded_rejects_odd_channel_count():
    groups = [GroupSpec(name="g", demod="fm", samprate=8000,
                        channels=tuple(ChannelSpec(freq=1000.0 * i) for i in range(1, 4)))]
    with pytest.raises(ValueError, match="not divisible"):
        Engine(samprate=FS, groups=groups, real=False, mesh=make_mesh())


def test_flagship_geometry_parity():
    """The REAL flagship geometry (N=3,240,000 rof3240000-equivalent, 1000
    SSB channels + 16-bin sweep) sharded over the 8-way CPU mesh matches
    the single-chip engine to FFT roundoff across 10 blocks including a
    mid-stream retune and a mid-stream channel-table grow (SURVEY §7.6)."""
    import jax
    from ka9q_radio_tpu.parallel.selftest import flagship_parity

    flagship_parity(min(8, len(jax.devices())), nblocks=10)


def test_sharded_chan_kernel_parity(monkeypatch):
    """Round-4 fused kernels under the SHARDED master (VERDICT r5 #3):
    one shard_map all-gathers the natural-order bins and runs
    pallas_channelize / pallas_noise_est on each device's local channel
    rows — audio and N0 match the dense engine, and a far retune falls
    back to the in-body XLA path (chan_ok=0) without recompiling."""
    monkeypatch.setenv("KA9Q_CHAN_KERNEL", "force")
    FSK = 2_048_000
    C = 1024  # 8 devices x 128-channel runs
    freqs = np.linspace(0.05 * FSK, 0.45 * FSK, C)

    def mk():
        return [GroupSpec(name="hf", demod="linear", samprate=8_000,
                          channels=tuple(ChannelSpec(freq=float(f), low=50.0,
                                                     high=2_700.0)
                                         for f in freqs))]

    mesh = make_mesh()
    em = Engine(samprate=FSK, real=True, groups=mk(), mesh=mesh)
    assert em.groups["hf"].chan_kernel and em.groups["hf"].noise_kernel
    monkeypatch.delenv("KA9Q_CHAN_KERNEL")
    ed = Engine(samprate=FSK, real=True, groups=mk())
    assert not ed.groups["hf"].chan_kernel

    rng = np.random.default_rng(5)
    t = np.arange(4 * em.L) / FSK
    x = (0.01 * rng.standard_normal(4 * em.L)
         + 0.3 * np.cos(2 * np.pi * (freqs[C // 3] + 700.0) * t)).astype(np.float32)
    blocks = x.reshape(4, em.L)
    sm, pm = jax.jit(em.init_state)(), em.init_params()
    sd, pd = jax.jit(ed.init_state)(), ed.init_params()
    stepm, stepd = jax.jit(em.step), jax.jit(ed.step)
    for i in range(4):
        sm, om = stepm(sm, pm, jnp.asarray(blocks[i]))
        sd, od = stepd(sd, pd, jnp.asarray(blocks[i]))
    am, ad = np.asarray(om["hf"]["audio"]), np.asarray(od["hf"]["audio"])
    assert np.abs(am - ad).max() < 2e-2 * max(np.abs(ad).max(), 1e-9)
    nm, nd = np.asarray(om["hf"]["info"]["n0"]), np.asarray(od["hf"]["info"]["n0"])
    np.testing.assert_allclose(nm, nd, rtol=2e-4)

    # far retune disarms (runtime flag, no recompile); values still match
    pm2 = em.retune(pm, "hf", 10, 1_000_000.0)
    pd2 = ed.retune(pd, "hf", 10, 1_000_000.0)
    assert float(np.asarray(pm2["hf"]["chan_ok"])) == 0.0
    sm, om = stepm(sm, pm2, jnp.asarray(blocks[0]))
    sd, od = stepd(sd, pd2, jnp.asarray(blocks[0]))
    am, ad = np.asarray(om["hf"]["audio"]), np.asarray(od["hf"]["audio"])
    assert np.abs(am - ad).max() < 2e-2 * max(np.abs(ad).max(), 1e-9)


def test_sharded_lazy_spectrum_gate():
    """Narrowband lazy spectrum under the sharded (natural-order) master
    (VERDICT r5 #5): the armed params gate works — a disarmed sweep
    yields zero bins, re-arming accumulates, and the linear group is
    untouched either way."""
    C = 16
    freqs = np.linspace(0.1 * FS, 0.4 * FS, C)

    def mk():
        return [
            GroupSpec(name="usb", demod="linear", samprate=8_000,
                      channels=tuple(ChannelSpec(freq=float(f), low=50.0,
                                                 high=2_700.0) for f in freqs)),
            GroupSpec(name="sweep", demod="spectrum", samprate=8_000,
                      bin_bw=50.0, bin_count=32,
                      channels=tuple(ChannelSpec(freq=float(f)) for f in freqs)),
        ]

    mesh = make_mesh()
    em = Engine(samprate=FS, real=True, groups=mk(), mesh=mesh)
    ed = Engine(samprate=FS, real=True, groups=mk())
    blocks = _blocks(em, real=True)
    sm, pm = jax.jit(em.init_state)(), em.init_params()
    sd, pd = jax.jit(ed.init_state)(), ed.init_params()
    stepm, stepd = jax.jit(em.step), jax.jit(ed.step)
    g = em.groups["sweep"]
    pm_idle = dict(pm)
    gi = dict(pm_idle["sweep"])
    gi["armed"] = g.put(np.float32(0.0))
    pm_idle["sweep"] = gi
    for i in range(2):
        sm, om = stepm(sm, pm_idle, jnp.asarray(blocks[i]))
        sd, od = stepd(sd, pd, jnp.asarray(blocks[i]))
    assert np.abs(np.asarray(om["sweep"]["info"]["bin_data"])).max() == 0.0
    # linear audio identical armed or not
    assert np.abs(np.asarray(om["usb"]["audio"])
                  - np.asarray(od["usb"]["audio"])).max() < 2e-3
    for i in range(2, 4):
        sm, om = stepm(sm, pm, jnp.asarray(blocks[i]))
    assert np.abs(np.asarray(om["sweep"]["info"]["bin_data"])).max() > 0.0
