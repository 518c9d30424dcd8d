"""Golden tests for the overlap-save filter bank.

The strongest test of the whole phase bookkeeping chain (bin shift, Renfors
block phase adjust, Q32 fine-tune NCO): a carrier at an ARBITRARY frequency,
tuned exactly, must come out as a constant DC phasor — across block
boundaries — at the conventional amplitude (a/sqrt(2) for real masters,
a for complex masters).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from ka9q_radio_tpu.ops.filterbank import (
    MasterConfig,
    master_init,
    master_fft,
    master_transform,
    channelize,
    fine_tune,
    compute_tuning,
    block_phase_adjust_q32,
    good_blocksize,
)
from ka9q_radio_tpu.ops.filter_design import design_bandpass_response, response_to_device_order
from ka9q_radio_tpu.ops.osc import rev_to_q32

FS = 240_000  # front-end rate
BLOCKTIME = 0.02
OUT_FS = 12_000


def _setup(real_master: bool):
    cfg = MasterConfig.from_rate(FS, BLOCKTIME, overlap=5, real=real_master)
    assert (cfg.L, cfg.M, cfg.N) == (4800, 1201, 6000)
    olen = int(OUT_FS * BLOCKTIME)  # 240
    n_bins = olen * cfg.N // cfg.L  # 300
    resp = design_bandpass_response(
        n_bins, olen, -5000 / OUT_FS, 5000 / OUT_FS,
        kaiser_beta=11.0, real_master=real_master, master_points=cfg.N,
    )
    return cfg, olen, n_bins, response_to_device_order(resp)


def _run_carrier(real_master: bool, f_carrier: float, tune: float, amp=1.0, nblocks=8, phase0=0.3):
    cfg, olen, n_bins, resp = _setup(real_master)
    shift, rem, ok = compute_tuning(cfg.N, FS, tune)
    assert ok
    inc = jnp.array([rev_to_q32(-rem / OUT_FS)], jnp.int32)
    adj = jnp.array([block_phase_adjust_q32(shift, cfg.L, cfg.N)], jnp.int32)
    shifts = jnp.array([shift], jnp.int32)
    acc = jnp.array([0], jnp.int32)

    t = np.arange(nblocks * cfg.L) / FS
    if real_master:
        x = (amp * np.cos(2 * np.pi * f_carrier * t + phase0)).astype(np.float32)
    else:
        x = (amp * np.exp(1j * (2 * np.pi * f_carrier * t + phase0))).astype(np.complex64)

    state = master_init(cfg)
    resp_j = jnp.asarray(resp)[None, :]
    outs = []
    for k in range(nblocks):
        state, F = master_fft(cfg, state, jnp.asarray(x[k * cfg.L : (k + 1) * cfg.L]))
        bb = channelize(F, resp_j, shifts, olen, cfg.real, cfg.N)
        bb, acc = fine_tune(bb, acc, inc, adj)
        outs.append(np.asarray(bb[0]))
    return np.concatenate(outs), olen


@pytest.mark.parametrize("f_carrier", [100_000.0, 100_123.4, 37_777.77])
def test_real_master_carrier_to_dc(f_carrier):
    out, olen = _run_carrier(True, f_carrier, f_carrier)
    # skip the first two blocks (filter warm-up: M-1 master samples + channel kernel)
    z = out[2 * olen :]
    # constant amplitude a/sqrt(2)
    np.testing.assert_allclose(np.abs(z), 1 / np.sqrt(2), rtol=1e-3)
    # constant phase => DC: relative spread tiny, including across block edges
    dphi = np.angle(z[1:] * np.conj(z[:-1]))
    assert np.max(np.abs(dphi)) < 1e-3, f"phase discontinuity {np.max(np.abs(dphi))}"


@pytest.mark.parametrize("f_carrier", [100_123.4, -60_010.2])
def test_complex_master_carrier_to_dc(f_carrier):
    out, olen = _run_carrier(False, f_carrier, f_carrier)
    z = out[2 * olen :]
    np.testing.assert_allclose(np.abs(z), 1.0, rtol=1e-3)
    dphi = np.angle(z[1:] * np.conj(z[:-1]))
    assert np.max(np.abs(dphi)) < 1e-3


def test_real_master_inverted_spectrum():
    # Tuning to a negative frequency on a real master selects the inverted
    # (conjugate) spectrum — high-side LO injection (filter.c:777-859).
    f = 80_040.0
    out, olen = _run_carrier(True, f, -f)
    z = out[2 * olen :]
    np.testing.assert_allclose(np.abs(z), 1 / np.sqrt(2), rtol=1e-3)
    dphi = np.angle(z[1:] * np.conj(z[:-1]))
    assert np.max(np.abs(dphi)) < 1e-3


def test_offset_carrier_comes_out_at_offset():
    # Carrier 1 kHz above the tune frequency must appear at exactly +1 kHz.
    f_c, tune = 101_000.0, 100_000.0
    out, olen = _run_carrier(True, f_c, tune, nblocks=10)
    z = out[2 * olen :]
    np.testing.assert_allclose(np.abs(z), 1 / np.sqrt(2), rtol=2e-3)
    inst_f = np.angle(z[1:] * np.conj(z[:-1])) / (2 * np.pi) * OUT_FS
    np.testing.assert_allclose(inst_f, 1000.0, atol=1.0)


def test_stopband_attenuation():
    # Carrier 2 kHz beyond the passband edge: Kaiser beta=11 gives > 60 dB.
    f_c, tune = 108_000.0, 100_000.0  # +8 kHz offset, passband +/-5 kHz
    out, olen = _run_carrier(True, f_c, tune)
    z = out[2 * olen :]
    inband, _ = _run_carrier(True, tune, tune)
    atten_db = 20 * np.log10(np.max(np.abs(z)) / np.mean(np.abs(inband[2 * olen :])))
    assert atten_db < -60.0


def test_white_noise_gain_real_master():
    # Unit-variance white real noise through a B-wide filter: output power
    # should be 2 * B/fs * var (the sqrt(2) real-master convention).
    cfg, olen, n_bins, resp = _setup(True)
    rng = np.random.default_rng(42)
    nblocks = 40
    x = rng.normal(size=nblocks * cfg.L).astype(np.float32)
    shift, rem, _ = compute_tuning(cfg.N, FS, 60_000.0)
    shifts = jnp.array([shift], jnp.int32)
    inc = jnp.array([rev_to_q32(-rem / OUT_FS)], jnp.int32)
    adj = jnp.array([block_phase_adjust_q32(shift, cfg.L, cfg.N)], jnp.int32)
    acc = jnp.array([0], jnp.int32)
    state = master_init(cfg)
    resp_j = jnp.asarray(resp)[None, :]
    pw = []
    for k in range(nblocks):
        state, F = master_fft(cfg, state, jnp.asarray(x[k * cfg.L : (k + 1) * cfg.L]))
        bb = channelize(F, resp_j, shifts, olen, cfg.real, cfg.N)
        bb, acc = fine_tune(bb, acc, inc, adj)
        if k >= 2:
            pw.append(np.mean(np.abs(np.asarray(bb)) ** 2))
    got = np.mean(pw)
    want = 2.0 * (10_000.0 / FS)  # B = 10 kHz two-sided passband
    assert got == pytest.approx(want, rel=0.05)


def test_good_blocksize():
    assert good_blocksize(240) == 240
    assert good_blocksize(241) == 243  # 3^5
    assert good_blocksize(1000) == 1000
    assert good_blocksize(1621) == 1625  # 5^3 * 13


def test_complex_master_nyquist_stop():
    """A channel tuned near +fs/2 on a complex master must NOT alias in
    spectrum from the -fs/2 edge (filter.c's complex loop stops at the
    Nyquist boundary and zeros the rest)."""
    from ka9q_radio_tpu.ops.filterbank import gather_bins

    m = 4096
    F = jnp.zeros((m,), jnp.complex64)
    # strong "station" at the bottom edge: signed bin -2040 -> index m-2040
    F = F.at[m - 2040].set(100.0 + 0j)
    # channel centered at +2040 with 128 bins: its slice [1976, 2104) would
    # wrap past +2047 into the negative region without the stop
    got = np.asarray(gather_bins(F, jnp.array([2040], jnp.int32), 128, False, m))
    assert np.all(got == 0.0), "negative-edge energy aliased through Nyquist"

    # wrap through DC is still allowed: channel at -10 sees a DC carrier
    F2 = jnp.zeros((m,), jnp.complex64).at[0].set(1.0 + 0j)
    got2 = np.asarray(gather_bins(F2, jnp.array([-10], jnp.int32), 128, False, m))
    assert np.count_nonzero(got2) == 1


def test_matmul_channelizer_matches_ifft():
    """idft_matrix matmul == batched IFFT channelizer (MXU path)."""
    import numpy as np
    import jax.numpy as jnp
    from ka9q_radio_tpu.ops.filterbank import channelize, gather_bins, idft_matrix

    rng = np.random.default_rng(3)
    N, NB, OLEN, C = 3200, 200, 160, 6
    F = (rng.standard_normal(N // 2 + 1) + 1j * rng.standard_normal(N // 2 + 1)).astype(np.complex64)
    resp = (rng.standard_normal((C, NB)) + 1j * rng.standard_normal((C, NB))).astype(np.complex64)
    shifts = rng.integers(NB, N // 2 - NB, C).astype(np.int32)
    want = np.asarray(channelize(jnp.asarray(F), jnp.asarray(resp), jnp.asarray(shifts), OLEN, True, N))
    fd = gather_bins(jnp.asarray(F), jnp.asarray(shifts), NB, True, N) * jnp.asarray(resp)
    got = np.asarray(fd @ jnp.asarray(idft_matrix(NB, OLEN)))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4 * np.max(np.abs(want)))


def test_engine_matmul_option():
    """Engine(use_matmul=True) produces the same audio as the FFT path."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from ka9q_radio_tpu.runtime import ChannelSpec, GroupSpec, Engine

    groups = [GroupSpec(name="usb", demod="linear", samprate=8000,
                        channels=tuple(ChannelSpec(freq=20_000.0 + 3000 * i, low=50, high=2700)
                                       for i in range(4)))]
    e1 = Engine(samprate=128_000, groups=groups, real=True)
    e2 = Engine(samprate=128_000, groups=groups, real=True, use_matmul=True)
    rng = np.random.default_rng(0)
    x = (0.3 * np.cos(2 * np.pi * 21_000.0 * np.arange(4 * e1.L) / 128_000)
         + 0.01 * rng.standard_normal(4 * e1.L)).astype(np.float32)
    s1, p1 = jax.jit(e1.init_state)(), e1.init_params()
    s2, p2 = jax.jit(e2.init_state)(), e2.init_params()
    st1, st2 = jax.jit(e1.step), jax.jit(e2.step)
    for k in range(4):
        b = jnp.asarray(x[k * e1.L : (k + 1) * e1.L])
        s1, o1 = st1(s1, p1, b)
        s2, o2 = st2(s2, p2, b)
    a1, a2 = np.asarray(o1["usb"]["audio"]), np.asarray(o2["usb"]["audio"])
    assert np.max(np.abs(a1 - a2)) < 2e-3


@pytest.mark.parametrize("real_master", [True, False])
def test_tiled_channelizer_matches_reference_path(real_master):
    """tiled_channelize == channelize across all four gather cases
    (upright/inverted real-master slices incl. DC/Nyquist clamping;
    complex-master wrap through DC), odd and even slave sizes."""
    from ka9q_radio_tpu.ops.filterbank import (
        build_tile_params, tile_plan, tiled_idft_matrix, tiled_channelize, _CTILE,
    )

    rng = np.random.default_rng(3)
    N = 8192  # complex master tiles evenly (8192 % 128 == 0)
    m_bins = N // 2 + 1 if real_master else N
    for n_bins, olen in ((160, 128), (163, 130)):
        F = (rng.standard_normal(m_bins) + 1j * rng.standard_normal(m_bins)).astype(np.complex64)
        if real_master:
            shifts = np.array([1000, -1000, 30, N // 2 - 30, 0, -30], np.int32)
        else:
            shifts = np.array([0, 1000, -1000, N // 2 - 10, -(N // 2) + 10, 5], np.int32)
        C = len(shifts)
        resp = (rng.standard_normal((C, n_bins)) + 1j * rng.standard_normal((C, n_bins))).astype(np.complex64)
        want = np.asarray(channelize(jnp.asarray(F), jnp.asarray(resp), jnp.asarray(shifts),
                                     olen, real_master, N))
        rt, tl, sl = build_tile_params(resp, shifts, real_master, N)
        E = tiled_idft_matrix(n_bins, olen, tile_plan(n_bins) * _CTILE)
        got = np.asarray(tiled_channelize(jnp.asarray(F), jnp.asarray(rt), jnp.asarray(tl),
                                          jnp.asarray(sl), jnp.asarray(shifts), E,
                                          n_bins, olen, real_master, N))
        np.testing.assert_allclose(got, want, rtol=0, atol=3e-4 * np.max(np.abs(want)))


def test_engine_tiled_default_matches_plain():
    """The default (tiled) engine equals Engine(use_tiled=False) end-to-end,
    including after a retune and a filter hot-swap (the tile rows are
    host-refreshed params, never a recompile)."""
    import jax
    from ka9q_radio_tpu.runtime import ChannelSpec, GroupSpec, Engine

    groups = [GroupSpec(name="usb", demod="linear", samprate=8000,
                        channels=tuple(ChannelSpec(freq=20_000.0 + 3000 * i, low=50, high=2700)
                                       for i in range(4)))]
    e1 = Engine(samprate=128_000, groups=groups, real=True, use_tiled=False)
    e2 = Engine(samprate=128_000, groups=groups, real=True)
    assert e2.groups["usb"].tiled
    rng = np.random.default_rng(1)
    x = (0.3 * np.cos(2 * np.pi * 21_000.0 * np.arange(6 * e1.L) / 128_000)
         + 0.01 * rng.standard_normal(6 * e1.L)).astype(np.float32)
    s1, p1 = jax.jit(e1.init_state)(), e1.init_params()
    s2, p2 = jax.jit(e2.init_state)(), e2.init_params()
    st1, st2 = jax.jit(e1.step), jax.jit(e2.step)
    for k in range(6):
        if k == 2:  # retune channel 1 (shift + tile row move together)
            p1 = e1.retune(p1, "usb", 1, 26_500.0)
            p2 = e2.retune(p2, "usb", 1, 26_500.0)
        if k == 4:  # hot-swap channel 0's filter
            p1 = e1.set_edges(p1, "usb", 0, 100.0, 2000.0)
            p2 = e2.set_edges(p2, "usb", 0, 100.0, 2000.0)
        b = jnp.asarray(x[k * e1.L : (k + 1) * e1.L])
        s1, o1 = st1(s1, p1, b)
        s2, o2 = st2(s2, p2, b)
        a1, a2 = np.asarray(o1["usb"]["audio"]), np.asarray(o2["usb"]["audio"])
        assert np.max(np.abs(a1 - a2)) < 2e-3, k


@pytest.mark.parametrize("real_master", [True, False])
def test_tiled_fft_idft_variant_matches_reference_path(real_master):
    """tiled_channelize with E=None (the FFT-IDFT form for wideband slaves
    whose IDFT constant would blow the 32 MB budget) == channelize: the
    padded tile frame folds S -> n_bins and one batched IFFT replaces the
    matmul."""
    from ka9q_radio_tpu.ops.filterbank import (
        build_tile_params, tiled_channelize,
    )

    rng = np.random.default_rng(7)
    N = 16384
    m_bins = N // 2 + 1 if real_master else N
    for n_bins, olen in ((1920, 1536), (1283, 1026)):
        F = (rng.standard_normal(m_bins) + 1j * rng.standard_normal(m_bins)).astype(np.complex64)
        if real_master:
            shifts = np.array([3000, -3000, 700, N // 2 - 700, 0], np.int32)
        else:
            shifts = np.array([0, 3000, -3000, N // 2 - 1000, -(N // 2) + 1000], np.int32)
        C = len(shifts)
        resp = (rng.standard_normal((C, n_bins)) + 1j * rng.standard_normal((C, n_bins))).astype(np.complex64)
        want = np.asarray(channelize(jnp.asarray(F), jnp.asarray(resp), jnp.asarray(shifts),
                                     olen, real_master, N))
        rt, tl, sl = build_tile_params(resp, shifts, real_master, N)
        got = np.asarray(tiled_channelize(jnp.asarray(F), jnp.asarray(rt), jnp.asarray(tl),
                                          jnp.asarray(sl), jnp.asarray(shifts), None,
                                          n_bins, olen, real_master, N))
        np.testing.assert_allclose(got, want, rtol=0, atol=3e-4 * np.max(np.abs(want)))


def test_wfm_group_uses_tiled_fft_variant():
    """The WFM composite slave (9,600 bins) now rides the tiled gather +
    FFT-IDFT instead of the per-element master gather."""
    from ka9q_radio_tpu.runtime import ChannelSpec, GroupSpec, Engine

    eng = Engine(samprate=7_680_000, real=False, groups=[
        GroupSpec(name="wfm", demod="wfm", samprate=384_000,
                  channels=tuple(ChannelSpec(freq=float(f), low=-100e3, high=100e3)
                                 for f in np.linspace(-3e6, 3e6, 4)))])
    g = eng.groups["wfm"]
    assert g.tiled and g.tile_E is None


def test_mxu_master_batch_unroll_matches():
    """master_transform on a [B, N] batch (multi-front-end) == per-row
    transforms (the unrolled form that avoids the batched cascade's
    strided transposes, measured 2.6x on v5e)."""
    cfg = MasterConfig.from_rate(129_600_000, 0.02, 5, real=True)
    assert cfg.mxu is not None
    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, cfg.N)).astype(np.float32) * 1e-2
    Fb = np.asarray(master_transform(cfg, jnp.asarray(x)))
    for b in range(2):
        Fs = np.asarray(master_transform(cfg, jnp.asarray(x[b])))
        np.testing.assert_array_equal(Fb[b], Fs)
