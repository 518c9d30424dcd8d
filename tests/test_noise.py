"""Quantile noise-floor estimator tests (radio.c:1690-1904 behavior)."""
import numpy as np
import jax.numpy as jnp
import pytest

from ka9q_radio_tpu.ops.filterbank import MasterConfig, master_init, master_fft, compute_tuning
from ka9q_radio_tpu.ops.noise import NQ, N_CUTOFF, gather_noise_bins, estimate_noise, noise_correction

FS = 240_000


def _spectrum(x, real=True):
    cfg = MasterConfig.from_rate(FS, 0.02, 5, real=real)
    st = master_init(cfg)
    nb = x.size // cfg.L
    for k in range(nb):
        st, F = master_fft(cfg, st, jnp.asarray(x[k * cfg.L : (k + 1) * cfg.L]))
    return cfg, F


def test_correction_factor():
    # z = 1.5*(-ln 0.9); C = 1/(1 - z e^-z/(1-e^-z))
    z = 1.5 * -np.log(0.9)
    want = 1.0 / (1.0 - z * np.exp(-z) / (1.0 - np.exp(-z)))
    assert noise_correction() == pytest.approx(want)


def test_white_noise_n0_real_master():
    rng = np.random.default_rng(0)
    sigma = 1e-3
    x = (sigma * rng.normal(size=3 * 4800)).astype(np.float32)
    cfg, F = _spectrum(x)
    shifts = jnp.array([compute_tuning(cfg.N, FS, 60_000.0)[0]], jnp.int32)
    e = gather_noise_bins(F, shifts, 1000, cfg.real, cfg.N)
    n0 = float(estimate_noise(e, cfg.bins, FS)[0])
    # one-sided PSD of real white noise: 2*sigma^2/fs; estimator known ~0.5 dB high
    want = 2 * sigma**2 / FS
    assert n0 == pytest.approx(want, rel=0.25)


def test_n0_ignores_strong_onbin_carrier():
    rng = np.random.default_rng(1)
    sigma = 1e-3
    t = np.arange(3 * 4800) / FS
    # carrier exactly on a 40 Hz bin -> no rectangular-window leakage
    x = (sigma * rng.normal(size=t.size) + 0.5 * np.cos(2 * np.pi * 60_000.0 * t)).astype(np.float32)
    cfg, F = _spectrum(x)
    shifts = jnp.array([compute_tuning(cfg.N, FS, 60_000.0)[0]], jnp.int32)
    e = gather_noise_bins(F, shifts, 1000, cfg.real, cfg.N)
    n0 = float(estimate_noise(e, cfg.bins, FS)[0])
    want = 2 * sigma**2 / FS
    assert n0 == pytest.approx(want, rel=0.3)


def test_window_clamped_at_band_edges():
    rng = np.random.default_rng(2)
    x = (1e-3 * rng.normal(size=3 * 4800)).astype(np.float32)
    cfg, F = _spectrum(x)
    # channel near DC: window must clamp, not wrap
    shifts = jnp.array([5, cfg.N // 2 - 5], jnp.int32)
    e = gather_noise_bins(F, shifts, 1000, cfg.real, cfg.N)
    n0 = estimate_noise(e, cfg.bins, FS)
    assert np.all(np.isfinite(np.asarray(n0)))
    assert np.all(np.asarray(n0) > 0)


def test_quantile_selection_matches_full_sort():
    """estimate_noise's bisection-selected order statistics must be
    bit-identical to a full sort (only the quantile VALUES are read, so
    ties are irrelevant; non-negative f32 bitcast to int32 is monotone)."""
    from ka9q_radio_tpu.ops.noise import NQ, N_CUTOFF, noise_correction

    def sort_reference(energies, master_bins, samprate):
        nbins = energies.shape[-1]
        srt = jnp.sort(energies, axis=-1)
        pos = NQ * (nbins - 1)
        i = int(np.floor(pos))
        frac = pos - i
        q = srt[..., i] * (1.0 - frac) + srt[..., min(i + 1, nbins - 1)] * frac
        thresh = N_CUTOFF * q
        mask = energies <= thresh[..., None]
        count = jnp.maximum(jnp.sum(mask, axis=-1), 1)
        mean = jnp.sum(jnp.where(mask, energies, 0.0), axis=-1) / count
        return (mean * noise_correction() / (float(master_bins) * float(samprate))).astype(jnp.float32)

    rng = np.random.default_rng(7)
    for C, W in [(16, 1000), (3, 300), (2, 11), (1, 5)]:
        e = rng.exponential(1e-7, (C, W)).astype(np.float32)
        e[0, : min(3, W)] = 0.0  # ties at the bottom
        a = np.asarray(estimate_noise(jnp.asarray(e), 1_620_001, 129.6e6))
        b = np.asarray(sort_reference(jnp.asarray(e), 1_620_001, 129.6e6))
        np.testing.assert_array_equal(a, b)


def test_chunked_equals_unchunked_bitexact(monkeypatch):
    """The VMEM-chunked path (C > _EST_CHUNK: sequential lax.map over row
    chunks) adds NOTHING numerically: each row's order statistics are found
    by integer bisection (exact, order-independent), so the only tolerance
    is the truncated-mean row SUM, whose accumulation order XLA tiles by
    program shape — bounded here at 1 ulp, across four C (pad and
    exact-multiple cases). The pad rows (all-zero) must not leak into any
    real row."""
    import ka9q_radio_tpu.ops.noise as noise_mod

    rng = np.random.default_rng(11)
    CH = 2048
    for C in (2049, 3000, 4096, 5000):  # exact multiple + pad cases
        e = jnp.asarray(rng.exponential(1e-7, (C, 1024)).astype(np.float32))
        monkeypatch.setattr(noise_mod, "_EST_CHUNK", 1 << 30)
        plain = np.asarray(estimate_noise(e, 1_620_001, 129.6e6))
        monkeypatch.setattr(noise_mod, "_EST_CHUNK", CH)
        chunked = np.asarray(estimate_noise(e, 1_620_001, 129.6e6))
        assert chunked.shape == (C,)
        # 1-ulp equality with the single-shot program (row sums only)
        np.testing.assert_allclose(chunked, plain, rtol=1.5e-7)
        # the SELECTED quantile thresholds are exact: verify the bins kept
        # per row agree with a float32 numpy sort reference exactly
        en = np.asarray(e)
        srt = np.sort(en, axis=-1)
        pos = NQ * (en.shape[-1] - 1)
        i, frac = int(np.floor(pos)), np.float32(pos - int(np.floor(pos)))
        q = (srt[:, i] * (np.float32(1) - frac) + srt[:, i + 1] * frac).astype(np.float32)
        mask = en <= (np.float32(N_CUTOFF) * q)[:, None]
        cnt = np.maximum(mask.sum(-1), 1)
        want = (mask * en.astype(np.float64)).sum(-1) / cnt * noise_correction() / (1_620_001 * 129.6e6)
        # f32 row-sum vs f64: a few ulps; a mis-selected quantile/mask
        # would show as percent-level error, so 1e-6 still pins selection
        np.testing.assert_allclose(chunked, want, rtol=1e-6)


def test_radiod_group_beyond_chunk_size():
    """Radiod end-to-end with a single >2048-channel group: exercises the
    chunked estimator inside the real jitted step (the flagship bench's
    hot path at 16k-200k channels runs exactly this code)."""
    from ka9q_radio_tpu.config.loader import load_config
    from ka9q_radio_tpu.runtime.radiod import Radiod

    conf = """
[global]
hardware = gen
status = 127.0.0.1
data = 127.0.0.1
mode = usb

[gen]
device = sig_gen
samprate = 2m048
complex = yes
carrier = 300k
amplitude = -20
noise = -60

[wall]
demod = am
samprate = 12k
low = -5k
high = 5k
raster = -950k 949k 900.0
"""
    rd = Radiod(load_config(conf), use_network=False)
    (gname, g), = rd.engine.groups.items()
    assert g.C > 2048, g.C  # must cross the chunk boundary
    for _ in range(3):
        out = rd.step_block()
    aud = np.asarray(out[gname]["audio"])
    assert np.all(np.isfinite(aud))
    n0 = np.asarray(out[gname]["info"]["n0"])
    assert n0.shape[-1] == g.C and np.all(np.isfinite(n0)) and np.all(n0 > 0)
    # N0 of the -60 dBFS/...-scaled gaussian noise: all channels see the
    # same floor -> the spread across channels should be tight
    med = np.median(n0)
    assert np.all(np.abs(10 * np.log10(n0 / med)) < 3.0)
