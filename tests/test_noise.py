"""Quantile noise-floor estimator tests (radio.c:1690-1904 behavior)."""
import numpy as np
import jax.numpy as jnp
import pytest

from ka9q_radio_tpu.ops.filterbank import MasterConfig, master_init, master_fft, compute_tuning
from ka9q_radio_tpu.ops.noise import gather_noise_bins, estimate_noise, noise_correction

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
