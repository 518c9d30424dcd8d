"""Quantile-based noise-floor (N0) estimation.

TPU realization of the reference's estimate_noise (radio.c:1821-1904, spec
in the long comment at radio.c:1690-1755): take the energies of master FFT
bins around each channel, find the 10% quantile, average the bins below
1.5x that quantile (hopefully noise-only), and apply the exact
exponential-distribution correction factor for the truncated mean.

The reference quickselects per channel per block on a CPU thread; here the
whole channel group needs only the NQ-quantile VALUE — order statistics
i and i+1 (i = floor(NQ*(nbins-1))) — not a sorted prefix. Non-negative
f32 energies bitcast to int32 order identically, so each order statistic
is found EXACTLY by a 31-step binary search on the key space counting
`keys <= mid` per row: measured 0.067 ms vs 0.343 ms for `lax.top_k`
(which lowers to a bitonic value+index sort) on the flagship [1000, 1024]
shape — 5x, bit-identical to a full sort. The result feeds
squelch/AGC/SNR exactly as in the reference.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["NQ", "N_CUTOFF", "POWER_ALPHA", "MIN_NOISE_BINS", "noise_correction", "estimate_noise", "gather_noise_bins"]

NQ = 0.10  # quantile assumed noise-only (radio.c:74)
_TILE = 128  # noise-window gather granularity (TPU lane width)
N_CUTOFF = 1.5  # averaging threshold multiplier (radio.c:75)
POWER_ALPHA = 0.10  # per-block EMA smoothing of N0 (radio.c:73)
MIN_NOISE_BINS = 1000  # widen the window for narrow channels (radio.c:77)


def noise_correction(q: float = NQ, cutoff: float = N_CUTOFF) -> float:
    """Unbiasing factor for the truncated exponential mean (radio.c:1878-1882)."""
    z = cutoff * (-np.log(1.0 - q))
    return float(1.0 / (1.0 - z * np.exp(-z) / (1.0 - np.exp(-z))))


def gather_noise_bins(F, shifts, nbins: int, real_master: bool, master_N: int,
                      inputs=None):
    """Gather the noise-estimation window of master bins per channel.

    Matches radio.c:1845-1872: a window of `nbins` bins centered on the
    channel, clamped to stay inside [DC, Nyquist] for real masters, circular
    (stopping at the positive Nyquist edge) for complex masters.

    F may be [B, m_bins] (multi-front-end) with `inputs` [C] selecting each
    channel's stream — the per-input offset folds into the row index.

    Returns [C, nbins] float32 bin energies |F|^2.
    """
    # square the WHOLE master once, then gather f32 energies: half the
    # gather bytes, and the |F|^2 computation is shared across all groups
    # reading the same master (XLA CSEs the identical expression)
    E = (F.real * F.real + F.imag * F.imag).astype(jnp.float32)
    m_bins = master_N // 2 + 1 if real_master else master_N
    multi = F.ndim == 2
    off = np.asarray(inputs, np.int32)[:, None] if multi else np.int32(0)

    # Tile-aligned windows: the windows are contiguous runs, so gathering
    # whole _TILE-bin rows (one gather of [C, ntiles] row indices with
    # 128-wide slices) is ~an order of magnitude faster on TPU than a
    # [C, nbins] per-element gather. The window start shifts down by up to
    # _TILE-1 bins and the length rounds up to a tile multiple — immaterial
    # to the estimator (the reference's window placement is itself a
    # heuristic "~nbins around the channel", radio.c:1845-1872).
    T = _TILE
    ntiles = -(-nbins // T)
    if real_master and m_bins >= ntiles * T:
        pad = (-m_bins) % T
        rows = (jnp.pad(E, ((0, 0), (0, pad))) if multi
                else jnp.pad(E, (0, pad))).reshape(-1, T)
        nrows = (m_bins + pad) // T
        lo = jnp.abs(shifts) - (ntiles * T) // 2
        lo_t = jnp.clip(lo, 0, m_bins - ntiles * T) // T  # window never enters the pad
        tidx = lo_t[:, None] + jnp.arange(ntiles, dtype=jnp.int32)[None, :] + off * nrows
        return rows[tidx].reshape(shifts.shape[0], ntiles * T)
    if not real_master and m_bins % T == 0 and m_bins >= ntiles * T:
        rows = E.reshape(-1, T)
        # clamp inside the signed band (stop at the Nyquist edge like the
        # reference, radio.c:1869-1875), then wrap through DC via mod
        lo = jnp.clip(shifts - (ntiles * T) // 2,
                      -(m_bins // 2), (m_bins - 1) // 2 - (ntiles * T - 1))
        lo_t = jnp.floor_divide(lo, T)
        tidx = jnp.mod(lo_t[:, None] + jnp.arange(ntiles, dtype=jnp.int32)[None, :],
                       m_bins // T) + off * (m_bins // T)
        return rows[tidx].reshape(shifts.shape[0], ntiles * T)

    # fallback: per-element gather (small/odd masters)
    k = jnp.arange(nbins, dtype=jnp.int32)[None, :]
    Ef = E.reshape(-1) if multi else E
    if real_master:
        lo = jnp.abs(shifts) - nbins // 2
        lo = jnp.clip(lo, 0, max(m_bins - nbins, 0))[:, None]
        return Ef[jnp.clip(lo + k, 0, m_bins - 1) + off * m_bins]
    lo = jnp.clip(shifts - nbins // 2, -(m_bins // 2), (m_bins - 1) // 2 - (nbins - 1))[:, None]
    return Ef[jnp.mod(lo + k, m_bins) + off * m_bins]


# rows per bisection chunk: keys [CHUNK, 1024] i32 = 8 MB stay VMEM-
# resident across all 31 count passes. Without chunking, a 32k-channel
# group's [C, 1024] keys re-read ~130 MB from HBM per pass (62 passes =
# ~8 GB/estimate, measured ~14 ms/block on v5e — THE channel-count
# scaling cliff past ~16k channels).
_EST_CHUNK = 2048


def estimate_noise(energies, master_bins: int, samprate: float):
    """N0 (power spectral density per Hz) per channel from bin energies.

    Args:
      energies: [C, nbins] master bin energies (from gather_noise_bins).
      master_bins: the master's bin count (N/2+1 real, N complex) — the
        reference normalizes by bins*samprate (radio.c:1901-1903).
      samprate: front-end input sample rate.

    Returns [C] float32 N0 estimates.
    """
    C = energies.shape[0] if energies.ndim > 1 else None
    if C is not None and C > _EST_CHUNK:
        # big groups: sequential VMEM-sized chunks (values identical —
        # each row's statistic only reads that row)
        pad = (-C) % _EST_CHUNK
        e = jnp.pad(energies, ((0, pad), (0, 0)))
        e = e.reshape(-1, _EST_CHUNK, energies.shape[-1])
        out = jax.lax.map(
            lambda ch: estimate_noise(ch, master_bins, samprate), e)
        return out.reshape(-1)[:C]
    nbins = energies.shape[-1]
    # linear-interpolated NQ quantile (radio.c quantile()) from order
    # statistics i and i+1 only, each found exactly by binary search on
    # the bitcast int32 key space (see module docstring)
    pos = NQ * (nbins - 1)
    i = int(np.floor(pos))
    frac = pos - i
    keys = jax.lax.bitcast_convert_type(energies, jnp.int32)

    def kth_smallest_key(kk: int):
        """Exact 0-indexed kk-th order statistic per row: the smallest key
        v with count(keys <= v) >= kk+1. 31 steps cover [0, 2^31-1]."""

        def step(c, _):
            lo, hi = c
            mid = lo + ((hi - lo) >> 1)  # overflow-safe midpoint
            cnt = jnp.sum((keys <= mid[..., None]).astype(jnp.int32), axis=-1)
            take_lo = cnt >= (kk + 1)
            return (jnp.where(take_lo, lo, mid + 1), jnp.where(take_lo, mid, hi)), None

        lo0 = jnp.zeros(keys.shape[:-1], jnp.int32)
        hi0 = jnp.full(keys.shape[:-1], np.int32(2**31 - 1))
        (lo, _), _ = jax.lax.scan(step, (lo0, hi0), None, length=31)
        return lo

    vi = kth_smallest_key(i)
    if min(i + 1, nbins - 1) == i:
        v_i1 = vi
    else:
        # the (i+1)-th statistic follows from the i-th in TWO data passes
        # instead of a second 31-pass bisection (the stage runs at the
        # VPU compare roofline — this halves it): if the i-th key's tie
        # group extends past rank i+1 it IS the next statistic, otherwise
        # the next statistic is the smallest key strictly above it. Both
        # rules are exactly kth_smallest_key(i+1)'s definition (smallest
        # v with count(<= v) >= i+2), bit for bit.
        cnt_le = jnp.sum((keys <= vi[..., None]).astype(jnp.int32), axis=-1)
        bigger = jnp.where(keys > vi[..., None], keys, np.int32(2**31 - 1))
        vnext = jnp.min(bigger, axis=-1)
        v_i1 = jnp.where(cnt_le >= i + 2, vi, vnext)
    q = (jax.lax.bitcast_convert_type(vi, jnp.float32) * (1.0 - frac)
         + jax.lax.bitcast_convert_type(v_i1, jnp.float32) * frac)
    thresh = N_CUTOFF * q
    mask = energies <= thresh[..., None]
    count = jnp.maximum(jnp.sum(mask, axis=-1), 1)
    mean = jnp.sum(jnp.where(mask, energies, 0.0), axis=-1) / count
    # float() so the bins*rate product stays a Python float: as an int it
    # can exceed int32 range and jax (x64 off) rejects the weak-typed scalar
    return (mean * noise_correction() / (float(master_bins) * float(samprate))).astype(jnp.float32)
