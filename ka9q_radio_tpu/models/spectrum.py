"""Spectrum-analysis pseudo-demodulator (spectrum.c).

Narrowband algorithm (spectrum.c:128-315): the channel's downconverted
baseband is kept in a rolling context, windowed complex FFTs of size
fft_n = samprate/rbw are taken with configurable overlap, and their bin
powers averaged. The wideband raw-A/D algorithm (spectrum.c:317-531, used
when rbw > the block rate) is served by the same code pointed at a raw-rate
"iq" slice; a dedicated raw-ring path can come later.

TPU-native differences:
  * The reference computes spectra lazily when a poll arrives; here the
    frame schedule is static — `frames_per_block = olen // hop` windowed
    FFTs per 20 ms block, batched over channels — and polls read the
    continuously-maintained average. The per-block FFT work is tiny next to
    the master FFT.
  * Averaging is a per-frame EMA with alpha = 1/fft_avg, the streaming
    equivalent of the reference's boxcar of `fft_avg` FFTs (modes.c:73).

Bin powers are kept lowest-frequency-first internally, centered on the
channel tuning, scaled so a full-scale (amplitude 1.0) carrier centered in
a bin reads 1.0 (0 dBFS). The radiod status layer rotates to FFT order for
the BIN_DATA wire key (powers.c expects FFT order; the v2 byte format is
most-negative-first, which matches this internal order directly).

Window menu matches window.h:17-28 via ops/windows.py (default Kaiser
beta=7, modes.c:71).
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.windows import make_window, window_noise_bandwidth

__all__ = ["SpectrumGeometry", "spectrum_geometry", "spectrum_init", "spectrum_accumulate"]


@dataclasses.dataclass(frozen=True)
class SpectrumGeometry:
    samprate: int  # baseband rate the FFTs run at
    olen: int  # baseband samples per block
    fft_n: int
    hop: int  # samples between frame starts (fft_n*(1-overlap))
    bin_count: int
    fft_avg: int
    window: np.ndarray  # [fft_n] float32, fft_avg'd power normalization baked

    @property
    def frames_per_block(self) -> int:
        return self.olen // self.hop

    @property
    def carry(self) -> int:
        """Samples carried between blocks (frame context)."""
        return self.fft_n - self.hop

    @property
    def rbw(self) -> float:
        return self.samprate / self.fft_n

    @property
    def noise_bw(self) -> float:
        """Window equivalent noise bandwidth, Hz (spectrum.c:608-614)."""
        return window_noise_bandwidth(self.window) * self.rbw


def spectrum_geometry(
    samprate: int,
    olen: int,
    bin_bw: float,
    bin_count: int,
    window: str = "kaiser",
    window_param: float = 7.0,
    fft_avg: int = 10,
    overlap: float = 0.0,
) -> SpectrumGeometry:
    """Size the frame schedule. fft_n is rounded so hop divides olen evenly
    (the static-schedule analog of the reference's clean-rate rounding)."""
    fft_n = max(int(round(samprate / bin_bw)), bin_count)
    frac = max(1.0 - overlap, 1.0 / 8)
    hop = max(int(round(fft_n * frac)), 1)
    # round hop to a divisor of olen so every block runs the same frame count
    divisors = [d for d in range(1, olen + 1) if olen % d == 0]
    hop = min(divisors, key=lambda d: abs(d - hop))
    fft_n = max(int(round(hop / frac)), bin_count)
    w = make_window(window, fft_n, window_param).astype(np.float64)
    w = w / w.sum()  # unit coherent gain: full-scale carrier in-bin -> 1.0
    return SpectrumGeometry(
        samprate=samprate, olen=olen, fft_n=fft_n, hop=hop,
        bin_count=bin_count, fft_avg=fft_avg, window=w.astype(np.float32),
    )


def spectrum_init(C: int, geo: SpectrumGeometry):
    return {
        "carry": jnp.zeros((C, geo.carry), jnp.complex64),
        "power": jnp.zeros((C, geo.bin_count), jnp.float32),
        "frames": jnp.zeros((), jnp.int32),
    }


def spectrum_accumulate(state, bb, geo: SpectrumGeometry):
    """Fold one block of baseband into the running bin-power average.

    bb: [C, olen] complex64. Returns (new_state, bin_power [C, bin_count]).
    """
    C, olen = bb.shape
    data = jnp.concatenate([state["carry"], bb], axis=1)  # [C, carry+olen]
    nf = geo.frames_per_block
    frames = jnp.stack([data[:, k * geo.hop : k * geo.hop + geo.fft_n] for k in range(nf)], axis=1)
    w = jnp.asarray(geo.window)
    X = jnp.fft.fft(frames * w[None, None, :], axis=-1)  # [C, nf, fft_n]
    # centered bin slice, lowest frequency first
    bc = geo.bin_count
    idx = (np.arange(bc) - bc // 2) % geo.fft_n
    p = X.real**2 + X.imag**2
    pwr_frames = p[:, :, idx]  # [C, nf, bc]

    pwr, nframes = _fold_frames(state["power"], state["frames"],
                                jnp.swapaxes(pwr_frames, 0, 1), geo.fft_avg)
    new_state = {"carry": data[:, olen:], "power": pwr, "frames": nframes}
    return new_state, pwr


def _fold_frames(power, nstart, p, fft_avg: int):
    """Streaming per-frame average: the first fft_avg frames fill a
    boxcar, then an EMA with alpha = 1/fft_avg (spectrum.c's smoothing).

    p: [nf, ...] frame powers (frame axis leading). Steady state uses
    the CLOSED FORM of nf EMA steps — one weighted reduction over the
    frame axis instead of a sequential nf-step scan (the scan's fixed
    per-step cost dominated the armed-sweep block time; the weighted
    sum also parallelizes over sharded frames on a mesh). Warm-up
    blocks (any frame still inside the boxcar) keep the exact scan.
    Returns (power', nstart + nf)."""
    nf = p.shape[0]
    alpha = np.float32(1.0 / fft_avg)

    def warm(pw):
        def fold(acc, frame_pwr):
            pw_, n = acc
            a = jnp.where(n < fft_avg, 1.0 / (n.astype(jnp.float32) + 1.0), alpha)
            return (pw_ + a * (frame_pwr - pw_), n + 1), None

        (out, _), _ = jax.lax.scan(fold, (pw, nstart), p)
        return out

    def steady(pw):
        # pw' = (1-a)^nf pw + sum_k a (1-a)^(nf-1-k) p_k  — exact EMA
        wts = alpha * (1.0 - alpha) ** np.arange(nf - 1, -1, -1, dtype=np.float64)
        decay = np.float32((1.0 - alpha) ** nf)
        return pw * decay + jnp.tensordot(
            jnp.asarray(wts, jnp.float32), p, axes=(0, 0))

    pwr = jax.lax.cond(nstart >= fft_avg, steady, warm, power)
    return pwr, nstart + nf


# ---------------------------------------------------------------------------
# Wideband algorithm (spectrum.c:317-531): windowed FFTs straight off the
# raw A/D stream, used when the resolution bandwidth is coarser than the
# crossover (default 200 Hz, modes.c:69) so the analysis FFT is SMALL.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class WideGeometry:
    samprate: float  # raw front-end rate
    L: int  # master block (samples per engine step)
    real: bool
    fft_n: int
    hop: int
    fft_avg: int
    window: np.ndarray
    # MXU matmul-cascade plan for the analysis FFT (ops.filterbank
    # split_fft_mxu): at RX888 scale the per-block analysis work
    # (frames_per_block x fft_n points) rivals the master transform
    # itself, and the VPU's batched FFT kernels hit the same ~ms floor
    # there — so the same cascade lowering applies
    mxu: "tuple[int, ...] | None" = None
    # cascade accuracy tier (filterbank.FFT_PRECISIONS), inherited from
    # the engine's fft-precision setting
    fft_precision: str = "high"

    @property
    def frames_per_block(self) -> int:
        return self.L // self.hop

    @property
    def carry(self) -> int:
        return self.fft_n - self.hop if self.fft_n > self.hop else 0

    @property
    def bins(self) -> int:
        return self.fft_n // 2 + 1 if self.real else self.fft_n

    @property
    def rbw(self) -> float:
        return self.samprate / self.fft_n

    @property
    def noise_bw(self) -> float:
        """Window equivalent noise bandwidth, Hz (spectrum.c:608-614)."""
        return window_noise_bandwidth(self.window) * self.rbw


def wide_geometry(
    samprate: float,
    L: int,
    real: bool,
    bin_bw: float,
    window: str = "kaiser",
    window_param: float = 7.0,
    fft_avg: int = 10,
    overlap: float = 0.0,
    fft_precision: str = "high",
) -> WideGeometry:
    fft_n = max(int(round(samprate / bin_bw)), 8)
    frac = max(1.0 - overlap, 1.0 / 8)
    hop = max(int(round(fft_n * frac)), 1)
    divisors = [d for d in (range(1, 4097)) if L % d == 0]
    # hop must divide L for a static frame schedule; fft_n rescaled to match
    hop = min((d for d in divisors), key=lambda d: abs(d - hop)) if hop <= 4096 else hop
    if L % hop:
        for d in range(hop, 0, -1):
            if L % d == 0:
                hop = d
                break
    fft_n = max(int(round(hop / frac)), 8)
    w = make_window(window, fft_n, window_param).astype(np.float64)
    w = w / w.sum()
    mxu = None
    if (L // hop) * fft_n >= _WIDE_MXU_MIN_POINTS:
        from ..ops.filterbank import plan_split_mxu

        mxu = plan_split_mxu(fft_n, real)
    return WideGeometry(samprate=samprate, L=L, real=real, fft_n=fft_n,
                        hop=hop, fft_avg=fft_avg, window=w.astype(np.float32),
                        mxu=mxu, fft_precision=fft_precision)


# below this many analysis points per block, XLA's batched FFT is fine
# (and bit-stability with the historical path is preserved); the threshold
# matches filterbank._SPLIT_MIN_N where the VPU FFT floor was measured
_WIDE_MXU_MIN_POINTS = 1 << 18


def wide_init(geo: WideGeometry):
    dtype = jnp.float32 if geo.real else jnp.complex64
    return {
        "carry": jnp.zeros((geo.carry,), dtype),
        "power": jnp.zeros((geo.bins,), jnp.float32),
        "frames": jnp.zeros((), jnp.int32),
    }


def wide_accumulate(state, block, geo: WideGeometry, mesh=None, axis: str = "c"):
    """Fold one raw input block into the wideband average. Returns
    (new_state, power [bins]) in raw FFT bin order. mesh/axis: under a
    sharded master, constrain the frame stack P(axis, None) so each
    device FFTs its own frame subset (divides the GSPMD resharding
    traffic of the armed sweep by D — docs/SCALING.md ablation)."""
    data = jnp.concatenate([state["carry"], block]) if geo.carry else block
    nf = geo.frames_per_block
    frames = jnp.stack([data[k * geo.hop : k * geo.hop + geo.fft_n] for k in range(nf)])
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        frames = jax.lax.with_sharding_constraint(
            frames, NamedSharding(mesh, P(axis, None)))
    w = jnp.asarray(geo.window)
    if geo.mxu is not None:
        from ..ops.filterbank import split_fft_mxu

        X = split_fft_mxu(frames * w, geo.mxu, geo.bins if geo.real else None,
                          geo.fft_precision)
        X = X[..., : geo.bins]
    else:
        X = jnp.fft.rfft(frames * w, axis=-1) if geo.real else jnp.fft.fft(frames * w, axis=-1)
    p = (X.real**2 + X.imag**2)
    if geo.real:
        p = p * 2.0  # one-sided spectrum carries half the energy (spectrum.c)

    pwr, nfr = _fold_frames(state["power"], state["frames"], p, geo.fft_avg)
    new_state = {"power": pwr, "frames": nfr}
    if geo.carry:
        new_state["carry"] = data[geo.L :]
    else:
        new_state["carry"] = state["carry"]
    return new_state, pwr


def wide_extract(power, shifts, master_N: int, geo: WideGeometry, bin_count: int):
    """Per-channel slice of the shared wideband average.

    shifts: [C] master-FFT bin shifts; scaled down to analysis bins like
    spectrum.c:359 (shift * fft_n / master_points). Output lowest
    frequency first, [C, bin_count].
    """
    # shift*fft_n overflows int32 at RX888 sizes and int64 is unavailable
    # without x64; the f32 product is exact enough (<0.2 bin) for display
    scaled = jnp.rint(shifts.astype(jnp.float32) * np.float32(geo.fft_n / master_N)).astype(jnp.int32)
    k = jnp.arange(bin_count, dtype=jnp.int32)[None, :] - bin_count // 2
    idx = scaled[:, None] + k
    if geo.real:
        m = geo.bins
        mi = jnp.abs(idx)
        valid = mi < m
        return jnp.where(valid, power[jnp.clip(mi, 0, m - 1)], 0.0)
    return power[jnp.mod(idx, geo.fft_n)]
