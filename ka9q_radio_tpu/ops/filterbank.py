"""Overlap-save fast-convolution filter bank — the heart of the framework.

TPU-native redesign of the reference's filter.c (the Borgerding
"overlap-save as a multiband mixing, downsampling filter bank"): ONE shared
forward FFT over each wideband input block feeds every receiver channel; each
channel gathers a slice of master bins (integer-bin coarse tuning), multiplies
by its own frequency response, batch-IFFTs at its own (smaller) output size,
discards the contaminated overlap, and applies a fine-tune phase ramp.

Differences from the C design, deliberately TPU-first:
  * No ring buffers / worker pools / condition variables: the master state is
    an (M-1)-sample tail carried functionally through a jitted step
    (filter.c's mirror ring + 4-deep job queue become XLA's async dispatch
    pipeline; see SURVEY.md §2.5 P2/P5).
  * Channels are a *batch axis*, not threads: one gather + one complex
    multiply + one batched IFFT serves a whole rate-class group of channels
    ([C, n_bins] tensors). Sharding the C axis across chips is the scale-out
    path (parallel/).
  * Phase bookkeeping is Q32 fixed-point revolutions (ops/osc.py) so the
    fine-tune NCO and the Renfors block-phase adjustment stay exact across
    unbounded blocks in f32-land.

Bin-slice semantics match filter.c:695-860 (all four real/complex cases,
upright and inverted spectra) and were validated against carrier-to-DC
golden tests.
"""
from __future__ import annotations

import dataclasses
from fractions import Fraction

import numpy as np
import jax
import jax.numpy as jnp

from .osc import phase_ramp_q32

__all__ = [
    "MasterConfig",
    "master_init",
    "master_fft",
    "master_transform",
    "split_fft",
    "split_fft_mxu",
    "plan_split_single",
    "plan_split_mxu",
    "gather_bins",
    "channelize",
    "finish_channelize",
    "fine_tune",
    "compute_tuning",
    "block_phase_adjust_q32",
    "shift_change_adjust_rev",
    "good_blocksize",
]


@dataclasses.dataclass(frozen=True)
class MasterConfig:
    """Geometry of the shared master forward FFT (filter.c:156-301).

    L: new samples consumed per block (ilen = samprate * blocktime)
    M: impulse-response length; M-1 samples of context carried between blocks
    real: True for real A/D streams (rx888 etc.), False for complex IQ
    split: (n1, n2) four-step Cooley-Tukey plan for the forward transform,
        or None for XLA's monolithic FFT. On TPU the monolithic kernel
        collapses at radiod sizes (measured 275 ms for the N=3,240,000
        rof3240000 transform on v5e vs 6 ms for the same transform as
        batched 1800-point FFTs + twiddle + transpose — a 45x difference),
        so from_rate() plans a split automatically for large N. The split
        transform is the single-device form of parallel/fft.py's six-step;
        the reference hits the same wall and solves it with FFTW wisdom
        (docs/FFTW3.md:4-7,57-61).
    """

    L: int
    M: int
    real: bool = True
    split: "tuple[int, int] | None" = None
    # multi-factor MXU matmul cascade (split_fft_mxu); preferred over
    # `split` when set — measured 1.2 ms vs 5.3 ms for the N=3.24M
    # rof3240000-equivalent transform on v5e.
    # (A packed even/odd half-length rfft variant was measured and REJECTED
    # on v5e at N=3.24M: half-length cascade 0.469 + Hermitian unpack pass
    # 0.113 = 0.58 ms vs 0.494 ms for this full-length form, whose
    # out_bins column-halving of the final stage plus the f32-operand
    # first stage already capture the real-input saving without the extra
    # unpack/de-interleave passes.)
    mxu: "tuple[int, ...] | None" = None
    # cascade accuracy tier (FFT_PRECISIONS key; `fft-precision` config
    # key): "high" = bf16x3, a measured -95 dBc artifact floor at 25%
    # less time than "exact" (bf16x6 = full f32); see the table above
    fft_precision: str = "high"

    @property
    def N(self) -> int:
        return self.L + self.M - 1

    @property
    def bins(self) -> int:
        """Number of master frequency bins (N/2+1 for real, N for complex)."""
        return self.N // 2 + 1 if self.real else self.N

    @property
    def overlap(self) -> int:
        """Overlap factor V = N/(M-1) (5 for the default 20%% overlap)."""
        return 1 + self.L // (self.M - 1)

    @classmethod
    def from_rate(cls, samprate: float, blocktime: float = 0.02, overlap: int = 5, real: bool = True,
                  fft: str = "auto", fft_precision: str = "high"):
        """Size L, M from sample rate and block time (radio.c:644-652).

        fft: "auto" plans the MXU matmul cascade when it pays (large N),
        falling back to the four-step split; "mxu" forces the cascade,
        "split" forces the four-step, "monolithic" forces XLA's one-shot
        FFT (errors if a forced plan has no usable factorization).
        fft_precision: cascade accuracy tier, see FFT_PRECISIONS.
        """
        if fft_precision not in FFT_PRECISIONS:
            raise ValueError(
                f"fft_precision={fft_precision!r}: expected one of {sorted(FFT_PRECISIONS)}")
        L = int(round(samprate * blocktime))
        M = L // (overlap - 1) + 1
        N = L + M - 1
        split = mxu = None
        if fft == "auto":
            if N >= _SPLIT_MIN_N:
                mxu = plan_split_mxu(N, real)
                split = None if mxu else plan_split_single(N)
        elif fft == "mxu":
            mxu = plan_split_mxu(N, real)
            if mxu is None:
                raise ValueError(f"fft=mxu: N={N} has no small-factor decomposition")
        elif fft == "split":
            split = plan_split_single(N)
            if split is None:
                raise ValueError(f"fft=split: N={N} has no usable n1*n2 factorization")
        elif fft != "monolithic":
            raise ValueError(f"fft={fft!r}: expected auto|mxu|split|monolithic")
        return cls(L=L, M=M, real=real, split=split, mxu=mxu,
                   fft_precision=fft_precision)


# below this, XLA's monolithic FFT is fine and bit-stability with the
# historical path is preserved; above it, the MXU cascade / four-step
# split wins on TPU (see MasterConfig.split). Boundary measured on v5e:
# at N=192,000 (the WFM master) the cascade saves 0.24 ms/block in-engine
# (1.72 -> 1.48 ms); at N~128k the two are within measurement noise.
_SPLIT_MIN_N = 1 << 17


def plan_split_single(N: int) -> "tuple[int, int] | None":
    """Pick N = n1*n2 near-square for the single-device four-step FFT.

    None when no balanced factorization exists (prime-ish N) or when the
    twiddle exponent k1*b could exceed f32's exact-integer range 2^24
    (then the product k1*b, up to ~N, is no longer exact; a 3-factor
    decomposition would be needed — same bound as parallel.master).
    """
    if N >= 1 << 24:
        return None
    n1 = next((d for d in range(int(np.sqrt(N)), 0, -1) if N % d == 0), 1)
    n2 = N // n1
    if n1 < 32 or n2 // n1 > 64:
        return None  # too lopsided for the batched-FFT shape to help
    return (n1, n2)


def split_fft(z, n1: int, n2: int):
    """FFT_{n1*n2} over the last axis via the four-step (Bailey) algorithm.

    z: [..., n1*n2] complex64. View A[a, b] = z[a*n2 + b]; then
    X[k1 + n1*k2] = FFT_{n2,b}( W_N^{b*k1} * FFT_{n1,a}(A)[k1, b] )[k2],
    returned in natural order (one transpose). The batched n1/n2-point
    FFTs map onto the TPU far better than one giant kernel. k1*b < 2^24
    (guaranteed by plan_split_single) keeps the f32 twiddle phase exact;
    mod-N reduction keeps its magnitude small.
    """
    N = n1 * n2
    lead = z.shape[:-1]
    A = z.reshape(*lead, n1, n2)
    A1 = jnp.fft.fft(A, axis=-2)
    k1 = jnp.arange(n1, dtype=jnp.float32)[:, None]
    b = jnp.arange(n2, dtype=jnp.float32)[None, :]
    phase = jnp.mod(k1 * b, np.float32(N))
    tw = jnp.exp(np.complex64(-2j * np.pi / N) * phase).astype(jnp.complex64)
    C = jnp.fft.fft(A1 * tw, axis=-1)  # C[..., k1, k2]
    return jnp.swapaxes(C, -1, -2).reshape(*lead, N)


def dft_matrix_c64(n: int) -> np.ndarray:
    """[n, n] complex64 forward DFT matrix W_n^{ak} (host constant).

    Built with int64 index products mod n, so the phase is exact for any
    n (no f32 2^24 concern)."""
    a = np.arange(n, dtype=np.int64)[:, None]
    k = np.arange(n, dtype=np.int64)[None, :]
    return np.exp(-2j * np.pi * ((a * k) % n) / n).astype(np.complex64)


def _twiddle_c64(n1: int, m: int) -> np.ndarray:
    """[n1, m] complex64 four-step twiddle W_{n1*m}^{k1*b} (host, exact)."""
    N = n1 * m
    k1 = np.arange(n1, dtype=np.int64)[:, None]
    b = np.arange(m, dtype=np.int64)[None, :]
    return np.exp(-2j * np.pi / N * ((k1 * b) % N)).astype(np.complex64)


# MXU cascade accuracy/speed tiers. The MXU multiplies bf16 natively; a
# float32 operand is decomposed into bf16 passes: 6 for "exact" (full-f32),
# 3 for "high". Measured on v5e, N=3,240,000 real transform vs numpy f64
# (max relative error at the spectrum peak / ms per transform):
#   exact  (bf16x6)  6.0e-08   0.823 ms
#   high   (bf16x3)  1.7e-05   0.623 ms    <- default: a -95 dBc artifact
#                                             floor, below a 16-bit ADC's
#                                             SFDR and 3 orders inside the
#                                             0.1 dB reference parity bound
#   bf16   (bf16x1)  5.4e-04   0.561 ms
FFT_PRECISIONS = {
    "exact": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "bf16": jax.lax.Precision.DEFAULT,
}


def _dft_last(x, W: np.ndarray, precision=jax.lax.Precision.HIGHEST):
    """DFT along the last axis as one MXU matmul ([..., n] @ [n, n]).

    Even at HIGHEST (6-pass f32 decomposition) the MXU runs ~an order of
    magnitude above the VPU's f32 throughput. A float32 input (the real
    master's first stage) runs as two real matmuls — half the work of the
    complex product."""

    def dot(a, B):
        return jax.lax.dot_general(
            a, jnp.asarray(B), (((a.ndim - 1,), (0,)), ((), ())),
            precision=precision,
        )

    if x.dtype == jnp.float32:
        return jax.lax.complex(dot(x, np.ascontiguousarray(W.real)),
                               dot(x, np.ascontiguousarray(W.imag)))
    return dot(x, W).astype(jnp.complex64)


def split_fft_mxu(z, factors: "tuple[int, ...]", out_bins: "int | None" = None,
                  precision="exact"):
    """FFT_{prod(factors)} over the last axis, every stage an MXU matmul.

    Recursive four-step (split_fft) where each stage's batched DFT is a
    [..., n] @ [n, n] matmul against a host-built DFT matrix instead of a
    VPU FFT kernel: on TPU the MXU's f32-equivalent throughput (bf16x6
    passes) far exceeds the VPU's, so for the radiod-scale master
    transforms an O(N * sum(n_i)) matmul cascade beats the O(N log N)
    FFT kernels (measured: the N=3.24M rof3240000-equivalent transform
    drops from ~5.3 ms to ~1 ms/block on v5e). Twiddles/DFT matrices are
    exact host constants (int64 phase mod), so unlike split_fft there is
    no N < 2^24 plan bound from f32 twiddle phase.

    factors: 2-3 factors of N, each small enough that its [n, n] DFT
    matrix is a cheap resident constant (plan_split_mxu keeps n <= 512).

    out_bins: compute only a natural-order PREFIX of at least this many
    outputs (the caller slices exactly). Natural index k = k1 + n1*j, so a
    prefix of ceil(out_bins/n1) recursive outputs j covers it; pushed down
    the recursion, only the innermost DFT matrix narrows its columns —
    [n, n] -> [n, ~n/2] for the real master's N/2+1 bins, cutting the
    final (largest) stage's MXU flops and output HBM writes in half. The
    kept outputs are bit-identical to the full transform (the matrix
    columns are merely sliced, never recomputed).

    precision: a key of FFT_PRECISIONS ("exact"/"high"/"bf16") or a
    jax.lax.Precision; see the measured accuracy/speed table there.
    """
    if isinstance(precision, str):
        precision = FFT_PRECISIONS[precision]
    if len(factors) == 1:
        n = factors[0]
        W = dft_matrix_c64(n)
        if out_bins is not None and out_bins < n:
            W = np.ascontiguousarray(W[:, :out_bins])
        return _dft_last(z, W, precision)
    n1, rest = factors[0], factors[1:]
    m = int(np.prod(rest))
    lead = z.shape[:-1]
    A = z.reshape(*lead, n1, m)
    # DFT_{n1} over axis -2: move it last for the matmul (XLA folds the
    # transpose into the matmul operand layout)
    A1 = jnp.swapaxes(
        _dft_last(jnp.swapaxes(A, -1, -2), dft_matrix_c64(n1), precision), -1, -2)
    keep = None
    if out_bins is not None and out_bins < n1 * m:
        keep = min(m, -(-out_bins // n1))
    C = split_fft_mxu(A1 * jnp.asarray(_twiddle_c64(n1, m)), rest, keep, precision)
    return jnp.swapaxes(C, -1, -2).reshape(*lead, n1 * C.shape[-1])


_MXU_MAX_FACTOR = 512  # keep DFT-matrix constants small; pad waste bounded


def plan_split_mxu(N: int, real: bool = False) -> "tuple[int, ...] | None":
    """Factor N for split_fft_mxu, minimizing MXU cost.

    Cost model: stage flops scale with the factor PADDED to the 128 MXU
    lane width (a [B, n] x [n, n] matmul pads n up), so the score is
    sum(ceil(n_i/128)*128). Tries 3-factor then 2-factor decompositions
    with every factor in [8, _MXU_MAX_FACTOR]; returns None if N doesn't
    factor that way (then split_fft / monolithic handles it).

    real: the caller will pass out_bins=N//2+1 (real master), which
    narrows only the LAST factor's matrix to ~half its columns — so the
    last stage is costed at pad(ceil(bins/(N/n_last))) and the planner
    prefers putting a large factor last."""

    def pad(n):
        return -(-n // 128) * 128

    def score_of(fs):
        last = fs[-1]
        cols = -((N // 2 + 1) * last) // -N if real else last  # ceil(bins/(N/last))
        return sum(pad(f) for f in fs[:-1]) + pad(min(cols, last))

    best = None
    divs = [d for d in range(8, _MXU_MAX_FACTOR + 1) if N % d == 0]
    for n1 in divs:
        M1 = N // n1
        for n2 in divs:
            if M1 % n2:
                continue
            n3 = M1 // n2
            if not 8 <= n3 <= _MXU_MAX_FACTOR:
                continue
            # larger trailing factors keep the final transpose cheaper
            # (and for real masters the halved last stage favors a large
            # final factor); tie-break toward balanced, ascending factors
            fs = tuple(sorted((n1, n2, n3)))
            cand = (score_of(fs), fs)
            if best is None or cand < best:
                best = cand
    if best is None:
        for n1 in divs:
            n2 = N // n1
            if 8 <= n2 <= _MXU_MAX_FACTOR:
                fs = tuple(sorted((n1, n2)))
                cand = (score_of(fs), fs)
                if best is None or cand < best:
                    best = cand
    return best[1] if best else None


def master_transform(cfg: MasterConfig, x):
    """Forward transform of one assembled [..., N] window -> [..., bins]."""
    if cfg.mxu is not None:
        if x.ndim >= 2:
            # multi-front-end batches: a leading [B] axis makes the
            # cascade's inter-stage swapaxes materialize strided copies —
            # measured [8, 3.24M] at 12.2 ms vs 4.7 ms for 8 separate
            # transforms on v5e. Unroll the batch (the per-transform
            # programs are identical; XLA compiles the body once-ish and
            # the stack is one contiguous copy).
            return jnp.stack([master_transform(cfg, x[b])
                              for b in range(x.shape[0])])
        # MXU matmul cascade; the real master feeds f32 straight into the
        # first stage (two real matmuls) — no complex materialization —
        # and computes only a prefix covering the N/2+1 kept bins (the
        # final stage's DFT matrix is column-sliced to ~half width)
        F = split_fft_mxu(x, cfg.mxu, cfg.bins if cfg.real else None,
                          cfg.fft_precision)
        return F[..., : cfg.bins] if cfg.real else F
    if cfg.split is None:
        return (jnp.fft.rfft(x) if cfg.real else jnp.fft.fft(x)).astype(jnp.complex64)
    n1, n2 = cfg.split
    if cfg.real:
        # zero-imag complex four-step, keep the N/2+1 non-negative bins.
        # (The packed half-length rfft was measured SLOWER on v5e even
        # with a gather-free flip-based Hermitian unpack — 9.1 vs 7.1
        # ms/block at N=3.24M: the unpack's extra full-length passes cost
        # more HBM traffic than the halved transform saves.)
        F = split_fft(x.astype(jnp.complex64), n1, n2)
        return F[..., : cfg.bins]
    return split_fft(x, n1, n2)


def master_init(cfg: MasterConfig):
    """Fresh master state: the (M-1)-sample tail (zeros) and block counter."""
    dtype = jnp.float32 if cfg.real else jnp.complex64
    return {
        "tail": jnp.zeros(cfg.M - 1, dtype),
        "jobnum": jnp.zeros((), jnp.int32),
    }


def master_fft(cfg: MasterConfig, state, block):
    """Run the shared forward FFT over one input block.

    Args:
      cfg: master geometry.
      state: from master_init (carried).
      block: [L] float32 (real) or complex64 (complex) new samples.

    Returns:
      (new_state, F): F is [bins] complex64 master spectrum of the N-point
      window [previous M-1 samples | block].

    Batches over leading axes ([B, L] blocks with a [B, M-1] tail produce
    [B, bins] spectra — the multi-front-end engine's layout).
    """
    x = jnp.concatenate([state["tail"], block], axis=-1)
    F = master_transform(cfg, x)
    new_state = {
        "tail": x[..., cfg.L :],
        "jobnum": state["jobnum"] + 1,
    }
    return new_state, F


def _signed_bins(n_bins: int) -> jnp.ndarray:
    """Output bin index -> signed baseband frequency bin (FFT order)."""
    k = jnp.arange(n_bins, dtype=jnp.int32)
    return jnp.where(k < (n_bins + 1) // 2, k, k - n_bins)


def gather_bins(F, shifts, n_bins: int, real_master: bool, master_N: int,
                inputs=None):
    """Gather each channel's slice of master bins (pre-response).

    Implements the four cases of filter.c:695-860:
      real master, shift >= 0: upright positive spectrum, zero outside [0, Nm/2]
      real master, shift < 0:  inverted spectrum, conjugated (high-side LO)
      complex master:          circular slice with wraparound through DC

    Args:
      F: [m_bins] complex64 master spectrum — or [B, m_bins] for a
        multi-front-end engine, with `inputs` [C] selecting each channel's
        stream (one batched gather serves channels across ALL inputs; the
        per-input offset folds into the flat index).
      shifts: [C] int32 coarse-tuning bin shifts (positive shift brings a
        positive input frequency to DC).
      n_bins: channel FFT size (static).
      real_master / master_N: master geometry.

    Returns: [C, n_bins] complex64 gathered (unfiltered) bins, FFT order.
    """
    signed_k = _signed_bins(n_bins)[None, :]  # [1, n_bins]
    g = shifts[:, None] + signed_k  # [C, n_bins] master bin, signed
    if real_master:
        m_bins = master_N // 2 + 1
        inverted = (shifts < 0)[:, None]
        mi = jnp.where(inverted, -g, g)
        valid = (mi >= 0) & (mi < m_bins)
        idx = jnp.clip(mi, 0, m_bins - 1)
        if F.ndim == 2:
            vals = F.reshape(-1)[np.asarray(inputs, np.int32)[:, None] * m_bins + idx]
        else:
            vals = F[idx]
        vals = jnp.where(inverted, jnp.conj(vals), vals)
        return jnp.where(valid, vals, 0.0)
    else:
        # wrap through DC only; the slice must not cross the master Nyquist
        # boundary (filter.c's complex loop stops at (m_bins+1)/2 and zeros
        # the rest) — g is the true signed master frequency
        m_bins = master_N
        valid = (g >= -(m_bins // 2)) & (g <= (m_bins - 1) // 2)
        mi = jnp.mod(g, m_bins)
        if F.ndim == 2:
            vals = F.reshape(-1)[np.asarray(inputs, np.int32)[:, None] * m_bins + mi]
        else:
            vals = F[mi]
        return jnp.where(valid, vals, 0.0)


def channelize(F, responses, shifts, olen: int, real_master: bool, master_N: int, isb: bool = False,
               inputs=None):
    """Frequency-domain select+filter+decimate for a group of channels.

    Args:
      F: [m_bins] complex64 master spectrum.
      responses: [C, n_bins] complex64 channel responses (FFT bin order,
        from ops.filter_design — gain normalization baked in).
      shifts: [C] int32 bin shifts.
      olen: output samples per block (static; n_bins - olen = overlap
        discarded, filter.c:345,370).
      isb: independent-sideband mode — unpack LSB/USB into I/Q
        (filter.c:862-876).

    Returns: [C, olen] complex64 baseband blocks (before fine tuning).
    """
    n_bins = responses.shape[-1]
    fd = gather_bins(F, shifts, n_bins, real_master, master_N, inputs) * responses
    return finish_channelize(fd, olen, isb)


def finish_channelize(fd, olen: int, isb: bool = False):
    """Post-gather tail of the channelizer: optional ISB unpack, batched
    IFFT, overlap discard. Shared by the dense and distributed
    (parallel.master.DigitSpectrum) gather paths."""
    n_bins = fd.shape[-1]
    if isb:
        # pos' = pos + conj(neg); neg' = neg - conj(pos); DC = 0
        rev = jnp.flip(jnp.roll(fd, -1, axis=-1), axis=-1)  # bin -k for each k
        half = jnp.arange(n_bins)[None, :]
        is_pos = (half >= 1) & (half < n_bins // 2)
        is_neg = half > n_bins // 2
        fd = jnp.where(
            is_pos,
            fd + jnp.conj(rev),
            jnp.where(is_neg, fd - jnp.conj(rev), jnp.where(half == 0, 0.0, fd)),
        )
    bb = jnp.fft.ifft(fd, axis=-1)
    return bb[:, n_bins - olen :].astype(jnp.complex64)


# ---------------------------------------------------------------------------
# Tiled-matmul channelizer
#
# gather_bins() is a [C, n_bins] per-element gather — measured ~4.6 ms/block
# for 1000 channels on a 1.62M-bin master (v5e), the hottest stage after the
# split FFT fix. But every channel's slice is a CONTIGUOUS run of master
# bins, so instead:
#
#   1. gather whole _CTILE-bin tile rows covering each slice (one gather of
#      [C, ntiles] row indices with wide slices — near-free),
#   2. multiply a host-prepared PADDED response laid out in the tile frame
#      (the within-tile offset o_c is folded into the padding),
#   3. one [C, S] x [S, olen] complex matmul with a SHARED natural-order
#      IDFT matrix (MXU),
#   4. per-channel phase ramp e^{2pi i s_c t / n} correcting the offset
#      (s_c is an int param -> retunes stay pure data, no recompile), with
#      a conjugate select for inverted (negative-shift real-master) slices.
#
# Derivation: bb[t] = (1/n) sum_k F[shift+signed(k)] resp[k] e^{2pi i k t/n}
# with m = signed(k) + n//2 (natural order), F[lo+m] = cover[o+m]:
#   upright:  bb[t] = e^{-2pi i o t/n} * (cover .* rpad  @ E')[t]
#   inverted: bb[t] = conj((cover .* r~pad @ E')[t]) * e^{2pi i (o+c1-n//2)t/n}
# where E'[j, t] = e^{2pi i (j - n//2) t / n} / n, c1 = ceil(n/2)-1, and
# r~pad is the conjugated index-reversed response. Validity zeroing (slices
# poking past DC/Nyquist, filter.c:777-859) is baked into the padding.
# ---------------------------------------------------------------------------

_CTILE = 128  # channel-slice gather granularity (TPU lane width)


def tile_plan(n_bins: int) -> int:
    """Number of _CTILE rows covering an n_bins slice at any offset."""
    return -(-n_bins // _CTILE) + 1


def tiled_idft_matrix(n_bins: int, olen: int, S: int) -> np.ndarray:
    """[S, olen] natural-order IDFT producing the LAST olen samples.

    E'[j, t] = exp(2j pi (j - n//2) t / n) / n for t in [n-olen, n);
    rows j >= n are never touched (padding guarantees rpad[j] = 0 there
    only when the offset pushes them past the slice), but the matrix is
    defined for all j so one shared constant serves every offset.
    """
    j = np.arange(S, dtype=np.float64)[:, None]
    t = np.arange(n_bins - olen, n_bins, dtype=np.float64)[None, :]
    return (np.exp(2j * np.pi * ((j - n_bins // 2) * t % n_bins) / n_bins) / n_bins).astype(np.complex64)


def build_tile_params(responses: np.ndarray, shifts: np.ndarray, real_master: bool,
                      master_N: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side tile-frame layout of channel responses (numpy).

    responses: [C, n_bins] complex64 FFT-order responses.
    shifts: [C] int32 coarse bin shifts.
    Returns (resp_tiles [C, S] c64, tile_lo [C] i32, slope [C] i32): the
    padded responses (validity-zeroed, conj-reversed for inverted slices),
    each channel's first tile row, and the phase-ramp slope s_c.
    """
    C, n = responses.shape
    T = _CTILE
    S = tile_plan(n) * T
    m_bins = master_N // 2 + 1 if real_master else master_N
    n_rows = -(-m_bins // T) if real_master else m_bins // T
    resp_tiles = np.zeros((C, S), np.complex64)
    tile_lo = np.zeros(C, np.int32)
    slope = np.zeros(C, np.int32)
    m = np.arange(n)
    c1 = (n + 1) // 2 - 1  # ceil(n/2) - 1
    # natural-order response: resp_nat[m] = resp[(m - n//2) mod n]
    for c in range(C):
        sh = int(shifts[c])
        inverted = real_master and sh < 0
        if not inverted:
            lo = sh - n // 2
            vals = responses[c][(m - n // 2) % n]
            bins = lo + m
        else:
            lo = -sh - c1  # ascending window of the mirrored slice
            vals = np.conj(responses[c][(c1 - m) % n])
            bins = lo + m  # mirrored master bin index (>= 0 side)
        if real_master:
            valid = (bins >= 0) & (bins < m_bins)
        else:
            half = master_N // 2
            valid = (bins >= -half) & (bins <= (master_N - 1) // 2)
        lt = lo >> 7 if T == 128 else lo // T  # floor division
        if real_master:
            lt = min(max(lt, 0), max(n_rows - S // T, 0))
        o = lo - lt * T
        j = o + m
        ok = valid & (j >= 0) & (j < S)
        resp_tiles[c, j[ok]] = np.where(ok, vals, 0)[ok]
        tile_lo[c] = lt
        slope[c] = (o + c1 - n // 2) if inverted else -o
    return resp_tiles, tile_lo, slope


def tiled_channelize(F, resp_tiles, tile_lo, slope, shifts, E: np.ndarray,
                     n_bins: int, olen: int, real_master: bool, master_N: int,
                     inputs=None):
    """Device-side tiled channelizer (see module comment above).

    F: [m_bins] complex64 ([B, m_bins] multi-front-end, `inputs` [C] as in
    gather_bins — the per-input offset folds into the tile-row index);
    resp_tiles/tile_lo/slope from build_tile_params (as device params);
    E: numpy [S, olen] from tiled_idft_matrix (embedded constant).
    Returns [C, olen] complex64 == channelize(...) output.
    """
    T = _CTILE
    S = resp_tiles.shape[-1]
    ntiles = S // T
    m_bins = master_N // 2 + 1 if real_master else master_N
    multi = F.ndim == 2
    if real_master:
        pad = (-m_bins) % T
        rows = (jnp.pad(F, ((0, 0), (0, pad))) if multi
                else jnp.pad(F, (0, pad))).reshape(-1, T)
        nrows = (m_bins + pad) // T
        tidx = tile_lo[:, None] + jnp.arange(ntiles, dtype=jnp.int32)[None, :]
        tidx = jnp.clip(tidx, 0, nrows - 1)
    else:
        rows = F.reshape(-1, T)  # m_bins % T == 0 (caller-gated)
        nrows = m_bins // T
        tidx = jnp.mod(tile_lo[:, None] + jnp.arange(ntiles, dtype=jnp.int32)[None, :],
                       nrows)
    if multi:
        tidx = tidx + np.asarray(inputs, np.int32)[:, None] * nrows
    cover = rows[tidx].reshape(resp_tiles.shape[0], S)
    x = cover * resp_tiles
    if E is None:
        # Wideband slaves (WFM's 9,600-bin composite): the [S, olen] IDFT
        # matmul constant would be hundreds of MB, so instead exploit that
        # E'[j, t] is periodic in j with period n_bins: fold the padded
        # frame S -> n_bins (one short add), rotate by n//2 (natural ->
        # FFT order) and run ONE batched IFFT. Bit-equal to the matmul
        # form; measured 1.12 ms -> ~0.03 ms for the WFM gather+IDFT.
        n = n_bins
        y = x[:, :n].at[:, : S - n].add(x[:, n:])  # S - n <= n (caller-gated)
        y = jnp.roll(y, -(n // 2), axis=-1)
        Y = jnp.fft.ifft(y, axis=-1)[:, n - olen:].astype(jnp.complex64)
    else:
        Y = (x @ jnp.asarray(E)).astype(jnp.complex64)
    inverted = (shifts < 0)[:, None] if real_master else jnp.zeros((shifts.shape[0], 1), bool)
    Y = jnp.where(inverted, jnp.conj(Y), Y)
    t_abs = jnp.arange(n_bins - olen, n_bins, dtype=jnp.int32)[None, :]
    ph = jnp.mod(slope[:, None] * t_abs, np.int32(n_bins)).astype(jnp.float32)
    ramp = jnp.exp(np.complex64(2j * np.pi / n_bins) * ph).astype(jnp.complex64)
    return (Y * ramp).astype(jnp.complex64)


def idft_matrix(n_bins: int, olen: int) -> np.ndarray:
    """[n_bins, olen] complex64 IDFT matrix producing the LAST olen time
    samples (the overlap-save keep region, filter.c:345,370).

    Turns the per-channel slave IFFT into one [C, n_bins] x [n_bins, olen]
    complex matmul — MXU-friendly: XLA fuses the bin gather + response
    multiply into the matmul operands, and at typical slave sizes
    (150-1920 bins) the systolic array beats the vector-unit FFT.
    """
    k = np.arange(n_bins)[:, None]
    t = np.arange(n_bins - olen, n_bins)[None, :]
    return (np.exp(2j * np.pi * k * t / n_bins) / n_bins).astype(np.complex64)


def fine_tune(bb, acc_q32, inc_q32, adj_q32):
    """Apply per-channel fine-tuning NCO + block phase adjustment.

    bb: [C, olen] complex64; acc/inc/adj: [C] int32 Q32 revolutions.
    adj is the per-block Renfors eq.(12) phase rotation for bin shifts not
    divisible by the overlap factor (radio.c:1524-1541), pre-added to the
    accumulator each block.

    Returns (bb_tuned, new_acc).
    """
    acc = acc_q32 + adj_q32
    ramp, new_acc = phase_ramp_q32(acc, inc_q32, bb.shape[-1])
    return bb * ramp, new_acc


# ---------------------------------------------------------------------------
# Host-side tuning arithmetic (exact, Python ints / float64)
# ---------------------------------------------------------------------------


def compute_tuning(N: int, samprate: float, freq: float):
    """freq (Hz) -> (bin shift, remainder Hz, in_range) (radio.c:1216-1241).

    shift = lrint(freq/binwidth); remainder = freq - shift*binwidth.
    in_range is False when |shift| >= N/2 (outside front-end coverage).
    """
    hzperbin = samprate / N
    shift = int(round(freq / hzperbin))
    remainder = freq - shift * hzperbin
    return shift, remainder, abs(shift) < N // 2


def block_phase_adjust_q32(shift: int, L: int, N: int) -> np.int32:
    """Per-block phase rotation cancelling the slice phase advance.

    A carrier on master bin `shift` advances by shift*L/N revolutions per
    block hop; the canceling rotation is -(shift*L/N) mod 1, computed exactly
    with integer arithmetic (equivalent to radio.c:1529 cispi(2(shift%V)/V)
    when V | N).
    """
    q = ((-shift * L) % N) * (1 << 32) // N
    q &= 0xFFFFFFFF
    return np.int32(q - (1 << 32) if q >= (1 << 31) else q)


def shift_change_adjust_rev(delta_shift: int, L: int, M: int) -> float:
    """One-time phase adjustment when the bin shift changes (radio.c:1531):
    cispi(delta/(-2(V-1))) -> revolutions = -delta*(M-1)/(4*L)... expressed
    via the overlap factor V-1 = L/(M-1): rev = -delta / (4*(V-1))."""
    V1 = Fraction(L, M - 1)  # V - 1
    return float(Fraction(-delta_shift, 4) / V1)


def good_blocksize(x: int) -> int:
    """Round x up to a 2^a*3^b*5^c*7^d*{1|11|13} 'goodchoice' size
    (filter.c:421-430) — sizes XLA's mixed-radix FFT also handles well."""

    def ok(n: int) -> bool:
        for p in (2, 3, 5, 7):
            while n % p == 0:
                n //= p
        return n in (1, 11, 13)

    n = max(int(x), 1)
    while not ok(n):
        n += 1
    return n


def channelize_beam(F, responses, shifts, olen: int, master_N: int, alpha, beta,
                    inputs=None):
    """Dual-coherent-antenna beamforming channelizer (filter.c:723-742).

    Two real antenna streams ride the I and Q rails of one complex master
    (the Fobos independent-input mode). Each output bin combines the master
    bin and the conjugate of its mirror with per-channel complex weights:

        out[k] = (alpha*F[rp] + beta*conj(F[-rp])) * response[k]

    which evaluates `alpha*X1[k'] + beta*X2[k']`-style antenna combining up
    to a fixed scale; DC and Nyquist carry the antennas separated as
    real/imag parts.

    F: [m_bins] complex64 (complex master; [B, m_bins] + `inputs` [C] for
    multi-front-end); responses [C, n_bins]; shifts [C] i32; alpha/beta
    [C] complex64. Returns [C, olen] complex64.
    """
    nb = responses.shape[-1]
    signed = _signed_bins(nb)[None, :]
    g = shifts[:, None] + signed  # true signed master frequency
    valid = (g >= -(master_N // 2)) & (g <= (master_N - 1) // 2)
    rp = jnp.mod(g, master_N)
    mirror = jnp.mod(master_N - rp, master_N)
    if F.ndim == 2:
        base = np.asarray(inputs, np.int32)[:, None] * master_N
        Ff = F.reshape(-1)
        f_rp, f_mir = Ff[base + rp], Ff[base + mirror]
    else:
        f_rp, f_mir = F[rp], F[mirror]
    vals = alpha[:, None] * f_rp + beta[:, None] * jnp.conj(f_mir)
    special = (rp == 0) | (rp == master_N // 2)
    sval = alpha[:, None] * f_rp.real + beta[:, None] * f_rp.imag
    fd = jnp.where(valid, jnp.where(special, sval, vals), 0.0) * responses
    bb = jnp.fft.ifft(fd, axis=-1)
    return bb[:, nb - olen :].astype(jnp.complex64)
