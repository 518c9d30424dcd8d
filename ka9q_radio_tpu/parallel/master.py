"""Distributed digit-order master FFT + sharded bin gather.

This is the multi-chip form of the shared forward transform — the
reference's single most CPU-intensive op (docs/FFTW3.md:4-7,57-61: the
rof3240000 plan at RX888 full rate) — integrated with the channel gather so
the master bins NEVER materialize on one device:

  1. `digit_fft`: 2-factor Cooley-Tukey with TWO all-to-all corner turns
     (the six-step FFT *minus* its final turn). Device d ends owning rows
     k1 in [d*n1/D, (d+1)*n1/D) of C[k1, k2] where the global FFT bin is
     k = k1 + n1*k2 — "digit order".
  2. `digit_take`: arbitrary-bin gather from that distributed layout.
     Every device reads only the bins it OWNS (a masked local gather) and
     a single psum_scatter over the channel axis both reduces the partial
     reads and leaves the result sharded [C/D, nb] — the minimal-traffic
     combine ((D-1)/D * C * nb values over ICI, far less than
     all-gathering the master spectrum).
  3. `digit_notch`: the spur/DC notch (filter.c:443-453) as a masked
     scatter onto local digit rows.

Real A/D masters run the same complex transform with zero imaginary part:
the flagship N = 3,240,000 = 2^6*3^4*5^4 splits 1800x1800 for an 8-device
mesh, while its packed half-length 1,620,000 (2^5*...) cannot satisfy the
D | n1, D | n2 corner-turn divisibility for D = 8. Gathers then apply the
exact single-device real-master index math (read |g|, conjugate when the
spectrum is inverted, filter.c:777-859), so sharded and single-chip
engines agree to FFT roundoff.

Retunes stay pure data: bin indices are traced arrays, so the control
plane's no-recompile property (CLAUDE.md invariant) holds under the mesh.
"""
from __future__ import annotations

import dataclasses
import functools
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from .fft import plan_split

__all__ = ["DigitMaster"]


@dataclasses.dataclass(frozen=True)
class DigitMaster:
    """Plan for one distributed master transform over a named mesh axis.

    real=True masters keep only stage-2 columns k2 <= n2/2 (every gathered
    bin satisfies k = k1 + n1*k2 <= N/2, filter.c's non-negative half), so
    the largest local stage computes half its output.
    mxu1/mxu2: per-stage factor plans for the MXU matmul cascade
    (ops.filterbank.split_fft_mxu) — the same ~5x-over-VPU-FFT win the
    single-chip master measured (filterbank.py:66-73) applied to both
    local stages; None falls back to jnp.fft.fft for that stage.
    """

    mesh: Mesh
    axis: str
    N: int
    n1: int
    n2: int
    real: bool = False
    mxu1: "tuple[int, ...] | None" = None
    mxu2: "tuple[int, ...] | None" = None
    precision: str = "high"

    @classmethod
    def plan(cls, mesh: Mesh, axis: str, N: int, real: bool = False,
             mxu: bool = True, precision: str = "high") -> "DigitMaster":
        D = mesh.shape[axis]
        n1, n2 = plan_split(N, D)  # D | n1 and D | n2 (both axes corner-turn)
        if N >= 2**31:
            raise ValueError(
                f"N={N}: twiddle residues (k1*b mod N < N) exceed int32")
        mxu1 = mxu2 = None
        if mxu:
            from ..ops.filterbank import plan_split_mxu

            mxu1 = plan_split_mxu(n1)
            mxu2 = plan_split_mxu(n2)
        return cls(mesh=mesh, axis=axis, N=N, n1=n1, n2=n2, real=real,
                   mxu1=mxu1, mxu2=mxu2, precision=precision)

    @property
    def D(self) -> int:
        return self.mesh.shape[self.axis]

    @functools.cached_property
    def _tw_table(self) -> np.ndarray:
        """[n1, n2] four-step twiddle W_N^{k1*b}, host-built with EXACT
        int64 phase (mod N) — the same precomputed-constant discipline as
        the dense cascade's _twiddle_c64. Replaces the former per-block
        on-device `jnp.exp` of n1*n2 angles (3.24M transcendentals per
        block at the flagship — measured 0.30 ms of the 0.5 ms/block
        mesh-of-1 overhead). Sharded P(None, axis) into the shard_map, so
        each device holds only its n1 x n2/D column slice."""
        k1 = np.arange(self.n1, dtype=np.int64)[:, None]
        b = np.arange(self.n2, dtype=np.int64)[None, :]
        return np.exp((-2j * np.pi / self.N) * ((k1 * b) % self.N)).astype(np.complex64)

    def _tw_sharded(self):
        return jax.lax.with_sharding_constraint(
            jnp.asarray(self._tw_table),
            NamedSharding(self.mesh, P(None, self.axis)))

    @property
    def rows(self) -> int:
        return self.n1 // self.D

    @property
    def n2_kept(self) -> int:
        """Stage-2 columns kept: n2/2+1 for real masters (bins <= N/2)."""
        return self.n2 // 2 + 1 if self.real else self.n2

    # -- forward transform ---------------------------------------------------
    def fft(self, x):
        """x: [N] complex64 time samples (sharded contiguously over `axis`)
        -> Zd: [n1, n2_kept] complex64, digit order, sharded P(axis, None):
        X[k1 + n1*k2] = Zd[k1, k2]."""
        from ..ops.filterbank import split_fft_mxu

        n1, n2, N, ax = self.n1, self.n2, self.N, self.axis
        cols = n2 // self.D
        kept = self.n2_kept

        def body(xs, tw):
            # xs: [n1/D, n2] contiguous time rows of A[a, b] = x[a*n2 + b].
            # X[k1 + n1*k2] = FFT_{n2,b}( W_N^{b*k1} * FFT_{n1,a}(A)[k1, b] )
            # tw: [n1, cols] this device's slice of the exact host twiddle
            # table W_N^{k1*b} (_tw_table)
            At = jax.lax.all_to_all(xs, ax, split_axis=1, concat_axis=0, tiled=True)  # [n1, cols]
            if self.mxu1 is not None:
                A1 = jnp.swapaxes(
                    split_fft_mxu(jnp.swapaxes(At, -1, -2), self.mxu1,
                                  precision=self.precision), -1, -2)
            else:
                A1 = jnp.fft.fft(At, axis=0)
            A1 = A1 * tw
            Bt = jax.lax.all_to_all(A1, ax, split_axis=0, concat_axis=1, tiled=True)  # [rows, n2]
            if self.mxu2 is not None:
                C = split_fft_mxu(Bt, self.mxu2,
                                  kept if kept < n2 else None,
                                  precision=self.precision)
                return C[..., :kept]
            return jnp.fft.fft(Bt, axis=1)[..., :kept]  # C[k1_local, k2]

        fn = shard_map(body, mesh=self.mesh, in_specs=(P(ax, None), P(None, ax)),
                       out_specs=P(ax, None), check_vma=False)
        return fn(x.reshape(n1, n2), self._tw_sharded()).astype(jnp.complex64)

    @property
    def kept_pad(self) -> int:
        """n2_kept rounded up so the natural-order corner turn divides."""
        return -(-self.n2_kept // self.D) * self.D

    @property
    def nat_bins(self) -> int:
        """Length of fft_natural's output (>= m_bins; pad bins at the end)."""
        return self.n1 * self.kept_pad

    def fft_natural(self, x, cols_in: bool = False):
        """Six-step FFT: fft() plus the FINAL corner turn, returning the
        NATURAL-ORDER spectrum as one global [n1*kept_pad] array sharded
        contiguously over `axis` (device d owns bins [d*nat/D, (d+1)*nat/D)).

        Natural order is what makes the sharded engine fast: every dense
        gather (the tiled channelizer, noise windows, spur notches) then
        runs unchanged on the sharded array under GSPMD — measured ~20x
        faster than per-element digit-order gathers at the flagship
        geometry. The extra all-to-all moves N/D bins per device once per
        block (~0.3 ms of ICI at the flagship), far less than the gather
        time it buys back. Real masters keep only k2 <= n2/2 columns
        (rounded up to a D multiple); pad bins land at flat indices
        >= n1*n2_kept > N/2, past everything the engine reads.

        x may stay float32 for real masters: the first corner turn then
        moves half the bytes and the MXU first stage runs as two real
        matmuls — the dense master's real-input saving.

        cols_in=True: x is ALREADY the [n1, n2] sample matrix sharded over
        its COLUMN axis (P(None, axis), x[a, b] = time sample a*n2 + b) —
        the first corner turn is skipped entirely. The engine carries its
        master tail in this layout when n2 divides both L and N-L (block
        advance = whole rows), so the per-block transform pays only TWO
        all-to-alls; mesh-of-1 ablation measured the three turns at 0.29
        ms/block of pure data movement on the flagship.
        """
        from ..ops.filterbank import split_fft_mxu

        n1, n2, N, ax = self.n1, self.n2, self.N, self.axis
        D = self.D
        cols = n2 // D
        kp = self.kept_pad

        def body(xs, tw):
            if cols_in:
                At = xs  # already [n1, cols] on each device
            else:
                At = jax.lax.all_to_all(xs, ax, split_axis=1, concat_axis=0, tiled=True)  # [n1, cols]
            if self.mxu1 is not None:
                A1 = jnp.swapaxes(
                    split_fft_mxu(jnp.swapaxes(At, -1, -2), self.mxu1,
                                  precision=self.precision), -1, -2)
            else:
                A1 = jnp.fft.fft(At.astype(jnp.complex64), axis=0)
            A1 = A1 * tw  # exact host table slice (_tw_table), not per-block exps
            Bt = jax.lax.all_to_all(A1, ax, split_axis=0, concat_axis=1, tiled=True)  # [rows, n2]
            if self.mxu2 is not None:
                C = split_fft_mxu(Bt, self.mxu2, kp if kp < n2 else None,
                                  precision=self.precision)[..., :kp]
            else:
                C = jnp.fft.fft(Bt, axis=1)
                C = (jnp.pad(C, ((0, 0), (0, kp - n2))) if kp > n2
                     else C[..., :kp])
            # FINAL corner turn (the six-step's third): transpose FIRST
            # (XLA folds the swap into the last cascade matmul's output
            # layout — measured free in the casc1_nt ablation), then shard
            # k2 and own all k1: local row-major flatten IS natural order
            # (k = k1 + n1*k2).
            Ct = jax.lax.all_to_all(jnp.swapaxes(C, -1, -2), ax,
                                    split_axis=0, concat_axis=1, tiled=True)  # [kp/D, n1]
            return Ct.reshape(-1)

        in0 = P(None, ax) if cols_in else P(ax, None)
        fn = shard_map(body, mesh=self.mesh, in_specs=(in0, P(None, ax)),
                       out_specs=P(ax), check_vma=False)
        return fn(x.reshape(n1, n2), self._tw_sharded()).astype(jnp.complex64)

    # -- gathers -------------------------------------------------------------
    def take(self, Zd, idx, scatter: bool = True):
        """Gather master bins idx (int32, in [0, N)) from the digit-order
        distributed spectrum.

        idx: [C, nb] (scatter=True: result [C, nb] sharded over C via
        psum_scatter, C %% D == 0) or any shape (scatter=False: result
        replicated via psum). Each device contributes only bins it owns.
        Real masters must only be asked for bins <= N/2 (the gathers
        guarantee this; stage-2 keeps n2/2+1 columns).
        """
        n1, n2, rows, ax = self.n1, self.n2_kept, self.rows, self.axis

        def body(zl, ix):
            d = jax.lax.axis_index(ax)
            k1 = ix % n1
            k2 = ix // n1
            lr = k1 - d * rows
            ok = (lr >= 0) & (lr < rows)
            flat = jnp.clip(lr, 0, rows - 1) * n2 + k2
            v = jnp.take(zl.reshape(-1), flat.reshape(-1), mode="clip").reshape(ix.shape)
            v = jnp.where(ok, v, np.complex64(0))
            # collectives on f32 pairs, not c64: complex reduce-scatter is
            # unimplemented in some TPU AOT pipelines (axon), and the sum
            # commutes with re/im exactly
            pair = jnp.stack([v.real, v.imag], axis=-1)
            if scatter:
                pair = jax.lax.psum_scatter(pair, ax, scatter_dimension=0, tiled=True)
            else:
                pair = jax.lax.psum(pair, ax)
            return jax.lax.complex(pair[..., 0], pair[..., 1])

        out_spec = P(ax, *([None] * (idx.ndim - 1))) if scatter else P(*([None] * idx.ndim))
        fn = shard_map(body, mesh=self.mesh,
                       in_specs=(P(ax, None), P(*([None] * idx.ndim))),
                       out_specs=out_spec, check_vma=False)
        return fn(Zd, idx.astype(jnp.int32))

    def notch(self, Zd, bins: np.ndarray, track):
        """Subtract track[j] from master bin bins[j] (static positions) —
        the spur notch applied to distributed digit rows."""
        n1, n2, rows, ax = self.n1, self.n2, self.rows, self.axis
        coords = [(int(b) % n1, int(b) // n1) for b in bins]

        def body(zl, tr):
            d = jax.lax.axis_index(ax)
            for j, (k1, k2) in enumerate(coords):
                lr = k1 - d * rows
                ok = (lr >= 0) & (lr < rows)
                upd = jnp.where(ok, -tr[j], np.complex64(0))
                zl = zl.at[jnp.clip(lr, 0, rows - 1), k2].add(upd)
            return zl

        fn = shard_map(body, mesh=self.mesh, in_specs=(P(ax, None), P()),
                       out_specs=P(ax, None), check_vma=False)
        return fn(Zd, track)


def _signed_bins(n_bins: int) -> jnp.ndarray:
    k = jnp.arange(n_bins, dtype=jnp.int32)
    return jnp.where(k < (n_bins + 1) // 2, k, k - n_bins)


class DigitSpectrum:
    """One block's distributed master spectrum + the gather semantics of
    ops.filterbank (gather_bins / gather_noise_bins / channelize_beam) on
    the digit-order layout. Handed to channel groups in place of the dense
    [m_bins] array F."""

    def __init__(self, dm: DigitMaster, Zd, real_master: bool):
        self.dm = dm
        self.Zd = Zd
        self.real = real_master

    def gather(self, shifts, n_bins: int):
        """gather_bins equivalent: [C, n_bins] channel slices, sharded over
        the channel axis. Index math mirrors filter.c:695-860 exactly."""
        dm = self.dm
        g = shifts[:, None] + _signed_bins(n_bins)[None, :]
        if self.real:
            m_bins = dm.N // 2 + 1
            inverted = (shifts < 0)[:, None]
            mi = jnp.where(inverted, -g, g)
            valid = (mi >= 0) & (mi < m_bins)
            vals = dm.take(self.Zd, jnp.clip(mi, 0, m_bins - 1))
            vals = jnp.where(inverted, jnp.conj(vals), vals)
            return jnp.where(valid, vals, np.complex64(0))
        valid = (g >= -(dm.N // 2)) & (g <= (dm.N - 1) // 2)
        vals = dm.take(self.Zd, jnp.mod(g, dm.N))
        return jnp.where(valid, vals, np.complex64(0))

    def gather_beam(self, shifts, n_bins: int, alpha, beta):
        """channelize_beam's antenna combine on distributed bins
        (filter.c:723-742): alpha*F[rp] + beta*conj(F[-rp]), DC/Nyquist
        carrying the antennas as real/imag parts."""
        dm = self.dm
        g = shifts[:, None] + _signed_bins(n_bins)[None, :]
        valid = (g >= -(dm.N // 2)) & (g <= (dm.N - 1) // 2)
        rp = jnp.mod(g, dm.N)
        mirror = jnp.mod(dm.N - rp, dm.N)
        both = dm.take(self.Zd, jnp.concatenate([rp, mirror], axis=-1))
        f_rp, f_mir = both[:, :n_bins], both[:, n_bins:]
        vals = alpha[:, None] * f_rp + beta[:, None] * jnp.conj(f_mir)
        special = (rp == 0) | (rp == dm.N // 2)
        sval = alpha[:, None] * f_rp.real + beta[:, None] * f_rp.imag
        return jnp.where(valid, jnp.where(special, sval, vals), np.complex64(0))

    def gather_noise(self, shifts, nbins: int):
        """gather_noise_bins equivalent: [C, nbins] bin energies around each
        channel (window clamping per radio.c:1845-1875).

        The window PLACEMENT must mirror ops.noise.gather_noise_bins
        bin-for-bin (including its tile-aligned rounding) so a sharded
        engine's N0 matches the single-chip engine exactly
        (test_sharded_engine holds this)."""
        from ..ops.noise import _TILE as T

        dm = self.dm
        ntiles = -(-nbins // T)
        W = ntiles * T
        if self.real:
            m_bins = dm.N // 2 + 1
            if m_bins >= W:
                lo = jnp.abs(shifts) - W // 2
                lo = (jnp.clip(lo, 0, m_bins - W) // T) * T
                idx = lo[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
            else:
                k = jnp.arange(nbins, dtype=jnp.int32)[None, :]
                lo = jnp.clip(jnp.abs(shifts) - nbins // 2, 0, max(m_bins - nbins, 0))[:, None]
                idx = jnp.clip(lo + k, 0, m_bins - 1)
        else:
            m_bins = dm.N
            if m_bins % T == 0 and m_bins >= W:
                lo = jnp.clip(shifts - W // 2,
                              -(m_bins // 2), (m_bins - 1) // 2 - (W - 1))
                lo = jnp.floor_divide(lo, T) * T
                idx = jnp.mod(lo[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :], m_bins)
            else:
                k = jnp.arange(nbins, dtype=jnp.int32)[None, :]
                lo = jnp.clip(shifts - nbins // 2, -(m_bins // 2), (m_bins - 1) // 2 - (nbins - 1))[:, None]
                idx = jnp.mod(lo + k, m_bins)
        v = dm.take(self.Zd, idx)
        return (v.real * v.real + v.imag * v.imag).astype(jnp.float32)
