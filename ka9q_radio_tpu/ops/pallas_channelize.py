"""Fused Pallas channelizer for dense many-channel groups.

The XLA tiled channelizer (ops/filterbank.py tiled_channelize) lowers to
three separate HBM passes over the [C, S] working set — the tile-row
gather materializes `cover`, the response multiply materializes `x`, and
the IDFT matmul reads it back (measured at C=32k on v5e: 0.49 + 0.86 +
0.43 ms while every stream's bandwidth floor is ~0.2 ms). Past ~8k
channels this is THE marginal per-channel cost of the channels/chip
curve (docs/SCALING.md).

This kernel fuses the whole chain in VMEM, one pass:

  grid step r = one RUN of Cb consecutive channels. The run's master
  rows [row0[r], row0[r]+span) are DMA'd into a VMEM scratch window
  once (row0 is scalar-prefetched DATA, so retunes never recompile);
  each channel's [ntiles, 128] slice is extracted from the window by a
  one-hot [Cb, span] matmul per tile (dense groups have tiny spans, so
  this rides the MXU for ~free); the response multiply, the [S, olen]
  IDFT matmul against the resident E constant, the inverted-slice
  conjugation and the integer phase ramp all happen before anything
  returns to HBM. Only the [C, olen] baseband is written back.

Eligibility is a RUNTIME property (a params flag, never a recompile):
the host plans row0/off from the tile_lo mirrors and keeps the kernel
armed only while every run's channels fit its span window — a retune
that scatters a run beyond its span drops the group to the XLA path
via lax.cond until the layout fits again (runtime/engine.py). Wrapped
complex-master windows (mod-nrows gathers) and multi-input batches
always take the XLA path.

Reference anchor: /root/reference/src/filter.c:654-695 (per-channel bin
slice); the fused form is TPU-native, behavior-equal to
tiled_channelize (tests/test_pallas_channelize.py holds them equal).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CB = 128  # channels per run (MXU row dim)
_SPAN_CAP = 512  # rows per run window: 512*128*4*2 B = 512 KB of VMEM


def build_ramp(slope: np.ndarray, n_bins: int, olen: int,
               olen_pad: int) -> tuple[np.ndarray, np.ndarray]:
    """Host table of the integer phase ramp exp(2j pi (slope*t mod n)/n)
    for t in [n_bins-olen, n_bins) (tiled_channelize's last multiply),
    padded to olen_pad lanes. Rebuilt on retune surgery only."""
    t = np.arange(n_bins - olen, n_bins, dtype=np.int64)[None, :]
    ph = (slope.astype(np.int64)[:, None] * t) % n_bins
    ang = (2.0 * np.pi / n_bins) * ph
    rr = np.zeros((slope.shape[0], olen_pad), np.float32)
    ri = np.zeros((slope.shape[0], olen_pad), np.float32)
    rr[:, :olen] = np.cos(ang)
    ri[:, :olen] = np.sin(ang)
    return rr, ri


def plan_runs(tile_lo: np.ndarray, ntiles: int, nrows: int,
              span_margin: float = 2.0):
    """Host-side run plan from the tile_lo mirror.

    Returns (row0 [R] i32, span int) or None when the group shouldn't
    use the kernel (wrapping windows, sparse layout, tiny C). span is
    sized with `span_margin` headroom so ordinary retunes keep fitting.
    """
    C = tile_lo.shape[0]
    if C < _CB or C % _CB:
        return None
    lo = np.asarray(tile_lo, np.int64)
    if np.any(lo < 0) or np.any(lo + ntiles > nrows):
        return None  # wrapped / out-of-range windows
    runs = lo.reshape(-1, _CB)
    need = int((runs.max(axis=1) - runs.min(axis=1)).max()) + ntiles
    span = min(int(np.ceil(need * span_margin / 8)) * 8, _SPAN_CAP)
    if need > span or span > nrows:
        return None  # sparse layout: the XLA gather is the right tool
    row0 = np.clip(runs.min(axis=1), 0, max(nrows - span, 0)).astype(np.int32)
    return row0, span


def check_runs(tile_lo: np.ndarray, row0: np.ndarray, ntiles: int,
               span: int) -> bool:
    """Does the current layout still fit the planned spans? (host check
    after retune surgery; flips the runtime flag, never recompiles)"""
    lo = np.asarray(tile_lo, np.int64).reshape(-1, _CB)
    r0 = np.asarray(row0, np.int64)[:, None]
    off = lo - r0
    return bool(np.all((off >= 0) & (off + ntiles <= span)))


def recompute_row0(tile_lo: np.ndarray, ntiles: int, nrows: int,
                   span: int) -> "np.ndarray | None":
    """Re-center each run's window on the current layout (host surgery
    after a retune). None if some run no longer fits `span`."""
    lo = np.asarray(tile_lo, np.int64)
    if np.any(lo < 0) or np.any(lo + ntiles > nrows):
        return None
    runs = lo.reshape(-1, _CB)
    if int((runs.max(axis=1) - runs.min(axis=1)).max()) + ntiles > span:
        return None
    return np.clip(runs.min(axis=1), 0, max(nrows - span, 0)).astype(np.int32)


def _kernel(row0_ref, fr_hbm, fi_hbm, rr_ref, ri_ref, off_ref, sgn_ref,
            rampr_ref, rampi_ref, er_ref, ei_ref, or_ref, oi_ref,
            winr, wini, semr, semi, *, ntiles, span, olen_pad):
    f32 = jnp.float32
    hi = jax.lax.Precision.HIGHEST
    r = pl.program_id(0)
    row0 = row0_ref[r]
    cpr = pltpu.make_async_copy(fr_hbm.at[pl.ds(row0, span), :], winr, semr)
    cpi = pltpu.make_async_copy(fi_hbm.at[pl.ds(row0, span), :], wini, semi)
    cpr.start()
    cpi.start()
    cpr.wait()
    cpi.wait()

    off = off_ref[:]  # [Cb, 1] i32
    iota = jax.lax.broadcasted_iota(jnp.int32, (_CB, span), 1)
    fr = winr[:]
    fi = wini[:]

    def dot(a, b, prec):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32, precision=prec)

    # gather all tiles, lane-concatenated into the [Cb, S] working row;
    # the one-hot dots run at HIGHEST so window values pass through
    # exactly (bf16 operand splitting reconstructs f32 over 6 passes)
    xrs, xis = [], []
    for t in range(ntiles):
        sel = (iota == off + t).astype(f32)  # [Cb, span] one-hot
        covr = dot(sel, fr, hi)
        covi = dot(sel, fi, hi)
        rrt = rr_ref[:, t * 128:(t + 1) * 128]
        rit = ri_ref[:, t * 128:(t + 1) * 128]
        xrs.append(covr * rrt - covi * rit)
        xis.append(covr * rit + covi * rrt)
    xr = jnp.concatenate(xrs, axis=1)  # [Cb, S]
    xi = jnp.concatenate(xis, axis=1)
    # ONE [Cb, S] @ [S, olen] complex matmul per part — DEFAULT precision,
    # same as the XLA path's x @ E
    df = jax.lax.Precision.DEFAULT
    er = er_ref[:]
    ei = ei_ref[:]
    accr = dot(xr, er, df) - dot(xi, ei, df)
    acci = dot(xr, ei, df) + dot(xi, er, df)
    # inverted real-master slices take the conjugate (tiled_channelize)
    acci = acci * sgn_ref[:]
    # integer phase ramp exp(2j pi (slope*t mod n)/n): host-tabled per
    # channel ([C, olen] params — slope only changes on retune; in-kernel
    # cos/sin measured ~0.5 ms/block of VPU transcendentals at C=32k)
    cr = rampr_ref[:]
    si = rampi_ref[:]
    or_ref[:] = accr * cr - acci * si
    oi_ref[:] = accr * si + acci * cr


@functools.partial(
    jax.jit, static_argnames=("ntiles", "span", "olen", "nrows",
                              "interpret"))
def pallas_channelize(F, resp_r, resp_i, off, sgn, ramp_r, ramp_i, row0,
                      E_r, E_i, *, ntiles: int, span: int, olen: int,
                      nrows: int, interpret: bool = False):
    """Fused gather+filter+IDFT+ramp. F [m_bins] complex64;
    resp_r/resp_i [C, S] f32; off [C, 1] i32 (tile_lo - row0 per run);
    sgn [C, 1] f32 (+1/-1 conj); ramp_r/ramp_i [C, olen_pad] f32 (the
    slope phase ramp, host-tabled — see build_ramp); row0 [R] i32;
    E_r/E_i [S, olen_pad] f32. Returns [C, olen] complex64 ==
    tiled_channelize on the same layout."""
    C = resp_r.shape[0]
    R = C // _CB
    S = resp_r.shape[-1]
    olen_pad = E_r.shape[-1]
    pad = nrows * 128 - F.shape[-1]
    Fp = jnp.pad(F, (0, pad))
    fr = Fp.real.astype(jnp.float32).reshape(nrows, 128)
    fi = Fp.imag.astype(jnp.float32).reshape(nrows, 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # fr (manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),  # fi
            pl.BlockSpec((_CB, S), lambda r, row0: (r, 0)),
            pl.BlockSpec((_CB, S), lambda r, row0: (r, 0)),
            pl.BlockSpec((_CB, 1), lambda r, row0: (r, 0)),
            pl.BlockSpec((_CB, 1), lambda r, row0: (r, 0)),
            pl.BlockSpec((_CB, olen_pad), lambda r, row0: (r, 0)),
            pl.BlockSpec((_CB, olen_pad), lambda r, row0: (r, 0)),
            pl.BlockSpec((S, olen_pad), lambda r, row0: (0, 0)),
            pl.BlockSpec((S, olen_pad), lambda r, row0: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((_CB, olen_pad), lambda r, row0: (r, 0)),
            pl.BlockSpec((_CB, olen_pad), lambda r, row0: (r, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((span, 128), jnp.float32),
            pltpu.VMEM((span, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    kern = functools.partial(_kernel, ntiles=ntiles, span=span,
                             olen_pad=olen_pad)
    outr, outi = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((C, olen_pad), jnp.float32),
                   jax.ShapeDtypeStruct((C, olen_pad), jnp.float32)],
        interpret=interpret,
    )(row0, fr, fi, resp_r, resp_i, off, sgn, ramp_r, ramp_i, E_r, E_i)
    return (outr[:, :olen] + 1j * outi[:, :olen]).astype(jnp.complex64)


# ---------------------------------------------------------------------------
# Fused noise estimate: window DMA + |F|^2 + one-hot gather + the exact
# order-statistics bisection, all in VMEM (ops/noise.py does the same in
# three materialized stages; the [C, nbins] energies round trip measured
# 1.35 ms/block at C=32k). Real masters only (complex windows wrap).
# ---------------------------------------------------------------------------


def _noise_kernel(row0_ref, fr_hbm, fi_hbm, off_ref, o_ref,
                  winr, wini, semr, semi, *, ntiles, span, i_idx, frac,
                  scale):
    f32 = jnp.float32
    hi = jax.lax.Precision.HIGHEST
    r = pl.program_id(0)
    row0 = row0_ref[r]
    cpr = pltpu.make_async_copy(fr_hbm.at[pl.ds(row0, span), :], winr, semr)
    cpi = pltpu.make_async_copy(fi_hbm.at[pl.ds(row0, span), :], wini, semi)
    cpr.start()
    cpi.start()
    cpr.wait()
    cpi.wait()
    wr = winr[:]
    wi = wini[:]
    e_win = wr * wr + wi * wi  # [span, 128] energies

    off = off_ref[:]  # [Cb, 1] i32
    iota = jax.lax.broadcasted_iota(jnp.int32, (_CB, span), 1)

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32, precision=hi)

    tiles = []
    for t in range(ntiles):
        sel = (iota == off + t).astype(f32)
        tiles.append(dot(sel, e_win))
    energ = jnp.concatenate(tiles, axis=1)  # [Cb, nbins]
    keys = pltpu.bitcast(energ, jnp.int32)  # non-negative f32: int order ok

    def step(k, c):
        lo, hic = c
        mid = lo + ((hic - lo) >> 1)
        cnt = jnp.sum((keys <= mid).astype(jnp.int32), axis=-1, keepdims=True)
        take = cnt >= (i_idx + 1)
        return (jnp.where(take, lo, mid + 1), jnp.where(take, mid, hic))

    lo0 = jnp.zeros((_CB, 1), jnp.int32)
    hi0 = jnp.full((_CB, 1), np.int32(2**31 - 1))
    vi, _ = jax.lax.fori_loop(0, 31, step, (lo0, hi0))
    cnt_le = jnp.sum((keys <= vi).astype(jnp.int32), axis=-1, keepdims=True)
    bigger = jnp.where(keys > vi, keys, np.int32(2**31 - 1))
    vnext = jnp.min(bigger, axis=-1, keepdims=True)
    v1 = jnp.where(cnt_le >= i_idx + 2, vi, vnext)
    q = (pltpu.bitcast(vi, f32) * np.float32(1.0 - frac)
         + pltpu.bitcast(v1, f32) * np.float32(frac))
    thresh = np.float32(1.5) * q  # N_CUTOFF (radio.c:75)
    mask = energ <= thresh
    count = jnp.maximum(jnp.sum(mask.astype(f32), axis=-1, keepdims=True), 1.0)
    mean = jnp.sum(jnp.where(mask, energ, 0.0), axis=-1, keepdims=True) / count
    o_ref[:] = jnp.broadcast_to(mean * np.float32(scale), (_CB, 128))


@functools.partial(jax.jit, static_argnames=("ntiles", "span", "nrows",
                                             "nbins", "scale", "interpret"))
def pallas_noise_est(F, off, row0, *, ntiles: int, span: int, nrows: int,
                     nbins: int, scale: float, interpret: bool = False):
    """Fused gather_noise_bins + estimate_noise for REAL masters.
    F [m_bins] complex64; off [C, 1] i32 (noise window tile row - run
    row0); row0 [R] i32; scale = noise_correction()/(master_bins*fs).
    Returns [C] float32 N0 — estimate_noise(gather_noise_bins(...)) to
    f32 rounding."""
    from .noise import NQ

    C = off.shape[0]
    R = C // _CB
    pos = NQ * (nbins - 1)
    i_idx = int(np.floor(pos))
    frac = pos - i_idx
    pad = nrows * 128 - F.shape[-1]
    Fp = jnp.pad(F, (0, pad))
    fr = Fp.real.astype(jnp.float32).reshape(nrows, 128)
    fi = Fp.imag.astype(jnp.float32).reshape(nrows, 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((_CB, 1), lambda r, row0: (r, 0)),
        ],
        out_specs=pl.BlockSpec((_CB, 128), lambda r, row0: (r, 0)),
        scratch_shapes=[
            pltpu.VMEM((span, 128), jnp.float32),
            pltpu.VMEM((span, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    kern = functools.partial(_noise_kernel, ntiles=ntiles, span=span,
                             i_idx=i_idx, frac=frac, scale=scale)
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C, 128), jnp.float32),
        interpret=interpret,
    )(row0, fr, fi, off)
    return out[:, 0]
