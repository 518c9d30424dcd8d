"""Pallas TPU kernels for the filter-bank hot path.

The per-block per-channel work is `gather bins at shift` x `response` —
a bandwidth-bound dynamic-slice over [C, n_bins] from a multi-megabin
master spectrum (filter.c:695-860's inner loop). XLA lowers it as a
full gather with materialized [C, n_bins] indices into the giant F; the
Pallas version instead keeps F in HBM and DMAs each channel's contiguous
slice into VMEM with scalar-prefetched start indices.

TPU DMA offsets in the lane dimension must be provably 128-aligned, so the
kernel fetches from the 128-aligned floor of each channel's first bin
(hinted with pl.multiple_of) with one extra tile of slack; the <=127-bin
residual rotation and the response multiply run in XLA on the small
[C, n_bins+128] result — memory-local, nothing touches the big F again.

Complex numbers are carried as separate re/im float32 planes (TPU Pallas
has no native complex dtype). The master spectrum is circularly padded so
every gather is one contiguous DMA; outputs come back in "shifted"
(ascending-frequency) bin order and are rolled to FFT order here.

Wired for complex masters (the real-master inverted-spectrum case stays on
the XLA path). Enable via Engine(use_pallas=True).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gather_rows_pallas", "channelize_pallas"]

ROWS = 8  # channels per grid step (TPU blocks need 8-aligned sublanes)
LANE = 128


@functools.partial(jax.jit, static_argnames=("nb_ext", "interpret"))
def gather_rows_pallas(fre, fim, astarts, nb_ext: int, interpret: bool = False):
    """rows[c, j] = Fpad[astarts[c] + j], j < nb_ext, astarts 128-aligned.

    fre/fim: [1, Ntot] padded master planes; astarts: [C] int32 (C % 8 == 0,
    every value a multiple of 128). Returns (re, im) [C, nb_ext].
    """
    C = astarts.shape[0]
    assert C % ROWS == 0 and nb_ext % LANE == 0

    def kernel(astarts_ref, fre_ref, fim_ref, ore_ref, oim_ref, *scratch):
        # per-row (1, nb_ext) scratch buffers: DMA destinations must start
        # on a tile boundary, so a row-slice of the (8,128)-tiled output
        # block can't be one — land each row in its own buffer instead
        sres, sims, sems = scratch[:ROWS], scratch[ROWS : 2 * ROWS], scratch[2 * ROWS]
        g = pl.program_id(0)
        copies = []
        for i in range(ROWS):  # static unroll: 2*ROWS DMAs in flight
            st = pl.multiple_of(astarts_ref[g * ROWS + i], LANE)
            cr = pltpu.make_async_copy(fre_ref.at[:, pl.ds(st, nb_ext)], sres[i], sems.at[i, 0])
            ci = pltpu.make_async_copy(fim_ref.at[:, pl.ds(st, nb_ext)], sims[i], sems.at[i, 1])
            cr.start()
            ci.start()
            copies.append((cr, ci))
        for cr, ci in copies:
            cr.wait()
            ci.wait()
        ore_ref[:] = jnp.concatenate([r[:] for r in sres], axis=0)
        oim_ref[:] = jnp.concatenate([r[:] for r in sims], axis=0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(C // ROWS,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # F planes stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((ROWS, nb_ext), lambda g, astarts: (g, 0)),
            pl.BlockSpec((ROWS, nb_ext), lambda g, astarts: (g, 0)),
        ],
        scratch_shapes=(
            [pltpu.VMEM((1, nb_ext), jnp.float32) for _ in range(2 * ROWS)]
            + [pltpu.SemaphoreType.DMA((ROWS, 2))]
        ),
    )
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((C, nb_ext), jnp.float32),
            jax.ShapeDtypeStruct((C, nb_ext), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(astarts, fre, fim)


def channelize_pallas(F, responses, shifts, olen: int, master_N: int,
                      interpret: bool = False):
    """Drop-in for ops.filterbank.channelize on COMPLEX masters.

    F: [m_bins] complex64 master spectrum; responses [C, n_bins] complex64
    (FFT bin order); shifts [C] int32. Returns [C, olen] complex64.
    """
    C, nb = responses.shape
    m_bins = master_N
    h = nb // 2
    nb_ext = (-(-nb // LANE) + 1) * LANE  # one extra tile for the residual
    if nb_ext > m_bins:
        # degenerate near-full-band channels: the circular pad can't cover a
        # contiguous slice; use the XLA gather path
        from .filterbank import channelize
        return channelize(F, responses, shifts, olen, False, master_N)
    C_pad = -(-C // ROWS) * ROWS

    # circular pad so every channel's slice is one contiguous DMA
    Fpad = jnp.concatenate([F, F[:nb_ext]])[None, :]
    start = jnp.mod(shifts - h, m_bins).astype(jnp.int32)
    astart = (start // LANE) * LANE
    rem = start - astart  # 0..127
    if C_pad != C:
        astart = jnp.concatenate([astart, jnp.zeros(C_pad - C, jnp.int32)])

    rre, rim = gather_rows_pallas(
        Fpad.real.astype(jnp.float32), Fpad.imag.astype(jnp.float32),
        astart, nb_ext=nb_ext, interpret=interpret,
    )
    rows = (rre[:C] + 1j * rim[:C]).astype(jnp.complex64)
    # residual rotation: take nb bins starting at rem[c] from each row
    idx = rem[:, None] + jnp.arange(nb, dtype=jnp.int32)[None, :]
    fd_shifted = jnp.take_along_axis(rows, idx, axis=1) * jnp.roll(responses, h, axis=-1)
    # Nyquist-stop semantics (see ops.filterbank.gather_bins): zero bins
    # whose signed master frequency falls outside the band
    g = shifts[:, None] + (jnp.arange(nb, dtype=jnp.int32)[None, :] - h)
    fd_shifted = jnp.where((g >= -(m_bins // 2)) & (g <= (m_bins - 1) // 2), fd_shifted, 0.0)
    fd = jnp.roll(fd_shifted, -h, axis=-1)  # back to FFT bin order
    bb = jnp.fft.ifft(fd, axis=-1)
    return bb[:, nb - olen:].astype(jnp.complex64)
