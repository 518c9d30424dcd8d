"""Time-axis sharding with halo exchange — SURVEY §2.5 P5.

The overlap-save master keeps an (M-1)-sample rolling context between
blocks; the reference carries it implicitly in its mirror ring
(filter.c:245-264). When D consecutive input blocks are processed in
PARALLEL across a mesh (the DCN-scale alternative to replicating blocks:
each device transforms a different 20 ms block), that context becomes a
boundary halo along the time axis: device d needs the last M-1 samples of
device d-1's block. `ppermute` moves exactly that halo to the neighbor —
the direct analog of ring-attention/context-parallel halo exchange named
in SURVEY §5 ("long-context / sequence parallelism").

batch_master_fft(): [D, L] blocks (one per device) -> [D, bins] master
spectra, one ppermute per batch, bit-matching D sequential master_fft
steps. Downstream per-channel gathers/IFFTs/demods batch over the leading
axis; stateful demods scan over it.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.filterbank import MasterConfig, master_transform

__all__ = ["batch_master_fft"]


def batch_master_fft(cfg: MasterConfig, tail, blocks, mesh: Mesh, axis: str = "c"):
    """Run D master FFTs in parallel, one block per device.

    Args:
      cfg: master geometry (L, M, real).
      tail: [M-1] carried context (the batch-boundary halo from the
        previous call; from master_init()["tail"] initially). Multi-
        front-end engines pass [B, M-1] — the halo exchange and the
        transform batch over the leading axis.
      blocks: [D, L] (or [D, B, L]) consecutive input blocks, sharded
        P(axis, None[, None]).
      mesh/axis: the device mesh; D = mesh.shape[axis].

    Returns (new_tail, F): F [D, bins] (or [D, B, bins]) complex64 —
    F[d] identical to the d-th sequential master_fft() — and the new
    carried tail (device D-1's block end) for the next batch.
    """
    D = mesh.shape[axis]
    L, M = cfg.L, cfg.M
    halo = M - 1

    def body(tail_l, blk):
        # blk: [1(, B), L] (this device's block); tail_l replicated
        d = jax.lax.axis_index(axis)
        my_halo = blk[0, ..., L - halo:]

        def as_pair(v):  # complex collectives are unimplemented in some
            # TPU AOT pipelines (axon); move/reduce f32 pairs instead
            return (jnp.stack([v.real, v.imag], -1)
                    if jnp.iscomplexobj(v) else v)

        def from_pair(p, like):
            return (jax.lax.complex(p[..., 0], p[..., 1])
                    if jnp.iscomplexobj(like) else p)

        # neighbor exchange: my block tail -> device d+1 (ring; the wrap
        # entry into device 0 is unused — it takes the carried tail)
        prev = from_pair(
            jax.lax.ppermute(as_pair(my_halo), axis,
                             [(i, (i + 1) % D) for i in range(D)]), my_halo)
        prev = jnp.where(d == 0, tail_l, prev)
        x = jnp.concatenate([prev, blk[0]], axis=-1)
        F = master_transform(cfg, x)  # same plan as master_fft (bit-match)
        # the last device's halo becomes the next batch's carried context
        new_tail = from_pair(jax.lax.psum(
            jnp.where(d == D - 1, as_pair(my_halo),
                      jnp.zeros_like(as_pair(my_halo))), axis), my_halo)
        return new_tail, F[None]

    rest = (None,) * (blocks.ndim - 1)
    fn = shard_map(body, mesh=mesh, in_specs=(P(), P(axis, *rest)),
                   out_specs=(P(), P(axis, *rest)), check_vma=False)
    return fn(tail, blocks)
