"""Distributed large FFT — sharding the master forward transform.

The reference's single most CPU-intensive op is the giant forward FFT
(1.6-3.2M points per 20 ms block at RX888 rates, docs/FFTW3.md:4-7,57-61).
One TPU chip swallows that easily, but for multi-chip scale-out (more
bandwidth per radiod instance or many instances per pod) the transform
itself shards by row-column (4-step) Cooley-Tukey:

    view x[N] as A[N1, N2] (row-major, so each device owns a contiguous
    time slice) -> local FFTs along N2 -> twiddle exp(-2pi*i*n1*k2/N) ->
    all-to-all (the distributed "corner turn") -> local FFTs along N1.

Three corner turns (all-to-all) give natural order in and standard FFT
order out, each device ending with a contiguous bin range — the classic
six-step FFT. Deployments that keep bins resident can drop the final turn
and fold the k = k1 + N1*k2 digit order into the channel gather. This is
SURVEY.md §2.5 P3's "split the forward FFT across chips w/ all-to-all
between stages".
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

__all__ = ["distributed_fft", "plan_split"]


def plan_split(N: int, ndev: int) -> tuple[int, int]:
    """Pick N = N1*N2 with ndev | N1 and ndev | N2 (both axes get corner-
    turned), N1 as close to sqrt(N) as possible."""
    best = None
    for n1 in range(ndev, N + 1, ndev):
        if N % n1 or (N // n1) % ndev:
            continue
        score = abs(np.log(n1 * n1 / N))
        if best is None or score < best[0]:
            best = (score, n1)
    if best is None:
        raise ValueError(f"N={N} has no split with both factors divisible by {ndev}")
    n1 = best[1]
    return n1, N // n1


def distributed_fft(x, mesh: Mesh, axis: str = "c", n1: int | None = None):
    """Complex FFT of x[N] sharded over `axis` of `mesh`.

    x must be sharded in contiguous time chunks (P(axis) on a [N] array).
    Returns X[N] (standard FFT order) sharded contiguously over bins.
    """
    N = x.shape[-1]
    D = mesh.shape[axis]
    if n1 is None:
        n1, n2 = plan_split(N, D)
    else:
        n2 = N // n1
    if n1 * n2 != N or n1 % D or n2 % D:
        raise ValueError(f"bad split {n1}x{n2} for N={N}, D={D}")

    cols = n2 // D

    def body(xs):
        # xs: [rows, n2] — this device's contiguous time rows of
        # A[a, b] = x[a*n2 + b]. The decomposition
        #   X[k1 + n1*k2] = FFT_{n2,b}( W(b, k1) * FFT_{n1,a}(A)[k1, b] )
        # forces the n1-transform first, so corner-turn to complete n1:
        i = jax.lax.axis_index(axis)
        At = jax.lax.all_to_all(xs, axis, split_axis=1, concat_axis=0, tiled=True)  # [n1, cols]
        A1 = jnp.fft.fft(At, axis=0)  # DFT over a (length n1), local
        k1 = jnp.arange(n1)[:, None].astype(jnp.float32)
        b_global = (i * cols + jnp.arange(cols))[None, :].astype(jnp.float32)
        # integer phases stay exact in f32 after mod-N reduction for N < 2^24
        phase = jnp.mod(k1 * b_global, np.float32(N))
        A1 = A1 * jnp.exp(np.complex64(-2j * np.pi / N) * phase).astype(jnp.complex64)
        Bt = jax.lax.all_to_all(A1, axis, split_axis=0, concat_axis=1, tiled=True)  # [n1/D, n2]
        C = jnp.fft.fft(Bt, axis=1)  # DFT over b (length n2): C[k1_local, k2]
        # standard-order output: shard over k2 (bin k = k1 + n1*k2 is
        # contiguous per k2 block), i.e. one more corner turn + transpose
        Ct = jax.lax.all_to_all(C, axis, split_axis=1, concat_axis=0, tiled=True)  # [n1, k2_local]
        return Ct.T.reshape(-1)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=P(axis),
        out_specs=P(axis),
    )
    return fn(x.reshape(n1, n2))
