"""Complex-safe host<->device transfers for the axon TPU tunnel.

The remote backend cannot move complex64 across the host boundary in
EITHER direction: d2h fetches fail UNIMPLEMENTED outright, and h2d
device_put appears to succeed but wedges the client — every subsequent
compiled-program execution in the process then fails (only a fresh
interpreter recovers). On-device complex compute is fine.

So every host->device transfer of a tree that may hold complex leaves
goes through device_put_safe(): complex leaves travel as [..., 2] f32
pairs (wrapped in a {"__reim__": pair} marker so the structure is
self-describing) and ONE jitted combine per tree structure rebuilds the
complex64 leaves on device. The combine jit is module-level, so repeated
puts of same-shaped trees (every retune / filter hot-swap) hit the jit
cache and the no-recompile property is preserved.

The d2h direction is handled at the call sites that need it (checkpoint
save splits complex state leaves to pairs inside jit before fetching).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["split_complex", "combine_complex", "device_put_safe"]

_MARK = "__reim__"


def _is_marker(x) -> bool:
    return isinstance(x, dict) and set(x.keys()) == {_MARK}


def split_complex(tree):
    """numpy tree -> same tree with complex leaves as {_MARK: f32 pair}."""

    def f(a):
        a = np.asarray(a)
        if np.iscomplexobj(a):
            return {_MARK: np.stack([a.real, a.imag], axis=-1).astype(np.float32)}
        return a

    return jax.tree.map(f, tree)


def _combine_py(tree):
    return jax.tree.map(
        lambda x: (x[_MARK][..., 0] + 1j * x[_MARK][..., 1]).astype(jnp.complex64)
        if _is_marker(x) else x,
        tree,
        is_leaf=_is_marker,
    )


combine_complex = jax.jit(_combine_py)


def device_put_safe(tree, shardings_for=None):
    """device_put a (possibly complex) numpy tree in one batched transfer.

    shardings_for: optional callable np.ndarray -> Sharding, applied to
    each (already split) leaf — pair leaves keep the original leading
    dims, so leading-dim policies (channel-axis sharding) hold unchanged.
    The combine jit runs on committed inputs; GSPMD propagates their
    shardings through the elementwise rebuild.
    """
    split = split_complex(tree)
    if shardings_for is None:
        dev = jax.device_put(split)
    else:
        dev = jax.device_put(
            split, jax.tree.map(lambda a: shardings_for(np.asarray(a)), split))
    return combine_complex(dev)
