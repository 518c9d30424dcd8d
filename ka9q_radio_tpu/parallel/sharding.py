"""Channel-axis sharding for engine state/params pytrees.

Strategy (SURVEY.md §2.5 P1): every per-channel tensor in a group's params
and carried state has the channel count C as its leading dimension, so the
whole group shards with `PartitionSpec('c', ...)`. The master FFT state and
the input block are replicated; XLA then runs the frequency-domain
gather/multiply/IFFT and the vmapped demodulator fully parallel across
chips with no collectives in the steady state (the only cross-chip traffic
is the replicated master spectrum broadcast, which rides ICI).

The demodulators are embarrassingly parallel across channels — there is no
cross-channel math anywhere past the shared master FFT — so this is the
exact analog of the reference's channel-per-thread model, at pod scale.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CHANNEL_AXIS = "c"

__all__ = ["make_mesh", "shard_engine_tree", "CHANNEL_AXIS"]


def make_mesh(devices=None, axis: str = CHANNEL_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices, named for channel sharding."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis,))


def _group_sizes(engine) -> set[int]:
    return {g.C for g in engine.groups.values()}


def shard_engine_tree(engine, mesh: Mesh, tree, replicate_rest: bool = True):
    """Apply channel-axis sharding to an engine state or params pytree.

    Any array leaf whose leading dimension equals some group's channel count
    C (and C divides the mesh size evenly) is sharded P('c'); everything
    else (master tail, PRNG keys, scalars) is replicated.
    """
    sizes = {c for c in _group_sizes(engine) if c % mesh.devices.size == 0}
    chan = NamedSharding(mesh, P(CHANNEL_AXIS))
    repl = NamedSharding(mesh, P())

    def place(leaf):
        arr = jax.numpy.asarray(leaf)
        if arr.ndim >= 1 and arr.shape[0] in sizes:
            return jax.device_put(arr, chan)
        return jax.device_put(arr, repl) if replicate_rest else arr

    return jax.tree.map(place, tree)
