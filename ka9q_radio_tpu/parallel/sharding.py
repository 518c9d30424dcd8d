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


def shard_engine_tree(engine, mesh: Mesh, tree, replicate_rest: bool = True):
    """Apply channel-axis sharding to an engine state or params pytree.

    Explicit pytree-path policy (not a shape heuristic): a leaf shards
    P('c') iff its key path passes through a group-name dict key (engine
    params are {group: ...}; engine state is {"groups": {group: ...}}) AND
    its leading dimension equals THAT group's channel count — so a master
    leaf or a [C, ...]-shaped non-channel leaf can never shard by
    coincidence. Everything else (master tail, spur trackers, scalars)
    replicates.
    """
    import jax.tree_util as jtu

    group_C = {name: g.C for name, g in engine.groups.items()
               if g.C % mesh.devices.size == 0}
    chan = NamedSharding(mesh, P(CHANNEL_AXIS))
    repl = NamedSharding(mesh, P())

    def place(path, leaf):
        arr = jax.numpy.asarray(leaf)
        gname = next((k.key for k in path
                      if isinstance(k, jtu.DictKey) and k.key in group_C), None)
        if gname is not None and arr.ndim >= 1 and arr.shape[0] == group_C[gname]:
            return jax.device_put(arr, chan)
        return jax.device_put(arr, repl) if replicate_rest else arr

    return jtu.tree_map_with_path(place, tree)
