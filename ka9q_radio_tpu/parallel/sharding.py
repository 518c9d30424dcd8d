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


def engine_sharding_tree(engine, mesh: Mesh, tree):
    """NamedSharding pytree for an engine state/params(-shaped) tree.

    Explicit pytree-path policy (not a shape heuristic): a leaf shards
    P('c') iff its key path passes through a group-name dict key (engine
    params are {group: ...}; engine state is {"groups": {group: ...}}) AND
    its leading dimension equals THAT group's channel count — so a master
    leaf or a [C, ...]-shaped non-channel leaf can never shard by
    coincidence. Everything else (master tail, spur trackers, scalars)
    replicates. `tree` may hold arrays or ShapeDtypeStructs (eval_shape),
    so this doubles as a jit out_shardings builder.
    """
    import jax.tree_util as jtu

    axis = mesh.axis_names[0]
    # time-sharded engines (Engine(time_shards=D)) parallelize over the
    # BLOCK axis: every device demods all channels of its own block, so
    # state/params replicate — nothing shards by channel
    group_C = ({} if getattr(engine, "time_shards", 0)
               else {name: g.C for name, g in engine.groups.items()
                     if g.C % mesh.devices.size == 0})
    chan = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    digit_cols = bool(getattr(engine, "digit_cols", False))

    def pick(path, leaf):
        keys = [k.key for k in path if isinstance(k, jtu.DictKey)]
        shape = getattr(leaf, "shape", ())
        if digit_cols and keys[-2:] == ["master", "tail"] and len(shape) >= 2:
            # column-layout master tail (engine.digit_cols): whole sample
            # rows, sharded over the transform's column axis
            return NamedSharding(mesh, P(*([None] * (len(shape) - 1)), axis))
        gname = next((k for k in keys if k in group_C), None)
        if gname is not None and len(shape) >= 1 and shape[0] == group_C[gname]:
            return chan
        return repl

    return jtu.tree_map_with_path(pick, tree)


def shard_engine_tree(engine, mesh: Mesh, tree, replicate_rest: bool = True):
    """Place an engine state or params pytree per engine_sharding_tree.

    Works across processes too (multi-host meshes): leaves are built with
    make_array_from_callback, each process contributing its addressable
    shards of the (identical) host value.
    """
    import jax.tree_util as jtu

    shardings = engine_sharding_tree(engine, mesh, tree)
    multiproc = any(d.process_index != jax.process_index()
                    for d in mesh.devices.flat)
    repl = NamedSharding(mesh, P())

    def place(leaf, sh):
        if sh.spec == P() and not replicate_rest and not multiproc:
            return leaf
        if multiproc:
            arr = np.asarray(leaf)
            return jax.make_array_from_callback(arr.shape, sh, lambda idx: arr[idx])
        # single-process: device_put relays out on-device (no host round
        # trip — the flaky-tunnel rule in CLAUDE.md)
        return jax.device_put(leaf, sh)

    return jax.tree.map(place, tree, shardings)
