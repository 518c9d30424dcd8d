"""Scale-out: device meshes and sharding for the channelizer engine.

The reference parallelizes with one pthread per channel on one host
(SURVEY.md §2.5); here the channel axis is a sharded tensor dimension over a
`jax.sharding.Mesh` and the master spectrum is replicated (or, for the giant
front FFTs, computed distributed — parallel/fft.py, later).
"""
from .sharding import make_mesh, shard_engine_tree, engine_sharding_tree, CHANNEL_AXIS

__all__ = ["make_mesh", "shard_engine_tree", "engine_sharding_tree", "CHANNEL_AXIS"]
