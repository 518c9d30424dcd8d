"""Worker process for test_multihost: one host of a 2-process DCN mesh.

Runs the sharded Engine over a mesh that SPANS PROCESSES (2 procs x 2
virtual CPU devices): the distributed master FFT's all-to-alls and the
channel gather's psum_scatter ride the cross-process (Gloo/DCN-analog)
backend. Each process validates its addressable audio shards against a
locally computed single-device reference and prints MULTIHOST-OK.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
"""
import os
import sys

os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax

jax.config.update("jax_platforms", "cpu")

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from ka9q_radio_tpu.runtime import ChannelSpec, GroupSpec, Engine
from ka9q_radio_tpu.parallel import shard_engine_tree, engine_sharding_tree

FS = 128_000
D = len(jax.devices())
assert D == 2 * nproc, (D, nproc)
mesh = Mesh(np.array(jax.devices()), ("c",))

span = FS / 2 * 0.8
freqs = np.linspace(-span, span, 8)
groups = [GroupSpec(name="nbfm", demod="fm", samprate=8000,
                    channels=tuple(ChannelSpec(freq=float(f), low=-3000, high=3000)
                                   for f in freqs))]

eng = Engine(samprate=FS, groups=groups, real=False, mesh=mesh)
shardings = engine_sharding_tree(eng, mesh, jax.eval_shape(eng.init_state))
state = jax.jit(eng.init_state, out_shardings=shardings)()
params = shard_engine_tree(eng, mesh, jax.tree.map(np.asarray, eng.groups["nbfm"].host))
params = {"nbfm": params}

rng = np.random.default_rng(0)
n = 3
t = np.arange(n * eng.L) / FS
x = (0.05 * (rng.standard_normal(n * eng.L) + 1j * rng.standard_normal(n * eng.L))
     + 0.5 * np.exp(2j * np.pi * 20_000 * t)).astype(np.complex64)

repl = NamedSharding(mesh, P())
step = jax.jit(eng.step)
for k in range(n):
    blk = x[k * eng.L:(k + 1) * eng.L]
    b = jax.make_array_from_callback(blk.shape, repl, lambda idx: blk[idx])
    state, out = step(state, params, b)

# single-device reference, computed independently in this process
ref = Engine(samprate=FS, groups=groups, real=False)
rs, rp = jax.jit(ref.init_state)(), ref.init_params()
rstep = jax.jit(ref.step)
for k in range(n):
    rs, rout = rstep(rs, rp, jnp.asarray(x[k * eng.L:(k + 1) * eng.L]))
ref_audio = np.asarray(rout["nbfm"]["audio"])

audio = out["nbfm"]["audio"]
checked = 0
for shard in audio.addressable_shards:
    rows = shard.index[0]
    got = np.asarray(shard.data)
    want = ref_audio[rows]
    assert np.max(np.abs(got - want)) < 2e-3, (pid, rows)
    checked += got.shape[0]
assert checked == 8 // nproc, checked  # this process's channel rows
# and the time-axis halo (P5) across the SAME cross-process mesh: D
# consecutive blocks, one per device, the (M-1) context ppermuted over
# the process boundary — equals sequential master_fft bit-for-bit
from ka9q_radio_tpu.ops.filterbank import master_init, master_fft
from ka9q_radio_tpu.parallel.timeshard import batch_master_fft

cfgm = eng.master
tail0 = np.zeros(cfgm.M - 1, np.complex64)
blocks = (rng.standard_normal((D, cfgm.L)) + 1j * rng.standard_normal((D, cfgm.L))).astype(np.complex64)
tail_g = jax.make_array_from_callback(tail0.shape, repl, lambda idx: tail0[idx])
bspec = NamedSharding(mesh, P("c", None))
blocks_g = jax.make_array_from_callback(blocks.shape, bspec, lambda idx: blocks[idx])
new_tail, Fb = jax.jit(lambda t, b: batch_master_fft(cfgm, t, b, mesh))(tail_g, blocks_g)

st_ref = {"tail": jnp.asarray(tail0), "jobnum": jnp.zeros((), jnp.int32)}
seq = []
for d in range(D):
    st_ref, Fd = master_fft(cfgm, st_ref, jnp.asarray(blocks[d]))
    seq.append(np.asarray(Fd))
for shard in Fb.addressable_shards:
    d = shard.index[0].start or 0
    got = np.asarray(shard.data)[0]
    scale = max(np.max(np.abs(seq[d])), 1e-9)
    assert np.max(np.abs(got - seq[d])) / scale < 1e-5, ("halo", pid, d)

print(f"proc {pid}: MULTIHOST-OK checked {checked} channels + timeshard halo", flush=True)
