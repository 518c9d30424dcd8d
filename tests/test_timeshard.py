"""Time-axis halo exchange (parallel/timeshard.py, SURVEY §2.5 P5):
D blocks transformed in parallel across the mesh must equal D sequential
master_fft steps, with the (M-1) context crossing shards via ppermute."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ka9q_radio_tpu.ops.filterbank import MasterConfig, master_init, master_fft
from ka9q_radio_tpu.parallel import make_mesh
from ka9q_radio_tpu.parallel.timeshard import batch_master_fft


@pytest.mark.parametrize("real", [True, False])
def test_batch_equals_sequential(real):
    cfg = MasterConfig.from_rate(128_000, real=real)
    mesh = make_mesh()
    D = mesh.devices.size
    rng = np.random.default_rng(0)
    nbatches = 3
    if real:
        x = rng.standard_normal((nbatches * D, cfg.L)).astype(np.float32)
    else:
        x = (rng.standard_normal((nbatches * D, cfg.L))
             + 1j * rng.standard_normal((nbatches * D, cfg.L))).astype(np.complex64)

    # sequential reference
    st = master_init(cfg)
    seq = []
    for b in x:
        st, F = master_fft(cfg, st, jnp.asarray(b))
        seq.append(np.asarray(F))

    # batched: D blocks per call, halo ppermuted between shards
    tail = master_init(cfg)["tail"]
    fn = jax.jit(lambda t, blks: batch_master_fft(cfg, t, blks, mesh))
    got = []
    for k in range(nbatches):
        tail, F = fn(tail, jnp.asarray(x[k * D : (k + 1) * D]))
        got.append(np.asarray(F))
    got = np.concatenate(got, axis=0)
    seq = np.stack(seq)
    scale = np.max(np.abs(seq))
    assert np.max(np.abs(got - seq)) / scale < 1e-6  # identical math

    # and the carried tail equals the stream's true last M-1 samples
    np.testing.assert_allclose(np.asarray(tail), x[-1][cfg.L - (cfg.M - 1):],
                               rtol=0, atol=0)
