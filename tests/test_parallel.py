"""Multi-chip paths on the 8-device CPU mesh: distributed FFT, channel
sharding equivalence, and the graft dryrun."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ka9q_radio_tpu.parallel import make_mesh, shard_engine_tree
from ka9q_radio_tpu.parallel.fft import distributed_fft, plan_split


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(jax.devices()[:8])


def test_plan_split():
    n1, n2 = plan_split(768_000, 8)
    assert n1 * n2 == 768_000 and n1 % 8 == 0
    assert 0.1 < n1 / n2 < 10.0


@pytest.mark.parametrize("N", [4096, 76_800])
def test_distributed_fft_matches_dense(mesh, N):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(N) + 1j * rng.standard_normal(N)).astype(np.complex64)
    want = np.fft.fft(x)
    xd = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("c")))
    got = np.asarray(jax.jit(lambda v: distributed_fft(v, mesh))(xd))
    # relative error vs the dense transform
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 2e-4, err


def test_channel_sharding_equivalence(mesh):
    """Sharding the channel axis must not change the numbers."""
    from ka9q_radio_tpu.runtime import ChannelSpec, GroupSpec, Engine, SigGenConfig, siggen_init, siggen_block

    FS = 512_000
    freqs = np.linspace(-180_000, 180_000, 16)
    eng = Engine(samprate=FS, real=False, groups=[GroupSpec(
        name="fm", demod="fm", samprate=16_000,
        channels=tuple(ChannelSpec(freq=float(f), low=-8000.0, high=8000.0) for f in freqs))])
    src = SigGenConfig(samprate=FS, real=False, carrier_hz=freqs[5], amplitude=0.05,
                       noise_n0=10 ** (-120 / 10), fm_deviation_hz=3000.0)

    def run(shard):
        state, params = eng.init_state(), eng.init_params()
        s = siggen_init(src, 0)
        if shard:
            state = shard_engine_tree(eng, mesh, state)
            params = shard_engine_tree(eng, mesh, params)
        step = jax.jit(eng.step)
        for _ in range(8):
            s, block = siggen_block(src, s, eng.L)
            if shard:
                block = jax.device_put(block, NamedSharding(mesh, P()))
            state, out = step(state, params, block)
        return jax.device_get(out["fm"])

    a = run(False)
    b = run(True)
    np.testing.assert_allclose(a["audio"], b["audio"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(a["info"]["fm_snr"], b["info"]["fm_snr"], rtol=1e-3)


def test_graft_dryrun():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)
