"""Pallas channelizer kernel vs the XLA reference path (interpret mode on
CPU; the same kernel compiles for real TPUs)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ka9q_radio_tpu.ops.filterbank import channelize
from ka9q_radio_tpu.ops.pallas_kernels import channelize_pallas


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_matches_xla_channelize(seed):
    rng = np.random.default_rng(seed)
    m_bins, nb, olen, C = 4096, 256, 192, 8
    F = (rng.standard_normal(m_bins) + 1j * rng.standard_normal(m_bins)).astype(np.complex64)
    resp = (rng.standard_normal((C, nb)) + 1j * rng.standard_normal((C, nb))).astype(np.complex64)
    # include wraparound shifts (near DC and near the edges)
    shifts = np.array([0, 5, -7, 2000, -2000, 2047, -2048 + nb, 100], np.int32)

    want = channelize(jnp.asarray(F), jnp.asarray(resp), jnp.asarray(shifts),
                      olen, real_master=False, master_N=m_bins)
    got = channelize_pallas(jnp.asarray(F), jnp.asarray(resp), jnp.asarray(shifts),
                            olen, master_N=m_bins, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
