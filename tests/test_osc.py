import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ka9q_radio_tpu.ops.osc import (
    rev_to_q32,
    q32_to_rev,
    cis_q32,
    phase_ramp_q32,
    pll_params,
    pll_init,
    pll_step,
)


def test_rev_q32_roundtrip():
    for rev in [0.0, 0.25, -0.25, 0.123456, 0.999999, 1.75, -3.3]:
        q = rev_to_q32(rev)
        back = float(q32_to_rev(q))
        want = ((rev + 0.5) % 1.0) - 0.5
        assert abs(back - want) < 1e-6


def test_phase_ramp_matches_numpy():
    f = 123.456 / 48000.0  # rev/sample
    inc = rev_to_q32(f)
    acc = rev_to_q32(0.1)
    ramp, new_acc = phase_ramp_q32(jnp.int32(acc), jnp.int32(inc), 256)
    # step_osc returns the phasor BEFORE advancing (osc.c:62-71):
    # sample n carries phase acc + n*inc
    n = np.arange(0, 256)
    want = np.exp(2j * np.pi * (0.1 + f * n))
    # Q32 quantization of f: error bounded by 256 * 2^-32 revolutions
    np.testing.assert_allclose(np.asarray(ramp), want, atol=2e-5)
    assert np.all(np.abs(np.abs(np.asarray(ramp)) - 1.0) < 1e-6)


def test_phase_ramp_block_continuity():
    # Accumulator carried across blocks == one long ramp (exact, wraps and all)
    inc = jnp.int32(rev_to_q32(0.01237))
    acc = jnp.int32(rev_to_q32(0.0))
    chunks = []
    for _ in range(20):
        ramp, acc = phase_ramp_q32(acc, inc, 100)
        chunks.append(np.asarray(ramp))
    got = np.concatenate(chunks)
    one, _ = phase_ramp_q32(jnp.int32(rev_to_q32(0.0)), inc, 2000)
    np.testing.assert_allclose(got, np.asarray(one), atol=1e-6)


def test_phase_ramp_batched():
    accs = jnp.array([rev_to_q32(0.0), rev_to_q32(0.5)], jnp.int32)
    incs = jnp.array([rev_to_q32(0.1), rev_to_q32(-0.2)], jnp.int32)
    ramp, new = phase_ramp_q32(accs, incs, 10)
    assert ramp.shape == (2, 10)
    np.testing.assert_allclose(
        np.asarray(ramp[1]), np.exp(2j * np.pi * (0.5 - 0.2 * np.arange(0, 10))), atol=1e-5
    )


def test_pll_locks_onto_carrier():
    # Simulate the linear demod's PLL loop: mix carrier with VCO, feed phase
    # error back. The loop should converge so VCO frequency == carrier freq.
    fs = 12000.0
    f_carrier = 37.5  # Hz
    k1, k2 = pll_params(100.0 / fs)  # 100 Hz loop bw

    state = pll_init()
    n_samples = 6000

    def step(carry, n):
        st = carry
        carrier_ph = f_carrier / fs * n  # revolutions
        vco_rev = q32_to_rev(st["vco_phase"])
        err = carrier_ph - vco_rev
        err = (err + 0.5) % 1.0 - 0.5  # wrap to [-0.5, 0.5)
        st, u = pll_step(st, err, k1, k2)
        return st, u

    state, us = jax.lax.scan(step, state, jnp.arange(n_samples, dtype=jnp.float32))
    final_freq_hz = float(us[-1]) * fs
    assert final_freq_hz == pytest.approx(f_carrier, abs=0.5)


def test_pll_params_reference_values():
    # set_pll_params(bw=0.01, damping=1/sqrt(2)) — recompute per osc.c:153-168
    k1, k2 = pll_params(0.01, 1.0 / np.sqrt(2.0))
    damping = 1.0 / np.sqrt(2.0)
    denom = damping + 1.0 / (4 * damping)
    theta = 4 * np.pi * 0.01 / denom
    D = 1 + 2 * damping * theta + theta * theta
    assert float(k1) == pytest.approx(4 * damping * theta / D, rel=1e-5)
    assert float(k2) == pytest.approx(4 * theta * theta / D, rel=1e-5)
