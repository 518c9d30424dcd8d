import numpy as np
import jax.numpy as jnp
import pytest

from ka9q_radio_tpu.ops.iir import (
    first_order_scan,
    ema_smooth,
    iir_notch_coeffs,
    iir_lp4_coeffs,
    iir_dc_coeffs,
    iir_apply,
    goertzel_coeff,
    goertzel_init,
    goertzel_update_block,
    goertzel_output,
)


def _df2_reference(x, b, a):
    """Plain-python direct-form-II, mirroring applyIIR (iir.c:107-124)."""
    order = len(a) - 1
    w = np.zeros(order + 1)
    y = np.zeros_like(x, dtype=np.float64)
    for n, xn in enumerate(x):
        w[1:] = w[:-1].copy()
        w[0] = xn - np.dot(a[1:], w[1:order + 1])
        y[n] = np.dot(b, w[: len(b)])
    return y


def test_first_order_scan_matches_loop():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 50)).astype(np.float32)
    c, y0 = 0.9, 0.5
    got = np.asarray(first_order_scan(c, x, np.full(3, y0, np.float32)))
    want = np.zeros_like(x)
    for i in range(3):
        prev = y0
        for n in range(50):
            prev = c * prev + x[i, n]
            want[i, n] = prev
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_ema_smooth():
    x = np.ones(100, np.float32) * 2.0
    y = np.asarray(ema_smooth(x, 0.1, 0.0))
    assert y[-1] == pytest.approx(2.0, abs=1e-3)
    assert y[0] == pytest.approx(0.2)


@pytest.mark.parametrize(
    "coeffs",
    [iir_notch_coeffs(100.0 / 24000.0), iir_lp4_coeffs(300.0 / 24000.0), iir_dc_coeffs()],
)
def test_iir_apply_matches_df2(coeffs):
    b, a = coeffs
    rng = np.random.default_rng(1)
    x = rng.normal(size=200).astype(np.float32)
    got, _ = iir_apply(jnp.asarray(x), b, a)
    want = _df2_reference(x.astype(np.float64), b, a)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_iir_apply_carries_state_across_blocks():
    b, a = iir_lp4_coeffs(300.0 / 24000.0)
    rng = np.random.default_rng(2)
    x = rng.normal(size=256).astype(np.float32)
    y_full, _ = iir_apply(jnp.asarray(x), b, a)
    y1, w = iir_apply(jnp.asarray(x[:128]), b, a)
    y2, _ = iir_apply(jnp.asarray(x[128:]), b, a, w0=w)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(y1), np.asarray(y2)]), np.asarray(y_full), rtol=1e-4, atol=1e-5
    )


def test_notch_kills_tone():
    f = 100.0 / 8000.0
    b, a = iir_notch_coeffs(f)
    n = np.arange(16000)
    x = np.sin(2 * np.pi * f * n).astype(np.float32)
    y, _ = iir_apply(jnp.asarray(x), b, a)
    tail = np.asarray(y)[-4000:]
    assert np.sqrt(np.mean(tail**2)) < 0.01  # > 37 dB suppression of the tone


def test_goertzel_tone_gain():
    # N on-frequency unit-peak samples -> |output| == N/2 (iir.c comment)
    fs = 24000.0
    f = 100.0 / fs
    N = 2400
    x = np.cos(2 * np.pi * f * np.arange(N)).astype(np.float32)
    coeff, cf = goertzel_coeff(f)
    st = goertzel_init()
    st = goertzel_update_block(st, jnp.asarray(x), coeff)
    out = complex(np.asarray(goertzel_output(st, coeff, cf)))
    assert abs(out) == pytest.approx(N / 2, rel=1e-3)
    # off-frequency tone rejected
    x2 = np.cos(2 * np.pi * 250.0 / fs * np.arange(N)).astype(np.float32)
    st2 = goertzel_update_block(goertzel_init(), jnp.asarray(x2), coeff)
    out2 = complex(np.asarray(goertzel_output(st2, coeff, cf)))
    assert abs(out2) < 0.05 * N / 2


def test_goertzel_multiblock_equals_oneshot():
    fs = 24000.0
    f = 123.0 / fs
    coeff, cf = goertzel_coeff(f)
    rng = np.random.default_rng(3)
    x = rng.normal(size=960).astype(np.float32)
    one = goertzel_update_block(goertzel_init(), jnp.asarray(x), coeff)
    multi = goertzel_init()
    for i in range(4):
        multi = goertzel_update_block(multi, jnp.asarray(x[i * 240 : (i + 1) * 240]), coeff)
    np.testing.assert_allclose(float(one["s0"]), float(multi["s0"]), rtol=1e-3)
    np.testing.assert_allclose(float(one["s1"]), float(multi["s1"]), rtol=1e-3)
