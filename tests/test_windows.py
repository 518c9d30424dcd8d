import numpy as np
import pytest

from ka9q_radio_tpu.ops.windows import make_window, kaiser, window_noise_bandwidth, WINDOW_TYPES


def test_kaiser_matches_numpy():
    w = kaiser(101, 11.0)
    np.testing.assert_allclose(w, np.kaiser(101, 11.0), rtol=1e-12)


def test_kaiser_beta_zero_is_rect():
    np.testing.assert_allclose(kaiser(64, 0.0), np.ones(64), rtol=1e-12)


@pytest.mark.parametrize("kind", WINDOW_TYPES)
def test_windows_basic(kind):
    w = make_window(kind, 129)
    assert w.shape == (129,)
    assert np.all(np.isfinite(w))
    # symmetric windows
    np.testing.assert_allclose(w, w[::-1], atol=1e-12)
    # peak at center (hp5ft overshoots 1.0 by design, rect is flat)
    assert abs(w[64]) >= abs(w[0])


def test_hann_hamming_values():
    hann = make_window("hann", 5)
    np.testing.assert_allclose(hann, [0, 0.5, 1.0, 0.5, 0], atol=1e-12)
    ham = make_window("hamming", 5)
    a = 25.0 / 46.0
    np.testing.assert_allclose(ham[0], a - (1 - a), atol=1e-12)
    np.testing.assert_allclose(ham[2], 1.0, atol=1e-12)


def test_noise_bandwidth():
    # rectangular window ENBW = 1 bin; hann = 1.5 bins
    assert window_noise_bandwidth(make_window("rect", 1024)) == pytest.approx(1.0)
    assert window_noise_bandwidth(make_window("hann", 4096)) == pytest.approx(1.5, rel=1e-3)


def test_parse_frequency():
    from ka9q_radio_tpu.utils.parse import parse_frequency

    assert parse_frequency("147m435") == pytest.approx(147.435e6)
    assert parse_frequency("10.1m") == pytest.approx(10.1e6)
    assert parse_frequency("760k") == pytest.approx(760e3)
    assert parse_frequency("1g296") == pytest.approx(1.296e9)
    assert parse_frequency("12345") == pytest.approx(12345.0)
    # an explicit decimal point counts as a radix and disables the
    # magnitude heuristic (misc.c:778-793): plain Hz
    assert parse_frequency("14.074", default_heuristic=True) == pytest.approx(14.074)
    assert parse_frequency("7040", default_heuristic=True) == pytest.approx(7.04e6)
    assert parse_frequency("446", default_heuristic=True) == pytest.approx(446e6)


def test_units():
    from ka9q_radio_tpu.utils.units import power_to_dB, dB_to_power, voltage_to_dB, dB_to_voltage

    assert power_to_dB(100.0) == pytest.approx(20.0)
    assert dB_to_power(3.0) == pytest.approx(1.9952623)
    assert voltage_to_dB(10.0) == pytest.approx(20.0)
    assert dB_to_voltage(6.0) == pytest.approx(1.9952623)
