"""Linear demodulator tests (SSB/CW/AM/IQ with AGC, PLL, squelch)."""
import numpy as np
import jax.numpy as jnp
import pytest

from ka9q_radio_tpu.models.linear import linear_init, linear_demod
from ka9q_radio_tpu.ops.osc import rev_to_q32

FS = 12_000
BT = 0.02
N = int(FS * BT)  # 240
HEADROOM = 10 ** (-10 / 20)


def _params(C=1, agc=True, gain_db=0.0, shift_hz=0.0, square=False,
            pll_bw=100.0, snr_squelch=False, threshold_db=-15.0, dc_tau=0.0):
    return {
        "agc_enable": jnp.full((C,), agc, jnp.bool_),
        "headroom": jnp.full((C,), HEADROOM, jnp.float32),
        "hangtime_samples": jnp.full((C,), int(1.1 * FS), jnp.int32),
        "recovery_per_sample": jnp.full((C,), 10 ** (20.0 / 20.0 / FS), jnp.float32),
        "threshold": jnp.full((C,), 10 ** (threshold_db / 20.0), jnp.float32),
        "bandwidth": jnp.full((C,), 3000.0, jnp.float32),
        "manual_gain": jnp.full((C,), 10 ** (gain_db / 20.0), jnp.float32),
        "shift_inc_q32": jnp.full((C,), rev_to_q32(shift_hz / FS), jnp.int32),
        "pll_square": jnp.full((C,), square, jnp.bool_),
        "pll_loop_bw": jnp.full((C,), pll_bw, jnp.float32),
        "squelch_open": jnp.full((C,), 6.3, jnp.float32),
        "squelch_close": jnp.full((C,), 4.0, jnp.float32),
        "squelch_tail": jnp.zeros((C,), jnp.int32),
        "snr_squelch_enable": jnp.full((C,), snr_squelch, jnp.bool_),
        "dc_tau": jnp.full((C,), dc_tau, jnp.float32),
    }


def _run(x, params, nblocks, n0=1e-12, **flags):
    C = 1
    state = linear_init(C)
    outs, infos = [], []
    for k in range(nblocks):
        bb = jnp.asarray(x[k * N : (k + 1) * N])[None, :]
        bbp = jnp.mean(jnp.abs(bb) ** 2, axis=-1)
        state, audio, info = linear_demod(
            state, bb, bbp, jnp.full((C,), n0, jnp.float32), params,
            samprate=FS, blocktime=BT, **flags,
        )
        outs.append(np.asarray(audio[0]))
        infos.append(info)
    return np.concatenate(outs), infos, state


def test_ssb_tone_agc_converges_to_headroom():
    # 800 Hz baseband tone (as after USB downconversion); AGC should bring
    # the output RMS toward headroom * sqrt(2)/... -> peak toward headroom
    t = np.arange(100 * N) / FS
    x = (0.01 * np.exp(2j * np.pi * 800.0 * t)).astype(np.complex64)
    audio, infos, _ = _run(x, _params(), 100)
    a = audio[-10 * N :]
    # mono power convention: output_power = 2*mean(s^2) -> Re of unit phasor
    # with RMS amp/sqrt2; AGC targets amplitude = headroom
    rms = np.sqrt(np.mean(a**2) * 2)
    assert rms == pytest.approx(HEADROOM, rel=0.1)
    spec = np.abs(np.fft.rfft(a * np.hanning(a.size)))
    freqs = np.fft.rfftfreq(a.size, 1 / FS)
    assert abs(freqs[np.argmax(spec)] - 800.0) < 5


def test_agc_instant_clamp_on_loud_signal():
    # quiet signal then a 30 dB jump: peak detector must clamp within a block
    t = np.arange(40 * N) / FS
    x = np.exp(2j * np.pi * 500.0 * t).astype(np.complex64)
    x[: 20 * N] *= 0.03
    audio, infos, _ = _run(x, _params(), 40)
    loud = audio[20 * N : 21 * N]
    assert np.max(np.abs(loud)) < 4 * HEADROOM  # bounded overshoot in the jump block
    after = audio[22 * N : 24 * N]
    assert np.max(np.abs(after)) < 1.2 * HEADROOM


def test_cw_shift_oscillator():
    # CW: carrier at DC after downconversion, post-detection shift 500 Hz
    t = np.arange(20 * N) / FS
    x = (0.1 * np.ones_like(t)).astype(np.complex64)
    audio, _, _ = _run(x, _params(shift_hz=500.0), 20)
    a = audio[-8 * N :]
    spec = np.abs(np.fft.rfft(a * np.hanning(a.size)))
    freqs = np.fft.rfftfreq(a.size, 1 / FS)
    assert abs(freqs[np.argmax(spec)] - 500.0) < 5


def test_envelope_am_detection():
    # AM: carrier with 50% 400 Hz modulation, envelope detector + DC removal
    t = np.arange(60 * N) / FS
    env = 1.0 + 0.5 * np.cos(2 * np.pi * 400.0 * t)
    x = (0.2 * env * np.exp(2j * np.pi * 0.0 * t)).astype(np.complex64)
    audio, _, _ = _run(x, _params(dc_tau=0.01), 60, envelope=True)
    a = audio[-10 * N :]
    spec = np.abs(np.fft.rfft(a * np.hanning(a.size)))
    freqs = np.fft.rfftfreq(a.size, 1 / FS)
    assert abs(freqs[np.argmax(spec)] - 400.0) < 5
    assert abs(np.mean(a)) < 0.01  # DC removed


def test_iq_stereo_passthrough():
    t = np.arange(10 * N) / FS
    x = (0.1 * np.exp(2j * np.pi * 300.0 * t)).astype(np.complex64)
    audio, _, _ = _run(x, _params(agc=False, gain_db=0.0), 10, stereo=True)
    assert audio.shape == (10 * N, 2)
    np.testing.assert_allclose(audio[:, 0], 0.1 * np.cos(2 * np.pi * 300.0 * t), atol=1e-4)
    np.testing.assert_allclose(audio[:, 1], 0.1 * np.sin(2 * np.pi * 300.0 * t), atol=1e-4)


def test_pll_tracks_carrier_and_reports_snr():
    # SAM: carrier at +20 Hz offset, PLL locks; foffset readout ~= 20 Hz
    t = np.arange(80 * N) / FS
    rng = np.random.default_rng(5)
    x = (np.exp(2j * np.pi * 20.0 * t) + 0.03 * (rng.normal(size=t.size) + 1j * rng.normal(size=t.size))).astype(np.complex64)
    audio, infos, state = _run(x, _params(), 80, enable_pll=True)
    fo = float(infos[-1]["foffset"][0])
    assert fo == pytest.approx(20.0, abs=2.0)
    assert bool(infos[-1]["pll_lock"][0])
    snr_db = 10 * np.log10(float(infos[-1]["pll_snr"][0]))
    assert snr_db > 20.0


def test_snr_squelch_mutes_noise():
    rng = np.random.default_rng(6)
    x = (0.01 * (rng.normal(size=10 * N) + 1j * rng.normal(size=10 * N))).astype(np.complex64)
    n0 = 1e-4 / 3000.0  # SNR ~ 0 dB against the 3 kHz bandwidth
    audio, infos, _ = _run(x, _params(snr_squelch=True), 10, n0=n0)
    assert np.all(audio[N:] == 0.0)
