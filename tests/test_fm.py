"""NBFM demodulator tests against synthesized FM baseband."""
import numpy as np
import jax.numpy as jnp
import pytest

from ka9q_radio_tpu.models.fm import fm_init, fm_demod, fm_snr_correct

FS = 24_000
BT = 0.02
N = int(FS * BT)  # 480
BW = 16_000.0
HEADROOM = 10 ** (-10 / 20)  # -10 dBFS


def _params(C=1, tone_freq=0.0, deemph=False, snr_squelch=False, threshold_ext=False):
    rate = 1 - np.exp(-1.0 / (FS * 530.5e-6)) if deemph else 0.0  # 300 Hz corner
    return {
        "bandwidth": jnp.full((C,), BW, jnp.float32),
        "headroom": jnp.full((C,), HEADROOM, jnp.float32),
        "squelch_open": jnp.full((C,), 6.3, jnp.float32),
        "squelch_close": jnp.full((C,), 4.0, jnp.float32),
        "squelch_tail": jnp.zeros((C,), jnp.int32),
        "snr_squelch_enable": jnp.full((C,), snr_squelch, jnp.bool_),
        "threshold_ext": jnp.full((C,), threshold_ext, jnp.bool_),
        "deemph_rate": jnp.full((C,), rate, jnp.float32),
        "deemph_gain": jnp.full((C,), 1.0, jnp.float32),
        "tone_freq": jnp.full((C,), tone_freq, jnp.float32),
    }


def _fm_baseband(f_tones, devs, nblocks, amp=1.0, fs=FS, n0_add=0.0, seed=0):
    """Complex FM baseband: amp * exp(j*2*pi*(dev/fs)*cumsum of sum of tones)."""
    t = np.arange(nblocks * N) / fs
    inst = np.zeros_like(t)
    for f, d in zip(f_tones, devs):
        inst += d * np.cos(2 * np.pi * f * t)
    phase = 2 * np.pi * np.cumsum(inst) / fs
    x = amp * np.exp(1j * phase)
    if n0_add:
        rng = np.random.default_rng(seed)
        x = x + n0_add * (rng.normal(size=t.size) + 1j * rng.normal(size=t.size)) / np.sqrt(2)
    return x.astype(np.complex64)


def _run(x, params, ctcss=False, n0=1e-12):
    C = 1
    state = fm_init(C)
    nblocks = x.size // N
    outs, infos = [], []
    for k in range(nblocks):
        bb = jnp.asarray(x[k * N : (k + 1) * N])[None, :]
        bbp = jnp.mean(jnp.abs(bb) ** 2, axis=-1)
        state, audio, info = fm_demod(
            state, bb, bbp, jnp.full((C,), n0, jnp.float32), params,
            samprate=FS, blocktime=BT, ctcss=ctcss,
        )
        outs.append(np.asarray(audio[0]))
        infos.append(info)
    return np.concatenate(outs), infos, state


def test_fm_tone_demodulation():
    f_mod, dev = 1000.0, 3000.0
    x = _fm_baseband([f_mod], [dev], 10)
    audio, infos, _ = _run(x, _params())
    a = audio[2 * N :]
    # expected peak: gain * 2*dev/fs = (2*headroom*fs/bw) * 2*dev/fs
    want_peak = 4 * HEADROOM * dev / BW
    got_peak = np.percentile(np.abs(a), 99)
    assert got_peak == pytest.approx(want_peak, rel=0.03)
    # spectral purity: single tone at f_mod
    spec = np.abs(np.fft.rfft(a * np.hanning(a.size)))
    freqs = np.fft.rfftfreq(a.size, 1 / FS)
    assert abs(freqs[np.argmax(spec)] - f_mod) < 5.0


def test_fm_squelch_closed_on_noise():
    rng = np.random.default_rng(1)
    x = (0.01 * (rng.normal(size=6 * N) + 1j * rng.normal(size=6 * N))).astype(np.complex64)
    # n0 such that SNR ~ 0 dB: bb_power = 1e-4, noise = n0*bw
    audio, infos, state = _run(x, _params(), n0=1e-4 / BW)
    assert np.all(audio == 0.0)
    assert int(state["squelch_state"][0]) == 0


def test_fm_snr_variance_estimator():
    # strong carrier + noise. NOTE the reference convention: fm_snr()'s
    # theta^2 is carrier power over PER-COMPONENT noise, i.e. true SNR + 3 dB
    # (verified against the reference math in float64: 15 dB true -> 18.0 dB).
    snr_true_db = 15.0
    amp = 1.0
    npow = amp**2 / 10 ** (snr_true_db / 10)
    x = _fm_baseband([1000.0], [2000.0], 30, n0_add=np.sqrt(npow))
    audio, infos, _ = _run(x, _params(), n0=npow / BW)
    got = 10 * np.log10(np.mean([float(i["fm_snr"][0]) for i in infos[5:]]))
    assert got == pytest.approx(snr_true_db + 3.0, abs=1.5)


def test_fm_freq_offset_tracking():
    # 200 Hz static offset appears in foffset readout (1 s EMA time
    # constant -> ~91% converged after 120 blocks = 2.4 s)
    x = _fm_baseband([1000.0], [2000.0], 120)
    # add offset by mixing
    t = np.arange(x.size) / FS
    x = (x * np.exp(2j * np.pi * 200.0 * t)).astype(np.complex64)
    audio, infos, _ = _run(x, _params(deemph=True))
    fo = float(infos[-1]["foffset"][0])
    assert fo == pytest.approx(200.0 * (1 - 0.98**120), abs=15.0)


def test_fm_deemphasis_rolloff():
    # with 300 Hz de-emphasis, a 3 kHz tone is ~ 10x weaker than a 300 Hz tone
    lo = _run(_fm_baseband([300.0], [2000.0], 12), _params(deemph=True))[0][3 * N :]
    hi = _run(_fm_baseband([3000.0], [2000.0], 12), _params(deemph=True))[0][3 * N :]
    ratio = np.std(lo) / np.std(hi)
    assert 6.0 < ratio < 14.0  # one-pole: ~sqrt(1+(f/fc)^2) = ~10 at 10*fc


def test_ctcss_gates_audio():
    pl = 100.0  # Hz tone at 500 Hz deviation
    voice = ([1000.0, pl], [3000.0, 500.0])
    x = _fm_baseband(*voice, 30)
    params = _params(tone_freq=pl)
    audio, infos, state = _run(x, params, ctcss=True)
    # tone present: after the first 240 ms integration, audio unmutes
    assert np.all(audio[: 6 * N] == 0.0)  # muted while integrating
    assert np.any(audio[15 * N :] != 0.0)
    assert float(state["tone_deviation"][0]) == pytest.approx(500.0, rel=0.1)

    # no tone: stays muted forever
    x2 = _fm_baseband([1000.0], [3000.0], 30)
    audio2, _, _ = _run(x2, params, ctcss=True)
    assert np.all(audio2 == 0.0)


def test_fm_snr_correct_limits():
    assert float(fm_snr_correct(0.1)) == 0.0
    assert float(fm_snr_correct(200.0)) == pytest.approx(200.0)
    # moderate SNR: corrected value is below the biased input
    r = 10.0
    c = float(fm_snr_correct(r))
    assert 0 < c < r
