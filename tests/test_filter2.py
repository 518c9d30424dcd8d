"""filter2 cascade sharpness + independent-sideband unpack."""
import numpy as np
import jax
import pytest

from ka9q_radio_tpu.runtime import ChannelSpec, GroupSpec, Engine

FS = 1_024_000


def run_tones(eng, gname, tones, nblocks=16):
    """tones: [(freq_hz, amp)] complex carriers. Returns audio blocks."""
    n = nblocks * eng.L
    t = np.arange(n) / FS
    sig = sum(a * np.exp(2j * np.pi * f * t) for f, a in tones)
    sig = (sig + 1e-7 * (np.random.default_rng(0).standard_normal(n))).astype(np.complex64)
    state, params = eng.init_state(), eng.init_params()
    step = jax.jit(eng.step)
    outs = []
    for k in range(nblocks):
        state, out = step(state, params, sig[k * eng.L : (k + 1) * eng.L])
        outs.append(np.asarray(jax.device_get(out[gname]["audio"])))
    return np.concatenate(outs[6:], axis=1)


def band_db(x, freq, fs):
    w = np.hanning(x.size)
    S = np.abs(np.fft.rfft(x * w)) ** 2
    f = np.fft.rfftfreq(x.size, 1 / fs)
    m = (f > freq - 40) & (f < freq + 40)
    return 10 * np.log10(S[m].sum() + 1e-30)


def test_filter2_sharpens_cw_filter():
    def mk(filter2):
        return Engine(
            samprate=FS, real=False,
            groups=[GroupSpec(
                name="cw", demod="linear", samprate=16_000, agc=False,
                filter2=filter2, snr_squelch=False,
                channels=(ChannelSpec(freq=200_000.0, low=-200.0, high=200.0,
                                      shift_hz=500.0, gain_db=0.0),),
            )],
        )

    # in-band tone at +100 Hz (audio 600 Hz after shift), interferer at +600 Hz
    tones = [(200_100.0, 0.05), (200_600.0, 0.05)]
    a1 = run_tones(mk(0), "cw", tones)[0]
    a4 = run_tones(mk(4), "cw", tones)[0]
    want1, spur1 = band_db(a1, 600.0, 16_000), band_db(a1, 1100.0, 16_000)
    want4, spur4 = band_db(a4, 600.0, 16_000), band_db(a4, 1100.0, 16_000)
    # passband preserved within 1 dB
    assert abs(want4 - want1) < 1.0
    # cascade improves stopband rejection markedly
    rej1 = want1 - spur1
    rej4 = want4 - spur4
    assert rej4 > rej1 + 20.0, (rej1, rej4)
    assert rej4 > 60.0


def test_isb_separates_sidebands():
    eng = Engine(
        samprate=FS, real=False,
        groups=[GroupSpec(
            name="isb", demod="linear", samprate=16_000, agc=False, stereo=True,
            filter2=1, isb=True,
            channels=(ChannelSpec(freq=200_000.0, low=-5000.0, high=5000.0, gain_db=0.0),),
        )],
    )
    # USB tone +1 kHz, LSB tone -700 Hz
    audio = run_tones(eng, "isb", [(201_000.0, 0.05), (199_300.0, 0.05)])
    left, right = audio[0, :, 0], audio[0, :, 1]
    # each output channel carries one sideband
    l1000, l700 = band_db(left, 1000.0, 16_000), band_db(left, 700.0, 16_000)
    r1000, r700 = band_db(right, 1000.0, 16_000), band_db(right, 700.0, 16_000)
    sep_a = (l1000 - l700) + (r700 - r1000)
    sep_b = (l700 - l1000) + (r1000 - r700)
    assert max(sep_a, sep_b) > 60.0, (l1000, l700, r1000, r700)
