"""WFM stereo end-to-end: synthetic FM broadcast -> stereo separation.

Builds a standards-compliant stereo multiplex (mono + 19 kHz pilot + DSB
L-R on 38 kHz), FM-modulates it at 75 kHz deviation onto a carrier in a
3.84 Msps complex front-end stream, and checks the engine's WFM group
detects the pilot, recovers the left-only 1 kHz tone, and achieves real
stereo separation (BASELINE.md config #3).
"""
import numpy as np
import jax
import pytest

from ka9q_radio_tpu.runtime import ChannelSpec, GroupSpec, Engine

FS = 3_840_000
BLOCKS = 25
TONE = 1000.0
PILOT = 19_000.0
DEV = 75_000.0
STATION = 500_000.0


def make_wfm_signal(nblocks, L, stereo=True, seed=1):
    n = nblocks * L
    t = np.arange(n, dtype=np.float64) / FS
    left = np.cos(2 * np.pi * TONE * t)  # tone in LEFT channel only
    right = np.zeros_like(t)
    mono = 0.5 * (left + right)
    diff = 0.5 * (left - right)
    comp = 0.45 * 2 * mono
    if stereo:
        comp = comp + 0.1 * np.sin(2 * np.pi * PILOT * t) + 0.45 * 2 * diff * np.sin(2 * np.pi * 2 * PILOT * t)
    phase = 2 * np.pi * np.cumsum(STATION + DEV * comp) / FS
    sig = 0.25 * np.exp(1j * phase)
    rng = np.random.default_rng(seed)
    noise = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) * 1e-4
    return (sig + noise).astype(np.complex64)


@pytest.fixture(scope="module")
def wfm_engine():
    eng = Engine(
        samprate=FS,
        real=False,
        groups=[GroupSpec(
            name="wfm", demod="wfm", samprate=384_000,
            channels=(ChannelSpec(freq=STATION, low=-100_000.0, high=100_000.0),),
        )],
    )
    return eng


def run(eng, sig):
    state, params = eng.init_state(), eng.init_params()
    step = jax.jit(eng.step)
    outs = []
    for k in range(sig.size // eng.L):
        state, out = step(state, params, sig[k * eng.L : (k + 1) * eng.L])
        outs.append(jax.device_get(out["wfm"]))
    return outs


def tone_power(x, freq, fs=48_000):
    w = np.hanning(x.size)
    spec = np.abs(np.fft.rfft(x * w)) ** 2
    f = np.fft.rfftfreq(x.size, 1.0 / fs)
    band = (f > freq - 50) & (f < freq + 50)
    return spec[band].sum()


def test_wfm_stereo_decode(wfm_engine):
    sig = make_wfm_signal(BLOCKS, wfm_engine.L, stereo=True)
    outs = run(wfm_engine, sig)
    assert bool(outs[-1]["info"]["stereo"][0]), "pilot not detected"
    assert outs[-1]["info"]["squelch_state"][0] > 0
    audio = np.concatenate([o["audio"][0] for o in outs[10:]], axis=0)  # [T, 2]
    lp = tone_power(audio[:, 0], TONE)
    rp = tone_power(audio[:, 1], TONE)
    sep_db = 10 * np.log10(lp / max(rp, 1e-30))
    assert sep_db > 20.0, f"stereo separation {sep_db:.1f} dB"
    # recovered deviation should be in the ballpark of 75 kHz
    pdev = float(outs[-1]["info"]["pdeviation"][0])
    assert 40_000.0 < pdev < 110_000.0, pdev


def test_wfm_mono_fallback(wfm_engine):
    sig = make_wfm_signal(12, wfm_engine.L, stereo=False)
    outs = run(wfm_engine, sig)
    assert not bool(outs[-1]["info"]["stereo"][0])
    audio = np.concatenate([o["audio"][0] for o in outs[6:]], axis=0)
    # both channels carry the tone identically in mono fallback
    assert np.allclose(audio[:, 0], audio[:, 1])
    assert tone_power(audio[:, 0], TONE) > 100 * tone_power(audio[:, 0], 3 * TONE)
