"""Dual-antenna beamforming: antennas on I/Q rails, complex weights select
or null each antenna (filter.c:723-742 fobos independent-input mode)."""
import numpy as np
import jax
import pytest

from ka9q_radio_tpu.runtime import ChannelSpec, GroupSpec, Engine
from ka9q_radio_tpu.config import load_config

FS = 1_024_000


def run(eng, sig, gname, nblocks):
    state, params = eng.init_state(), eng.init_params()
    step = jax.jit(eng.step)
    for k in range(nblocks):
        state, out = step(state, params, sig[k * eng.L : (k + 1) * eng.L])
    return jax.device_get(out[gname])


def make_signal(nblocks, L):
    n = nblocks * L
    t = np.arange(n) / FS
    ant1 = 0.1 * np.cos(2 * np.pi * 100_000 * t)  # antenna A on I
    ant2 = 0.1 * np.cos(2 * np.pi * 110_000 * t)  # antenna B on Q
    return (ant1 + 1j * ant2).astype(np.complex64)


@pytest.mark.parametrize("a,b,want,null", [
    (0.5 + 0j, 0.5 + 0j, 100_000.0, 110_000.0),   # select antenna A
    (0.5 + 0j, -0.5 + 0j, 110_000.0, 100_000.0),  # select antenna B
])
def test_beam_antenna_selection(a, b, want, null):
    eng = Engine(
        samprate=FS, real=False,
        groups=[GroupSpec(
            name="beam", demod="iq", samprate=16_000, agc=False, beam=True,
            a_weight=a, b_weight=b,
            channels=(ChannelSpec(freq=100_000.0, low=-6000.0, high=6000.0, gain_db=0.0),
                      ChannelSpec(freq=110_000.0, low=-6000.0, high=6000.0, gain_db=0.0)),
        )],
    )
    sig = make_signal(10, eng.L)
    out = run(eng, sig, "beam", 10)
    p = np.asarray(out["info"]["baseband_power"])
    p_want = p[0] if want == 100_000.0 else p[1]
    p_null = p[0] if null == 100_000.0 else p[1]
    assert p_want > 1e-5
    assert p_want / max(p_null, 1e-30) > 1e4  # >40 dB antenna isolation


def test_beam_config_keys():
    cfg = load_config("""
[global]
hardware =
mode = iq
[beamch]
mode = iq
samprate = 16k
beam = yes
a-amp = 0.5
a-phase = 0
b-amp = 0.5
b-phase = 180
freq = 100k0
""")
    g = cfg.groups[0]
    assert g.beam
    assert abs(g.a_weight - 0.5) < 1e-9
    assert abs(g.b_weight + 0.5) < 1e-9
