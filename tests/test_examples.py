"""The examples/ catalog must stay loadable and internally consistent,
and the front-end `frequency` (center) key must map dial RF exactly."""
import glob
import os

import numpy as np
import jax
import pytest

from ka9q_radio_tpu.config import load_config
from ka9q_radio_tpu.runtime import Engine

EXAMPLES = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "examples", "*.conf")))


@pytest.mark.parametrize("path", EXAMPLES, ids=[os.path.basename(p) for p in EXAMPLES])
def test_example_loads_clean(path):
    """Every example parses with zero unknown-key warnings and its groups
    build into a host-side Engine (validates coverage + commensurate rates)."""
    cfg = load_config(path)
    assert not cfg.warnings, cfg.warnings
    assert cfg.groups, "example defines no channels"
    assert cfg.samprate > 0
    # single-device host-side build (the mesh example builds unsharded here)
    eng = Engine(samprate=cfg.samprate, real=cfg.real, groups=cfg.groups,
                 blocktime=cfg.blocktime, overlap=cfg.overlap, center=cfg.center)
    assert eng.groups


def test_example_count_matches_readme():
    readme = open(os.path.join(os.path.dirname(EXAMPLES[0]), "README.md")).read()
    for p in EXAMPLES:
        assert os.path.basename(p) in readme, f"{os.path.basename(p)} not in examples/README.md"


def test_siggen_example_end_to_end():
    """The self-contained demo actually demodulates its own generator:
    the AM channel on the carrier hears the modulation tone."""
    from ka9q_radio_tpu.runtime.radiod import Radiod

    cfg = load_config(EXAMPLES[[os.path.basename(p) for p in EXAMPLES].index("radiod@siggen.conf")])
    rd = Radiod(cfg, use_network=False)
    for _ in range(12):
        rd.step_block()
    # collect from the sent-packet ring (use_network=False records them)
    from ka9q_radio_tpu.net.rtp import RtpHeader, Encoding, decode_samples
    chunks = []
    for kind, pkt in rd._sent:
        if kind != "data":
            continue
        h, payload = RtpHeader.unpack(pkt)
        if h.ssrc == 500:
            chunks.append(decode_samples(payload, Encoding.S16BE))
    audio = np.concatenate(chunks)
    a = audio[audio.size // 3:]
    A = np.abs(np.fft.rfft(a * np.hanning(a.size)))
    f = np.fft.rfftfreq(a.size, 1 / 12_000)
    A[f < 100] = 0  # envelope DC term is not the tone
    assert abs(f[np.argmax(A)] - 1000.0) < 30  # sig_gen AM tone


def test_center_frequency_maps_rf_exactly():
    """A channel dialed at center+df through a centered front end produces
    BIT-IDENTICAL audio to a baseband channel at +df with center 0."""
    from ka9q_radio_tpu.runtime import ChannelSpec, GroupSpec

    FS, DF = 512_000, 100_000.0
    CENTER = 146_000_000.0

    def run(center):
        eng = Engine(samprate=FS, real=False, center=center, groups=[GroupSpec(
            name="g", demod="linear", samprate=16_000,
            channels=(ChannelSpec(freq=center + DF, low=50.0, high=3000.0),))])
        state = jax.jit(eng.init_state)()
        params = eng.init_params()
        step = jax.jit(eng.step)
        rng = np.random.default_rng(7)
        outs = []
        n = eng.L
        for b in range(6):
            t = (b * n + np.arange(n)) / FS
            x = (0.5 * np.exp(2j * np.pi * (DF + 700.0) * t)
                 + 0.02 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))).astype(np.complex64)
            state, out = step(state, params, x)
            outs.append(np.asarray(out["g"]["audio"][0]))
        return np.concatenate(outs)

    a0 = run(0.0)
    a1 = run(CENTER)
    assert np.array_equal(a0, a1)


def test_center_out_of_coverage_rejected():
    from ka9q_radio_tpu.runtime import ChannelSpec, GroupSpec

    with pytest.raises(ValueError, match="coverage"):
        Engine(samprate=512_000, real=False, center=146e6, groups=[GroupSpec(
            name="g", demod="linear", samprate=16_000,
            channels=(ChannelSpec(freq=100_000.0, low=50.0, high=3000.0),))])
