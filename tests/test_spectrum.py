"""Spectrum pseudo-demod: carrier shows up in the right bin at ~0 dBFS."""
import numpy as np
import jax

from ka9q_radio_tpu.runtime import SigGenConfig, siggen_init, siggen_block, ChannelSpec, GroupSpec, Engine

FS = 1_024_000


def test_spectrum_carrier_bin():
    amp = 0.5
    offset = 1000.0  # carrier 1 kHz above channel center
    src = SigGenConfig(samprate=FS, real=False, carrier_hz=200_000.0 + offset,
                       amplitude=amp, noise_n0=10 ** (-130.0 / 10.0))
    eng = Engine(
        samprate=FS, real=False,
        groups=[GroupSpec(
            name="spect", demod="spectrum", samprate=32_000,
            bin_bw=100.0, bin_count=128,
            channels=(ChannelSpec(freq=200_000.0, low=-16_000.0, high=16_000.0),),
        )],
    )
    g = eng.groups["spect"]
    assert abs(g.spectrum_geo.rbw - 100.0) < 20.0

    state, params = eng.init_state(), eng.init_params()
    src_state = siggen_init(src, 0)
    step = jax.jit(eng.step)
    for _ in range(20):
        src_state, block = siggen_block(src, src_state, eng.L)
        state, out = step(state, params, block)
    pwr = np.asarray(jax.device_get(out["spect"]["info"]["bin_data"][0]))

    geo = eng.groups["spect"].spectrum_geo
    # bins are lowest-frequency-first, centered on the channel
    freqs = (np.arange(geo.bin_count) - geo.bin_count // 2) * geo.rbw
    peak_bin = int(np.argmax(pwr))
    assert abs(freqs[peak_bin] - offset) <= geo.rbw, freqs[peak_bin]
    # full-scale convention: amp 0.5 carrier -> |amp|^2 = -6 dBFS
    peak_db = 10 * np.log10(pwr[peak_bin])
    assert abs(peak_db - 20 * np.log10(amp)) < 2.0, peak_db
    # noise bins far below
    far = np.abs(freqs - offset) > 5 * geo.rbw
    assert 10 * np.log10(pwr[far].max()) < peak_db - 40.0
