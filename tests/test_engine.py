"""End-to-end engine tests: sig_gen front end -> Engine.step -> audio.

The TPU analog of the reference's de-facto integration test: run radiod
against the sig_gen driver with a known carrier + calibrated noise, check
the demodulated output and reported signal metrics (SURVEY.md §4.1).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ka9q_radio_tpu.runtime import SigGenConfig, siggen_init, siggen_block, ChannelSpec, GroupSpec, Engine


FS = 1_024_000  # 1.024 Msps front end keeps CPU tests quick
BLOCKTIME = 0.02


def run_blocks(eng, src_cfg, nblocks, seed=0):
    state = eng.init_state()
    params = eng.init_params()
    src = siggen_init(src_cfg, seed)
    step = jax.jit(eng.step)

    outs = []
    for _ in range(nblocks):
        src, block = siggen_block(src_cfg, src, eng.L)
        state, out = step(state, params, block)
        outs.append(jax.device_get(out))
    return outs


def test_nbfm_end_to_end_tone_recovery():
    """FM-modulated carrier + noise -> NBFM group recovers the 1 kHz tone."""
    carrier = 146_520_000.0
    dev = 3000.0
    src = SigGenConfig(
        samprate=FS, real=False, carrier_hz=300_000.0, amplitude=0.05,
        noise_n0=10 ** (-120.0 / 10.0), fm_deviation_hz=dev, tone_hz=1000.0,
    )
    eng = Engine(
        samprate=FS, real=False,
        groups=[GroupSpec(
            name="nbfm", demod="fm", samprate=16_000,
            channels=(ChannelSpec(freq=300_000.0, low=-8000.0, high=8000.0),),
        )],
    )
    outs = run_blocks(eng, src, 30)
    audio = np.concatenate([o["nbfm"]["audio"][0] for o in outs[10:]])
    # squelch must be open with this SNR
    assert outs[-1]["nbfm"]["info"]["squelch_state"][0] > 0
    # dominant audio tone at 1 kHz
    spec = np.abs(np.fft.rfft(audio * np.hanning(audio.size)))
    f = np.fft.rfftfreq(audio.size, 1.0 / 16_000)
    peak = f[np.argmax(spec)]
    assert abs(peak - 1000.0) < 20.0, peak
    # deviation estimate near 3 kHz (fm.c:245-270)
    pdev = outs[-1]["nbfm"]["info"]["pdeviation"][0]
    assert 2500.0 < pdev < 3600.0, pdev


def test_linear_usb_end_to_end():
    """USB channel: carrier 1 kHz above the tuned freq -> 1 kHz audio tone."""
    src = SigGenConfig(
        samprate=FS, real=False, carrier_hz=201_000.0, amplitude=0.01,
        noise_n0=10 ** (-130.0 / 10.0),
    )
    eng = Engine(
        samprate=FS, real=False,
        groups=[GroupSpec(
            name="usb", demod="linear", samprate=16_000,
            channels=(ChannelSpec(freq=200_000.0, low=50.0, high=3000.0),),
        )],
    )
    outs = run_blocks(eng, src, 40)
    audio = np.concatenate([o["usb"]["audio"][0] for o in outs[20:]])
    spec = np.abs(np.fft.rfft(audio * np.hanning(audio.size)))
    f = np.fft.rfftfreq(audio.size, 1.0 / 16_000)
    peak = f[np.argmax(spec)]
    assert abs(peak - 1000.0) < 10.0, peak
    # AGC drives output toward headroom (-15 dBFS target amplitude)
    rms = float(np.sqrt(np.mean(audio[-3200:] ** 2)))
    assert 0.02 < rms < 0.4, rms


def test_real_master_and_multichannel_groups():
    """Real A/D stream, two groups (FM + AM) sharing one master FFT."""
    src = SigGenConfig(
        samprate=FS, real=True, carrier_hz=250_000.0, amplitude=0.05,
        noise_n0=10 ** (-120.0 / 10.0), am_depth=0.5, tone_hz=800.0,
    )
    eng = Engine(
        samprate=FS, real=True,
        groups=[
            GroupSpec(
                name="am", demod="am", samprate=16_000, snr_squelch=False,
                dc_cut_hz=50.0,
                channels=(
                    ChannelSpec(freq=250_000.0, low=-5000.0, high=5000.0),
                    ChannelSpec(freq=260_000.0, low=-5000.0, high=5000.0),
                ),
            ),
            GroupSpec(
                name="fm", demod="fm", samprate=16_000,
                channels=(ChannelSpec(freq=240_000.0, low=-8000.0, high=8000.0),),
            ),
        ],
    )
    outs = run_blocks(eng, src, 30)
    audio = np.concatenate([o["am"]["audio"][0] for o in outs[15:]])
    spec = np.abs(np.fft.rfft(audio * np.hanning(audio.size)))
    f = np.fft.rfftfreq(audio.size, 1.0 / 16_000)
    spec[f < 200.0] = 0.0  # residual carrier DC is legitimate AM output
    peak = f[np.argmax(spec)]
    assert abs(peak - 800.0) < 10.0, peak
    # channel 2 has no signal: baseband power far below channel 1
    p1 = outs[-1]["am"]["info"]["baseband_power"][0]
    p2 = outs[-1]["am"]["info"]["baseband_power"][1]
    assert p1 > 100 * p2
    # FM channel sees no carrier -> squelch closed, muted audio
    assert outs[-1]["fm"]["info"]["squelch_state"][0] == 0
    assert np.all(outs[-1]["fm"]["audio"] == 0.0)


def test_noise_density_calibration():
    """Reported N0 matches the generator's calibrated noise density."""
    n0_db = -110.0
    src = SigGenConfig(samprate=FS, real=False, carrier_hz=0.0, amplitude=0.0,
                       noise_n0=10 ** (n0_db / 10.0))
    eng = Engine(
        samprate=FS, real=False,
        groups=[GroupSpec(
            name="iq", demod="iq", samprate=16_000, agc=False,
            channels=(ChannelSpec(freq=100_000.0, low=-6000.0, high=6000.0),),
        )],
    )
    outs = run_blocks(eng, src, 25)
    n0 = float(outs[-1]["iq"]["info"]["n0"][0])
    n0_rep_db = 10 * np.log10(n0)
    assert abs(n0_rep_db - n0_db) < 1.0, n0_rep_db


def test_capacity_2000_channels():
    """The reference caps at 2000 channels/instance (radio.h:344); our
    channel table is a tensor axis — prove 2000 compile and step."""
    fs = 2_048_000
    freqs = np.linspace(-0.45 * fs, 0.45 * fs, 2000)
    eng = Engine(samprate=fs, real=False, groups=[GroupSpec(
        name="scan", demod="fm", samprate=8000,
        channels=tuple(ChannelSpec(freq=float(f), low=-3000.0, high=3000.0) for f in freqs))])
    assert eng.groups["scan"].C == 2000
    state, params = eng.init_state(), eng.init_params()
    step = jax.jit(eng.step)
    block = jnp.zeros((eng.L,), jnp.complex64)
    for _ in range(2):
        state, out = step(state, params, block)
    assert out["scan"]["audio"].shape == (2000, 160)


def test_snr_reporting_accuracy():
    """Reported SNR tracks the constructed scene within a fraction of a dB
    (the SURVEY §4 verification bound)."""
    amp = 0.01
    n0_db = -120.0
    bw = 12_000.0
    src = SigGenConfig(samprate=FS, real=False, carrier_hz=150_000.0,
                       amplitude=amp, noise_n0=10 ** (n0_db / 10.0))
    eng = Engine(samprate=FS, real=False, groups=[GroupSpec(
        name="iq", demod="iq", samprate=16_000, agc=False, snr_squelch=True,
        channels=(ChannelSpec(freq=150_000.0, low=-bw / 2, high=bw / 2, gain_db=0.0),))])
    outs = run_blocks(eng, src, 30)
    info = outs[-1]["iq"]["info"]
    # analytic: signal power amp^2 over noise N0*bw
    want_snr_db = 10 * np.log10(amp**2 / (10 ** (n0_db / 10.0) * bw))
    got_bb = 10 * np.log10(info["baseband_power"][0])
    got_n0 = 10 * np.log10(info["n0"][0])
    got_snr_db = got_bb - (got_n0 + 10 * np.log10(bw))
    assert abs(got_snr_db - want_snr_db) < 0.75, (got_snr_db, want_snr_db)
    # carrier power itself accurate to ~0.1 dB
    assert abs(got_bb - 20 * np.log10(amp)) < 0.1, got_bb


def test_spur_notch():
    """Adaptive master-bin notches remove coherent spurs (radio.c:662-683)."""
    spur_hz = 128_000.0
    src = SigGenConfig(samprate=FS, real=False, carrier_hz=spur_hz, amplitude=0.2,
                       noise_n0=10 ** (-130.0 / 10.0))
    mk = lambda spurs: Engine(samprate=FS, real=False, spurs=spurs, groups=[GroupSpec(
        name="iq", demod="iq", samprate=16_000, agc=False,
        channels=(ChannelSpec(freq=spur_hz, low=-6000.0, high=6000.0, gain_db=0.0),))])
    base = run_blocks(mk(None), src, 40)
    notched = run_blocks(mk([spur_hz]), src, 200)
    p0 = float(base[-1]["iq"]["info"]["baseband_power"][0])
    p1 = float(notched[-1]["iq"]["info"]["baseband_power"][0])
    # alpha=0.01/block tracker: amplitude residual 0.99^200 -> -35 dB power
    assert p1 < p0 * 0.05, (p0, p1)


def test_egress_compaction_matches_full():
    """Squelch-gated egress (audio.c:42-110 analog): the compacted
    [K, olen] audio + egress_idx/count equal the full engine's rows for
    the open channels; muted channels never cross the d2h boundary."""
    FS = 1_024_000
    C = 64
    freqs = np.linspace(0.05 * FS, 0.4 * FS, C)
    mk = lambda K: [GroupSpec(
        name="hf", demod="linear", samprate=8_000, snr_squelch=True,
        squelch_open_db=6.0, squelch_close_db=5.0, egress_slots=K,
        channels=tuple(ChannelSpec(freq=float(f), low=50.0, high=2_700.0)
                       for f in freqs))]
    e_full = Engine(samprate=FS, real=True, groups=mk(0))
    e_cmp = Engine(samprate=FS, real=True, groups=mk(16))

    rng = np.random.default_rng(11)
    NB = 6
    t = np.arange(NB * e_full.L) / FS
    x = 0.001 * rng.standard_normal(NB * e_full.L)
    hot = [3, 17, 40]  # only these channels hear a carrier -> squelch opens
    for h in hot:
        x = x + 0.2 * np.cos(2 * np.pi * (freqs[h] + 700.0) * t)
    blocks = x.astype(np.float32).reshape(NB, e_full.L)

    sf, pf = jax.jit(e_full.init_state)(), e_full.init_params()
    sc, pc = jax.jit(e_cmp.init_state)(), e_cmp.init_params()
    stepf, stepc = jax.jit(e_full.step), jax.jit(e_cmp.step)
    for i in range(NB):
        sf, of = stepf(sf, pf, jnp.asarray(blocks[i]))
        sc, oc = stepc(sc, pc, jnp.asarray(blocks[i]))
    send = np.asarray(of["hf"]["info"]["send"])
    assert set(np.nonzero(send)[0]) == set(hot)
    idx = np.asarray(oc["hf"]["info"]["egress_idx"])
    count = int(np.asarray(oc["hf"]["info"]["egress_count"]))
    assert count == len(hot)
    assert list(idx[:count]) == hot
    assert np.all(idx[count:] == -1)
    a_full = np.asarray(of["hf"]["audio"])
    a_cmp = np.asarray(oc["hf"]["audio"])
    assert a_cmp.shape[0] == 16
    np.testing.assert_allclose(a_cmp[:count], a_full[hot], rtol=0, atol=1e-6)
    # overflow: a 2-slot group drops the extras but counts them
    e_of = Engine(samprate=FS, real=True, groups=mk(2))
    so, po = jax.jit(e_of.init_state)(), e_of.init_params()
    stepo = jax.jit(e_of.step)
    for i in range(NB):
        so, oo = stepo(so, po, jnp.asarray(blocks[i]))
    assert int(np.asarray(oo["hf"]["info"]["egress_count"])) == 3
    idx2 = np.asarray(oo["hf"]["info"]["egress_idx"])
    assert list(idx2) == hot[:2]
