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


def test_spectrum_wideband_algorithm():
    """Coarse rbw (>= crossover) runs the raw-A/D wideband path."""
    amp = 0.5
    src = SigGenConfig(samprate=FS, real=False, carrier_hz=250_000.0,
                       amplitude=amp, noise_n0=10 ** (-120.0 / 10.0))
    eng = Engine(
        samprate=FS, real=False,
        groups=[GroupSpec(
            name="sweep", demod="spectrum", samprate=32_000,
            bin_bw=2000.0, bin_count=64,  # 2 kHz rbw -> wideband
            channels=(ChannelSpec(freq=240_000.0),),
        )],
    )
    g = eng.groups["sweep"]
    assert g.spectrum_wide
    assert abs(g.wide_geo.rbw - 2000.0) < 500.0

    state, params = eng.init_state(), eng.init_params()
    s = siggen_init(src, 0)
    step = jax.jit(eng.step)
    for _ in range(12):
        s, block = siggen_block(src, s, eng.L)
        state, out = step(state, params, block)
    pwr = np.asarray(jax.device_get(out["sweep"]["info"]["bin_data"][0]))
    freqs = (np.arange(64) - 32) * g.wide_geo.rbw + 240_000.0
    peak = int(np.argmax(pwr))
    assert abs(freqs[peak] - 250_000.0) <= g.wide_geo.rbw, freqs[peak]
    assert abs(10 * np.log10(pwr[peak]) - 20 * np.log10(amp)) < 2.0
    far = np.abs(freqs - 250_000.0) > 4 * g.wide_geo.rbw
    assert 10 * np.log10(pwr[far].max()) < 10 * np.log10(pwr[peak]) - 40


def test_spectrum_byte_format():
    from ka9q_radio_tpu.config import load_config
    from ka9q_radio_tpu.runtime.radiod import Radiod
    from ka9q_radio_tpu.net.status import StatusType as T, decode_status

    cfg = load_config(f"""
[global]
hardware = sig_gen
update = 2
spectrum-format = byte
[sig_gen]
device = sig_gen
carrier = 250k0
amplitude = -6
noise = -120
samprate = 1m024
real = no
[sweep]
mode = spectrum
samprate = 32k
resolution-bw = 2k
bin-count = 64
freq = 240k0
""")
    rd = Radiod(cfg, use_network=False)
    # spectrum groups are poll-gated like the reference (spectrum.c:54-77:
    # bins only on response_needed) — a bare poll arms the sweep
    from ka9q_radio_tpu.net.status import encode_status
    rd.handle_packet(encode_status({T.OUTPUT_SSRC: 240}, cmd=True))
    for _ in range(8):
        rd.step_block()
    stats = [p for k, p in rd._sent if k == "status"]
    _, f, _ = decode_status(stats[-1])
    assert T.BIN_BYTE_DATA in f and T.BIN_DATA not in f
    raw = f[T.BIN_BYTE_DATA]
    assert len(raw) == 64
    base, step_db = f[T.SPECTRUM_BASE], f[T.SPECTRUM_STEP]
    db = base + np.frombuffer(raw, np.uint8).astype(np.float64) * step_db
    peak = int(np.argmax(db))
    assert abs(db[peak] - (-6.0)) < 2.5


def test_wide_accumulate_mxu_matches_fft():
    """The MXU-cascade analysis FFT == the XLA FFT path (wideband spectra
    at RX888 scale run frames_per_block*fft_n ~ master-sized work, where
    the matmul cascade lowering wins — numerics must not change)."""
    import dataclasses
    import jax.numpy as jnp
    from ka9q_radio_tpu.models.spectrum import wide_geometry, wide_init, wide_accumulate
    from ka9q_radio_tpu.ops.filterbank import plan_split_mxu

    rng = np.random.default_rng(31)
    for real in (True, False):
        geo = wide_geometry(samprate=FS, L=20_480, real=real, bin_bw=800.0)
        assert geo.mxu is None  # below the size threshold: XLA FFT path
        forced = dataclasses.replace(geo, mxu=plan_split_mxu(geo.fft_n, real))
        assert forced.mxu is not None
        if real:
            block = rng.standard_normal(geo.L).astype(np.float32)
        else:
            block = (rng.standard_normal(geo.L)
                     + 1j * rng.standard_normal(geo.L)).astype(np.complex64)
        st_a, pwr_a = jax.jit(lambda s, b: wide_accumulate(s, b, geo))(wide_init(geo), jnp.asarray(block))
        st_b, pwr_b = jax.jit(lambda s, b: wide_accumulate(s, b, forced))(wide_init(forced), jnp.asarray(block))
        pa, pb = np.asarray(pwr_a), np.asarray(pwr_b)
        assert pa.shape == pb.shape
        assert np.max(np.abs(pa - pb)) <= 1e-5 * max(np.max(pa), 1e-30)


def test_wide_geometry_plans_mxu_at_scale():
    """RX888-scale wideband geometry auto-plans the matmul cascade."""
    from ka9q_radio_tpu.models.spectrum import wide_geometry

    geo = wide_geometry(samprate=129_600_000, L=2_592_000, real=True, bin_bw=1000.0)
    assert geo.mxu is not None
    assert int(np.prod(geo.mxu)) == geo.fft_n


def _lazy_engine(bin_bw, bin_count):
    return Engine(
        samprate=FS, real=False,
        groups=[GroupSpec(
            name="sp", demod="spectrum", samprate=32_000,
            bin_bw=bin_bw, bin_count=bin_count,
            channels=(ChannelSpec(freq=200_000.0, low=-16_000.0, high=16_000.0),),
        )],
    )


def _lazy_blocks(eng, n):
    src = SigGenConfig(samprate=FS, real=False, carrier_hz=201_000.0,
                       amplitude=0.5, noise_n0=1e-30)
    st = siggen_init(src, 0)
    out = []
    for _ in range(n):
        st, blk = siggen_block(src, st, eng.L)
        out.append(blk)
    return out


import pytest


@pytest.mark.parametrize("bin_bw", [100.0, 2000.0])  # narrow / wideband algo
def test_spectrum_lazy_gating_engine(bin_bw):
    """armed=0 freezes a spectrum group (zero bins, demod state bit-frozen
    behind a run-time lax.cond — no recompile to flip); re-arming converges
    to the always-on bins (spectrum.c:54-77 response_needed gating)."""
    import jax.numpy as jnp

    a = _lazy_engine(bin_bw, 64)
    b = _lazy_engine(bin_bw, 64)
    blocks = _lazy_blocks(a, 40)
    sa, pa = jax.jit(a.init_state)(), a.init_params()
    sb, pb = jax.jit(b.init_state)(), b.init_params()
    assert float(pb["sp"]["armed"]) == 1.0  # engines default armed
    pb = {"sp": dict(pb["sp"])}
    pb["sp"]["armed"] = jnp.float32(0.0)
    step_a, step_b = jax.jit(a.step), jax.jit(b.step)

    for i in range(8):
        sa, out_a = step_a(sa, pa, blocks[i])
        sb, out_b = step_b(sb, pb, blocks[i])
    # disarmed: zero bins, frozen demod state; armed side is live
    assert float(np.max(np.abs(out_b["sp"]["info"]["bin_data"]))) == 0.0
    fresh = jax.jit(b.init_state)()
    for k, v in sb["groups"]["sp"]["demod"].items():
        np.testing.assert_array_equal(np.asarray(v), np.asarray(fresh["groups"]["sp"]["demod"][k]))
    assert float(np.max(out_a["sp"]["info"]["bin_data"])) > 0.0

    # re-arm WITHOUT recompiling (params value flip on the same jit)
    pb["sp"]["armed"] = jnp.float32(1.0)
    for i in range(8, 40):
        sa, out_a = step_a(sa, pa, blocks[i])
        sb, out_b = step_b(sb, pb, blocks[i])
    pa_bins = np.asarray(out_a["sp"]["info"]["bin_data"][0], np.float64)
    pb_bins = np.asarray(out_b["sp"]["info"]["bin_data"][0], np.float64)
    pk = int(np.argmax(pa_bins))
    assert int(np.argmax(pb_bins)) == pk
    # stationary noiseless scene: both averages land on the same value
    assert abs(10 * np.log10(pa_bins[pk]) - 10 * np.log10(pb_bins[pk])) < 0.1


def test_rice_codec_roundtrip():
    """net/rice.py: the reference's #if RICE experiment finished into a
    real codec (spectrum.c:718-795 never emits — its own guard disables
    it). Roundtrip-exact in both modes, and smooth spectra beat the
    1 byte/bin byte format."""
    from ka9q_radio_tpu.net.rice import rice_encode, rice_decode

    rng = np.random.default_rng(5)
    # smooth noise-floor-ish sweep (delta mode should win) + spiky data
    smooth = np.clip(40 + np.cumsum(rng.integers(-2, 3, 512)), 0, None)
    spiky = rng.integers(0, 200, 64)
    flat = np.full(128, 37)
    for levels in (smooth, spiky, flat, np.zeros(16, np.int64)):
        enc = rice_encode(levels)
        dec = rice_decode(enc, len(levels))
        np.testing.assert_array_equal(dec, levels)
    # compression: the smooth sweep codes well under a byte per bin
    assert len(rice_encode(smooth)) < smooth.size
    assert len(rice_encode(flat)) < flat.size // 2


def test_spectrum_rice_format():
    """spectrum-format = rice: beacons carry BIN_RICE_DATA (private TLV
    key 125, skipped by stock readers) that decodes to the byte-format
    dB reading."""
    from ka9q_radio_tpu.config import load_config
    from ka9q_radio_tpu.runtime.radiod import Radiod
    from ka9q_radio_tpu.net.status import StatusType as T, decode_status, encode_status
    from ka9q_radio_tpu.net.rice import rice_decode, dequantize_bins

    cfg = load_config("""
[global]
hardware = sig_gen
update = 2
spectrum-format = rice
[sig_gen]
device = sig_gen
carrier = 250k0
amplitude = -6
noise = -120
samprate = 1m024
real = no
[sweep]
mode = spectrum
samprate = 32k
resolution-bw = 2k
bin-count = 64
freq = 240k0
""")
    rd = Radiod(cfg, use_network=False)
    rd.handle_packet(encode_status({T.OUTPUT_SSRC: 240}, cmd=True))
    for _ in range(8):
        rd.step_block()
    stats = [p for k, p in rd._sent if k == "status"]
    _, f, _ = decode_status(stats[-1])
    assert T.BIN_RICE_DATA in f and T.BIN_DATA not in f and T.BIN_BYTE_DATA not in f
    lv = rice_decode(bytes(f[T.BIN_RICE_DATA]), 64)
    db = dequantize_bins(lv, f[T.SPECTRUM_BASE], f[T.SPECTRUM_STEP])
    peak = int(np.argmax(db))
    assert abs(db[peak] - (-6.0)) < 2.5
    # the Rice payload beats the byte format on this sweep
    assert len(bytes(f[T.BIN_RICE_DATA])) < 64


def test_fold_frames_closed_form_matches_scan():
    """_fold_frames' steady-state weighted reduction == nf sequential EMA
    steps exactly (the round-5 armed-sweep optimization), and warm-up
    boxcar blocks cross into steady state with the same values."""
    import jax
    import jax.numpy as jnp
    from ka9q_radio_tpu.models.spectrum import _fold_frames

    rng = np.random.default_rng(9)
    nf, bins, avg = 7, 33, 10

    def reference(power, n0, p):
        pw, n = power.copy(), n0
        for k in range(p.shape[0]):
            a = 1.0 / (n + 1.0) if n < avg else 1.0 / avg
            pw = pw + np.float32(a) * (p[k] - pw)
            n += 1
        return pw, n

    power = rng.uniform(0.1, 2.0, bins).astype(np.float32)
    for n0 in (0, 4, 8, 10, 25, 1000):  # warm-up, straddling, steady
        p = rng.uniform(0.0, 3.0, (nf, bins)).astype(np.float32)
        want, wn = reference(power, n0, p)
        got, gn = jax.jit(lambda pw, n, pp: _fold_frames(pw, n, pp, avg))(
            jnp.asarray(power), jnp.int32(n0), jnp.asarray(p))
        assert int(gn) == wn
        np.testing.assert_allclose(np.asarray(got), want, rtol=3e-6,
                                   err_msg=f"n0={n0}")
