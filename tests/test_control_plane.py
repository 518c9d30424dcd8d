"""Full decode_radio_commands parity (radio_status.c:133-702).

Walks every settable key the reference control plane accepts:
  * runtime keys must take effect with the SAME engine object (params
    surgery, zero recompiles — the CLAUDE.md invariant);
  * restart-class keys (PRESET / DEMOD_TYPE / OUTPUT_SAMPRATE / ISB /
    PLL_ENABLE / ENVELOPE / FILTER2 / spectrum geometry / Opus encoding
    switches) relocate the channel to the right compiled class;
  * spare-slot preallocation makes repeat dynamic creates recompile-free.
"""
import numpy as np
import pytest

from ka9q_radio_tpu.config import load_config
from ka9q_radio_tpu.runtime.radiod import Radiod, DEMOD_TYPE_CODES
from ka9q_radio_tpu.net.status import StatusType as T, encode_status, decode_status
from ka9q_radio_tpu.net.rtp import Encoding

CONF = """
[global]
hardware = sig_gen
mode = usb
update = 5
dyn-slots = 3

[sig_gen]
device = sig_gen
carrier = 201k0
amplitude = -20
noise = -130
samprate = 1m024
real = no

[hf]
mode = usb
samprate = 16k
freq = 200k0

[vhf]
mode = pm
freq = 300k0

[cw]
mode = cwu
freq = 150k0

[spect]
mode = spectrum
freq = 0
resolution-bw = 100
bin-count = 32
idle-timeout = 0.2
"""


@pytest.fixture()
def rd():
    r = Radiod(load_config(CONF), use_network=False)
    r.step_block()
    return r


def cmd(rd, ssrc, **kv):
    fields = {T.OUTPUT_SSRC: ssrc}
    fields.update({T[k]: v for k, v in kv.items()})
    rd.handle_packet(encode_status(fields, cmd=True))
    return rd.chans.get(ssrc)


def last_status(rd, ssrc):
    for kind, pkt in reversed(rd._sent):
        if kind != "status":
            continue
        _, fields, _ = decode_status(pkt)
        if fields.get(T.OUTPUT_SSRC) == ssrc:
            return fields
    raise AssertionError("no status for ssrc")


def host_val(rd, ch, key):
    return np.asarray(rd.engine.groups[ch.group].host["demod"][key][ch.idx])


# ---------------------------------------------------------------- runtime keys
def test_runtime_keys_no_rebuild(rd):
    eng = rd.engine
    ch = cmd(rd, 200, SQUELCH_OPEN=9.5, SQUELCH_CLOSE=8.5, HEADROOM=-12.0,
             AGC_HANGTIME=0.5, AGC_RECOVERY_RATE=30.0, AGC_THRESHOLD=-12.0,
             SNR_SQUELCH=True, SHIFT_FREQUENCY=100.0, STATUS_INTERVAL=7)
    assert rd.engine is eng
    np.testing.assert_allclose(host_val(rd, ch, "squelch_open"), 10 ** 0.95, rtol=1e-5)
    np.testing.assert_allclose(host_val(rd, ch, "squelch_close"), 10 ** 0.85, rtol=1e-5)
    np.testing.assert_allclose(host_val(rd, ch, "headroom"), 10 ** (-12 / 20), rtol=1e-5)
    assert int(host_val(rd, ch, "hangtime_samples")) == 8000
    np.testing.assert_allclose(host_val(rd, ch, "recovery_per_sample"),
                               10 ** (30 / 20 / 16000), rtol=1e-6)
    assert bool(host_val(rd, ch, "snr_squelch_enable"))
    assert int(host_val(rd, ch, "shift_inc_q32")) != 0
    assert ch.update_every == 7

    # GAIN implies AGC off (radio_status.c:404)
    cmd(rd, 200, GAIN=20.0)
    assert rd.engine is eng
    np.testing.assert_allclose(host_val(rd, ch, "manual_gain"), 10.0, rtol=1e-5)
    assert not bool(host_val(rd, ch, "agc_enable"))
    cmd(rd, 200, AGC_ENABLE=True)
    assert bool(host_val(rd, ch, "agc_enable"))

    # KAISER_BETA redesigns the filter without a rebuild
    resp_before = np.copy(rd.engine.groups[ch.group].host["responses"][ch.idx])
    cmd(rd, 200, KAISER_BETA=5.0)
    assert rd.engine is eng
    assert not np.allclose(resp_before, rd.engine.groups[ch.group].host["responses"][ch.idx])
    assert last_status(rd, 200)[T.KAISER_BETA] == pytest.approx(5.0)


def test_fm_runtime_keys(rd):
    eng = rd.engine
    ch = cmd(rd, 300, PL_TONE=100.0, THRESH_EXTEND=True)
    assert rd.engine is eng
    np.testing.assert_allclose(host_val(rd, ch, "tone_freq"), 100.0)
    assert bool(host_val(rd, ch, "threshold_ext"))


def test_filter2_beta_runtime(rd):
    eng = rd.engine
    ch = rd.chans[150]
    r2_before = np.copy(rd.engine.groups[ch.group].host["responses2"][ch.idx])
    cmd(rd, 150, FILTER2_KAISER_BETA=3.0)
    assert rd.engine is eng
    assert not np.allclose(r2_before, rd.engine.groups[ch.group].host["responses2"][ch.idx])
    assert last_status(rd, 150)[T.FILTER2_KAISER_BETA] == pytest.approx(3.0)


# ------------------------------------------------------------ restart classes
def test_preset_switch_existing_channel(rd):
    """Live mode switch on an existing channel (radio_status.c:167-209)."""
    ch = cmd(rd, 200, PRESET="pm")
    assert rd.engine.groups[ch.group].spec.demod == "fm"
    assert ch.samprate == 24_000
    assert ch.preset == "pm"
    st = last_status(rd, 200)
    assert st[T.DEMOD_TYPE] == DEMOD_TYPE_CODES["fm"]
    assert st[T.PRESET] == "pm"
    # and back, with runtime audio still flowing
    ch = cmd(rd, 200, PRESET="usb")
    assert rd.engine.groups[ch.group].spec.demod == "linear"
    rd.step_block()
    assert np.isfinite(np.asarray(rd.chans[200].last_info["baseband_power"])).all()


def test_demod_type_switch(rd):
    ch = cmd(rd, 300, DEMOD_TYPE=DEMOD_TYPE_CODES["linear"])
    assert rd.engine.groups[ch.group].spec.demod == "linear"
    ch = cmd(rd, 300, DEMOD_TYPE=DEMOD_TYPE_CODES["fm"])
    assert rd.engine.groups[ch.group].spec.demod == "fm"


def test_output_samprate(rd):
    ch = cmd(rd, 200, OUTPUT_SAMPRATE=24_000)
    assert ch.samprate == 24_000
    assert rd.engine.groups[ch.group].spec.samprate == 24_000
    assert last_status(rd, 200)[T.OUTPUT_SAMPRATE] == 24_000
    # non-commensurate rates round to a legal one (modes.c:525-542)
    assert rd.round_samprate(11_997) % rd.round_samprate(1) == 0


def test_isb_forces_stereo_and_filter2(rd):
    ch = cmd(rd, 200, INDEPENDENT_SIDEBAND=True)
    spec = rd.engine.groups[ch.group].spec
    assert spec.isb and spec.stereo and spec.filter2 >= 1
    assert ch.channels == 2
    assert bool(last_status(rd, 200)[T.INDEPENDENT_SIDEBAND])


def test_pll_and_envelope_toggles(rd):
    ch = cmd(rd, 200, PLL_ENABLE=True, PLL_BW=25.0, PLL_SQUARE=True)
    spec = rd.engine.groups[ch.group].spec
    assert spec.enable_pll
    np.testing.assert_allclose(host_val(rd, ch, "pll_loop_bw"), 25.0)
    assert bool(host_val(rd, ch, "pll_square"))
    ch = cmd(rd, 200, ENVELOPE=True)
    assert rd.engine.groups[ch.group].spec.envelope


def test_output_channels_linear_and_wfm(rd):
    ch = cmd(rd, 200, OUTPUT_CHANNELS=2)
    assert rd.engine.groups[ch.group].spec.stereo
    assert ch.channels == 2
    ch = cmd(rd, 200, OUTPUT_CHANNELS=1)
    assert not rd.engine.groups[ch.group].spec.stereo


def test_filter2_blocking(rd):
    ch = cmd(rd, 200, FILTER2=2)
    assert rd.engine.groups[ch.group].spec.filter2 == 2


def test_spectrum_keys(rd):
    ch = rd.chans[0]
    g0 = rd.engine.groups[ch.group]
    eng = rd.engine
    # base/step are host-side: no rebuild
    cmd(rd, 0, SPECTRUM_BASE=-100.0, SPECTRUM_STEP=1.0)
    assert rd.engine is eng
    assert ch.spectrum_base == -100.0 and ch.spectrum_step == 1.0
    # geometry keys rebuild the spectrum class
    ch = cmd(rd, 0, RESOLUTION_BW=50.0, BIN_COUNT=64, SPECTRUM_AVG=4,
             WINDOW_TYPE=5, SPECTRUM_OVERLAP=0.5)
    spec = rd.engine.groups[ch.group].spec
    assert spec.bin_bw == 50.0 and spec.bin_count == 64
    assert spec.fft_avg == 4 and spec.spectrum_window == "hann"
    assert spec.spectrum_overlap == 0.5
    rd.step_block()
    st = last_status(rd, 0)
    assert st[T.BIN_COUNT] == 64
    # PRESET is refused on spectrum channels (radio_status.c:688)
    ch = cmd(rd, 0, PRESET="usb")
    assert rd.engine.groups[ch.group].spec.demod == "spectrum"


def test_output_encoding_and_opus(rd):
    from ka9q_radio_tpu.net import opus as opuslib
    ch = cmd(rd, 200, OUTPUT_ENCODING=int(Encoding.F32LE))
    assert ch.encoding == Encoding.F32LE
    assert last_status(rd, 200)[T.OUTPUT_ENCODING] == int(Encoding.F32LE)
    if opuslib.available():
        ch = cmd(rd, 200, OUTPUT_ENCODING=int(Encoding.OPUS))
        assert ch.encoding == Encoding.OPUS
        assert ch.samprate in (8000, 12_000, 16_000, 24_000, 48_000)
        cmd(rd, 200, OPUS_BIT_RATE=32_000, OPUS_DTX=True, OPUS_APPLICATION=2048)
        assert ch.opus_bitrate == 32_000 and ch.opus_dtx and ch.opus_app == 2048
        rd.step_block()
        st = last_status(rd, 200)
        assert st[T.OPUS_BIT_RATE] == 32_000


def test_maxdelay_aggregation(rd):
    eng = rd.engine
    ch = cmd(rd, 200, MAXDELAY=3)
    assert rd.engine is eng and ch.maxdelay == 3
    n0 = len([1 for k, _ in rd._sent if k == "data"])
    for _ in range(3):
        rd.step_block()
    n1 = len([1 for k, _ in rd._sent if k == "data"])
    assert n1 > n0  # aggregated flush still emits
    assert last_status(rd, 200)[T.MAXDELAY] == 3


def test_doppler_and_lifetime_and_opts(rd):
    eng = rd.engine
    ch = cmd(rd, 200, DOPPLER_FREQUENCY=50.0, DOPPLER_FREQUENCY_RATE=10.0,
             LIFETIME=100, SETOPTS=0b1010)
    assert rd.engine is eng
    assert rd.doppler[200] == [50.0, 10.0]
    assert ch.lifetime == 100 and ch.options == 0b1010
    cmd(rd, 200, CLEAROPTS=0b0010)
    assert ch.options == 0b1000


# ----------------------------------------------------- dynamic channel latency
def test_spare_slots_zero_recompile(rd):
    """First dynamic create rebuilds once with dyn-slots spares; the next
    dyn-slots creates (and removals/recreates) reuse tombstones with the
    SAME engine — the reference's ms-latency create (radio_status.c:92-105)."""
    import time
    cmd(rd, 7001, PRESET="am", RADIO_FREQUENCY=100_000.0)
    eng = rd.engine
    t0 = time.monotonic()
    for k in range(3):  # dyn-slots = 3 spares
        ch = cmd(rd, 7002 + k, PRESET="am", RADIO_FREQUENCY=101_000.0 + k)
        assert ch is not None and rd.engine is eng, k
    dt = time.monotonic() - t0
    assert dt < 2.0  # params surgery, not a compile
    rd.remove_channel(7002)
    ch = cmd(rd, 7010, PRESET="am", RADIO_FREQUENCY=110_000.0)
    assert rd.engine is eng
    rd.step_block()
    assert np.isfinite(np.asarray(rd.chans[7010].last_info["baseband_power"])).all()


def test_dynamic_create_reuses_static_group(rd):
    """A dynamic create whose preset matches a static section's compiled
    class lands in THAT group — the reference keeps one flat channel table
    (radio.c:1465), so no parallel dyn group should appear."""
    ch = cmd(rd, 7100, PRESET="cwu", RADIO_FREQUENCY=150_500.0)
    assert ch is not None and ch.group == "cw"
    assert "dyn-cwu" not in rd.engine.groups
    eng = rd.engine  # first create grew "cw" with spares; next ones are free
    for k in range(3):
        c2 = cmd(rd, 7101 + k, PRESET="cwu", RADIO_FREQUENCY=151_000.0 + k)
        assert c2 is not None and c2.group == "cw" and rd.engine is eng, k
    rd.step_block()
    assert np.isfinite(np.asarray(rd.chans[7100].last_info["baseband_power"])).all()
    # the static channel rode through the grow (state migration)
    static_cw = next(c for c in rd.chans.values() if c.group == "cw" and not c.dynamic)
    assert np.isfinite(np.asarray(static_cw.last_info["baseband_power"])).all()


def test_move_carries_runtime_params(rd):
    cmd(rd, 200, GAIN=14.0)
    ch = cmd(rd, 200, OUTPUT_SAMPRATE=24_000)
    np.testing.assert_allclose(host_val(rd, ch, "manual_gain"), 10 ** (14 / 20), rtol=1e-5)
    assert not bool(host_val(rd, ch, "agc_enable"))


def test_out_of_coverage_parks_channel(rd):
    """A tune outside front-end coverage parks the channel muted with the
    requested frequency remembered (radio.c:1472-1498); tuning back in
    coverage unparks it with its settings restored."""
    eng = rd.engine
    ch = cmd(rd, 200, RADIO_FREQUENCY=900_000_000.0)  # way outside 1.024M complex span
    assert rd.engine is eng  # no rebuild either way
    assert ch.parked and ch.freq == 900_000_000.0
    assert last_status(rd, 200)[T.RADIO_FREQUENCY] == 900_000_000.0
    # the slot is muted: squelch sentinel applied
    assert host_val(rd, ch, "squelch_open") > 1e20
    rd.step_block()
    ch = cmd(rd, 200, RADIO_FREQUENCY=200_000.0)
    assert not ch.parked
    assert host_val(rd, ch, "squelch_open") < 1e6
    rd.step_block()
    assert np.isfinite(np.asarray(rd.chans[200].last_info["baseband_power"])).all()


def test_unpark_restores_user_params(rd):
    """Parking must not lose user-set runtime params (review finding)."""
    ch = cmd(rd, 200, GAIN=14.0, SQUELCH_OPEN=11.0)
    g14 = float(host_val(rd, ch, "manual_gain"))
    cmd(rd, 200, RADIO_FREQUENCY=900_000_000.0)  # park
    assert ch.parked
    ch = cmd(rd, 200, RADIO_FREQUENCY=200_000.0)  # unpark
    assert not ch.parked
    np.testing.assert_allclose(host_val(rd, ch, "manual_gain"), g14, rtol=1e-6)
    np.testing.assert_allclose(host_val(rd, ch, "squelch_open"), 10 ** 1.1, rtol=1e-5)


def test_combined_demod_switch_applies_linear_keys(rd):
    """DEMOD_TYPE=linear + PLL_ENABLE in ONE packet both apply (the guard
    must look at the post-switch type; review finding)."""
    ch = cmd(rd, 300, DEMOD_TYPE=DEMOD_TYPE_CODES["linear"], PLL_ENABLE=True)
    spec = rd.engine.groups[ch.group].spec
    assert spec.demod == "linear" and spec.enable_pll


def test_samprate_zero_ignored(rd):
    ch = rd.chans[200]
    g0, r0 = ch.group, ch.samprate
    cmd(rd, 200, OUTPUT_SAMPRATE=0)
    assert rd.chans[200].group == g0 and rd.chans[200].samprate == r0


def test_maxdelay_zero_overrides_global():
    cfg = load_config(CONF.replace("update = 5", "update = 5\nblock = 3"))
    r = Radiod(cfg, use_network=False)
    r.step_block()
    fields = {T.OUTPUT_SSRC: 200, T.MAXDELAY: 0}
    r.handle_packet(encode_status(fields, cmd=True))
    assert r.chans[200].maxdelay == 0  # disables the global aggregation
    n0 = len([1 for k, _ in r._sent if k == "data"])
    for _ in range(2):
        r.step_block()
    n1 = len([1 for k, _ in r._sent if k == "data"])
    assert n1 > n0  # per-block emission resumed immediately


def test_parked_channel_stays_muted_through_commands_and_moves(rd):
    """Review findings: runtime commands while parked must not lift the
    mute (they land in the snapshot and apply on unpark), and a rate-class
    move of a parked channel keeps it muted with user values carried."""
    cmd(rd, 200, RADIO_FREQUENCY=900_000_000.0)  # park
    ch = rd.chans[200]
    assert ch.parked
    # user adjusts gain/squelch while parked: sentinel must survive
    cmd(rd, 200, GAIN=20.0, SQUELCH_OPEN=5.0)
    assert float(host_val(rd, ch, "squelch_open")) > 1e20  # still muted
    # move to another rate class while parked: still muted
    ch = cmd(rd, 200, OUTPUT_SAMPRATE=24_000)
    assert ch.parked
    assert float(host_val(rd, ch, "squelch_open")) > 1e20
    rd.step_block()
    # unpark: the values set while parked take effect
    ch = cmd(rd, 200, RADIO_FREQUENCY=200_000.0)
    assert not ch.parked
    np.testing.assert_allclose(host_val(rd, ch, "manual_gain"), 10.0, rtol=1e-5)
    np.testing.assert_allclose(host_val(rd, ch, "squelch_open"), 10 ** 0.5, rtol=1e-4)
    rd.step_block()
    assert np.isfinite(np.asarray(rd.chans[200].last_info["baseband_power"])).all()


def test_spectrum_lazy_poll_gating(rd):
    """The daemon mirrors spectrum.c:54-77: sweep groups idle DISARMED
    (no device compute, no BIN_DATA in status); any poll/command arms the
    group via params surgery (same engine, same compiled step), and the
    arming window decays idle-timeout seconds after the last poll."""
    ch = rd.chans[0]  # the [spect] channel (freq = 0)
    gname = ch.group
    g = rd.engine.groups[gname]
    assert g.spec.demod == "spectrum" and g.spec.spectrum_lazy
    assert float(g.host["armed"]) == 0.0  # starts disarmed
    eng_before, step_before = rd.engine, rd.step
    for _ in range(3):
        rd.step_block()
    from ka9q_radio_tpu.net.status import decode_status as _dec
    _, fields, _ = _dec(rd.encode_channel_status(ch))
    assert T.BIN_DATA not in fields  # nothing accumulated -> nothing claimed

    cmd(rd, 0)  # bare poll arms it
    assert float(rd.engine.groups[gname].host["armed"]) == 1.0
    assert rd.engine is eng_before and rd.step is step_before  # surgery only
    rd.step_block()
    rd.step_block()
    _, fields, _ = _dec(rd.encode_channel_status(ch))
    assert T.BIN_DATA in fields and max(fields[T.BIN_DATA]) > 0.0

    # idle-timeout = 0.2 s = 10 blocks: the window decays and it disarms
    for _ in range(12):
        rd.step_block()
    assert float(rd.engine.groups[gname].host["armed"]) == 0.0
    _, fields, _ = _dec(rd.encode_channel_status(ch))
    assert T.BIN_DATA not in fields
    assert rd.engine is eng_before and rd.step is step_before
