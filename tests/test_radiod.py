"""radiod daemon: config -> engine -> RTP/TLV, command handling, retune."""
import time

import numpy as np
import pytest

from ka9q_radio_tpu.config import load_config
from ka9q_radio_tpu.runtime.radiod import Radiod
from ka9q_radio_tpu.net.status import StatusType as T, PacketType, encode_status, decode_status
from ka9q_radio_tpu.net.rtp import RtpHeader, Encoding, decode_samples

CONF = """
[global]
hardware = sig_gen
status = test.local
data = test-pcm.local
mode = usb
update = 5

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
"""


@pytest.fixture(scope="module")
def radiod():
    rd = Radiod(load_config(CONF), use_network=False)
    for _ in range(12):
        rd.step_block()
    return rd


def test_rtp_stream(radiod):
    data = [p for kind, p in radiod._sent if kind == "data"]
    assert data, "no RTP packets emitted"
    h, payload = RtpHeader.unpack(data[-1])
    assert h.ssrc == 200
    info = radiod.registry.info_from_pt(h.type)
    assert info == (16_000, 1, Encoding.S16BE)
    # concatenate the tail of the stream and find the 1 kHz tone
    audio = np.concatenate([decode_samples(RtpHeader.unpack(p)[1], Encoding.S16BE) for p in data[-40:]])
    spec = np.abs(np.fft.rfft(audio * np.hanning(audio.size)))
    f = np.fft.rfftfreq(audio.size, 1 / 16_000)
    assert abs(f[np.argmax(spec)] - 1000.0) < 20.0


def test_status_beacons(radiod):
    stats = [p for kind, p in radiod._sent if kind == "status"]
    assert stats  # update = 5 -> beacons
    ptype, fields, _ = decode_status(stats[-1])
    assert ptype == PacketType.STATUS
    assert fields[T.OUTPUT_SSRC] == 200
    assert fields[T.RADIO_FREQUENCY] == 200_000.0
    assert fields[T.DEMOD_TYPE] == 0
    assert fields[T.OUTPUT_SAMPRATE] == 16_000
    assert fields[T.LOW_EDGE] == 50.0 and fields[T.HIGH_EDGE] == 3000.0
    # "noise" key is the reference's per-sample amplitude (sig_gen.c:149):
    # sigma = -130 dBFS -> N0 = 2*sigma^2/fs = -187.1 dB/Hz at 1.024 Msps
    assert abs(fields[T.NOISE_DENSITY] - (-187.1)) < 2.0
    assert fields[T.INPUT_SAMPRATE] == 1_024_000


def test_poll_and_command(radiod):
    radiod._sent.clear()
    # poll
    radiod.handle_packet(encode_status({T.OUTPUT_SSRC: 200, T.COMMAND_TAG: 42}, cmd=True))
    stats = [p for kind, p in radiod._sent if kind == "status"]
    assert len(stats) == 1
    _, fields, _ = decode_status(stats[0])
    assert fields[T.COMMAND_TAG] == 42
    assert fields[T.CMD_CNT] >= 1

    # retune command: move the channel to 150 kHz, then verify params moved
    old_shift = int(np.asarray(radiod.params["hf"]["shifts"][0]))
    radiod.handle_packet(encode_status(
        {T.OUTPUT_SSRC: 200, T.COMMAND_TAG: 43, T.RADIO_FREQUENCY: 150_000.0}, cmd=True))
    new_shift = int(np.asarray(radiod.params["hf"]["shifts"][0]))
    assert new_shift != old_shift
    assert radiod.chans[200].freq == 150_000.0

    # filter edge change
    radiod.handle_packet(encode_status(
        {T.OUTPUT_SSRC: 200, T.LOW_EDGE: -2000.0, T.HIGH_EDGE: 2000.0}, cmd=True))
    assert radiod.chans[200].low == -2000.0
    bw = float(np.asarray(radiod.params["hf"]["demod"]["bandwidth"][0]))
    assert bw == 4000.0

    # gain via command
    radiod.handle_packet(encode_status({T.OUTPUT_SSRC: 200, T.HEADROOM: -10.0}, cmd=True))
    hr = float(np.asarray(radiod.params["hf"]["demod"]["headroom"][0]))
    assert abs(20 * np.log10(hr) + 10.0) < 1e-3

    # engine still steps fine after surgery (no shape changes)
    radiod.step_block()


def test_retune_moves_audio(radiod):
    # after retuning to 150 kHz the 201 kHz carrier is out of band: squelch noise
    for _ in range(8):
        radiod.step_block()
    bb = float(np.asarray(radiod.chans[200].last_info["baseband_power"][0]))
    assert bb < 1e-6  # carrier gone from passband


def test_dynamic_channel_lifecycle():
    """Unknown SSRC command creates a channel; idle dynamic channels expire
    and their slots are recycled without a rebuild."""
    cfg = load_config(CONF.replace("update = 5", "update = 5\nlifetime = 0.08"))
    rd = Radiod(cfg, use_network=False)
    for _ in range(3):
        rd.step_block()

    # create via command: new SSRC, nfm preset at 150 kHz
    rd.handle_packet(encode_status({
        T.OUTPUT_SSRC: 9999, T.COMMAND_TAG: 7, T.PRESET: "nfm",
        T.RADIO_FREQUENCY: 150_000.0,
    }, cmd=True))
    assert 9999 in rd.chans
    ch = rd.chans[9999]
    assert ch.dynamic and ch.group == "dyn-nfm"
    # the rebuild preallocates dyn-slots tombstoned spares (radio_status.c
    # ms-latency create analog) so later creates skip the compile
    assert rd.engine.groups["dyn-nfm"].C == 1 + rd.dyn_spare
    # the response status went out
    stats = [p for k, p in rd._sent if k == "status"]
    _, f, _ = decode_status(stats[-1])
    assert f[T.OUTPUT_SSRC] == 9999 and f[T.COMMAND_TAG] == 7
    assert f[T.DEMOD_TYPE] == 1  # fm
    assert f[T.RADIO_FREQUENCY] == 150_000.0

    # engine still steps; pre-existing static channel unaffected
    out = rd.step_block()
    assert "dyn-nfm" in out
    assert 200 in rd.chans

    # second dynamic channel reuses a preallocated spare: same engine
    eng_before = rd.engine
    rd.handle_packet(encode_status({
        T.OUTPUT_SSRC: 8888, T.PRESET: "nfm", T.RADIO_FREQUENCY: 160_000.0,
    }, cmd=True))
    assert rd.engine is eng_before
    assert rd.engine.groups["dyn-nfm"].C == 1 + rd.dyn_spare
    assert rd.chans[8888].idx != rd.chans[9999].idx
    rd.step_block()

    # lifetime 0.08 s = 4 blocks: let both expire
    for _ in range(6):
        rd.step_block()
    assert 9999 not in rd.chans and 8888 not in rd.chans
    assert sorted(rd.free_slots["dyn-nfm"]) == list(range(1 + rd.dyn_spare))

    # recreate: reuses a tombstoned slot with NO rebuild
    eng_before = rd.engine
    rd.handle_packet(encode_status({
        T.OUTPUT_SSRC: 7777, T.PRESET: "nfm", T.RADIO_FREQUENCY: 155_000.0,
    }, cmd=True))
    assert rd.engine is eng_before  # no recompile
    slot = rd.chans[7777].idx
    assert 0 <= slot <= rd.dyn_spare
    # the tombstone muting must be undone: squelch thresholds back to the
    # preset's values, not the 1e30 mute sentinel
    d = rd.engine.groups["dyn-nfm"].host["demod"]
    assert d["squelch_open"][slot] < 100.0
    assert not d["snr_squelch_enable"][slot]
    rd.step_block()


def test_output_aggregation():
    """block = N coalesces N blocks per RTP packet (audio.c maxdelay)."""
    cfg = load_config(CONF.replace("update = 5", "update = 100\nblock = 3"))
    rd = Radiod(cfg, use_network=False)
    for _ in range(9):
        rd.step_block()
    data = [p for k, p in rd._sent if k == "data"]
    assert data
    h, payload = RtpHeader.unpack(data[-1])
    # 3 blocks of 320 frames at 16 kHz = 960 frames = 1920 bytes s16be,
    # split into <=1400-byte packets: sizes 1400 + 520
    sizes = sorted(len(p) - 12 for p in data[-2:])
    assert sum(sizes) == 960 * 2
    # timestamps advance by aggregate counts
    h0, _ = RtpHeader.unpack(data[0])
    h1, _ = RtpHeader.unpack(data[1])
    assert (h1.timestamp - h0.timestamp) % 0x100000000 in (700, 960, 320, 640)


def test_checkpoint_resume(tmp_path):
    """Carried DSP state survives a save/restore round trip."""
    rd = Radiod(load_config(CONF), use_network=False)
    for _ in range(6):
        rd.step_block()
    path = str(tmp_path / "state.npz")
    rd.save_checkpoint(path)
    before = rd.step_block()

    rd2 = Radiod(load_config(CONF), use_network=False)
    assert rd2.load_checkpoint(path)
    assert rd2.blocks == 6
    after = rd2.step_block()
    # same state + same deterministic source -> identical outputs
    np.testing.assert_allclose(
        np.asarray(before["hf"]["audio"]), np.asarray(after["hf"]["audio"]), atol=1e-6)
    # both daemons advanced exactly one block past the snapshot
    assert rd2.chans[200].rtp_timestamp == rd.chans[200].rtp_timestamp

    # mismatched structure (different demod family) refuses cleanly
    rd3 = Radiod(load_config(CONF.replace("mode = usb\nsamprate = 16k", "mode = nfm\nsamprate = 16k")),
                 use_network=False)
    assert not rd3.load_checkpoint(path)


def test_radiod_mesh_mode():
    """[global] mesh = yes runs the daemon on the sharded engine (the
    distributed master FFT + channel-axis sharding) over every local
    device; audio and control must keep working."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("single device")
    conf = CONF.replace("samprate = 1m024", "samprate = 128k")
    conf = conf.replace("freq = 200k0", "freq = 30k0 32k0 34k0 36k0 38k0 40k0 42k0 44k0")
    conf = conf.replace("carrier = 201k0", "carrier = 31k0")
    conf = conf.replace("[global]", "[global]\nmesh = yes\ndyn-slots = 7")
    rd = Radiod(load_config(conf), use_network=False)
    assert rd.engine.mesh is not None
    for _ in range(10):
        rd.step_block()
    ch = rd.chans[30]
    assert np.isfinite(np.asarray(ch.last_info["baseband_power"])).all()
    # the 31 kHz carrier lands +1 kHz into the 30 kHz channel's passband
    data = [p for kind, p in rd._sent if kind == "data"]
    assert data
    # control plane still retunes with the same engine (no recompiles)
    eng = rd.engine
    rd.handle_packet(encode_status({T.OUTPUT_SSRC: 32, T.RADIO_FREQUENCY: 33_000.0}, cmd=True))
    assert rd.engine is eng
    rd.step_block()
    # dynamic create rounds the new group to the mesh size
    rd.handle_packet(encode_status({
        T.OUTPUT_SSRC: 7777, T.PRESET: "usb", T.RADIO_FREQUENCY: 50_000.0}, cmd=True))
    assert 7777 in rd.chans
    g = rd.chans[7777].group
    assert rd.engine.groups[g].C % len(jax.devices()) == 0
    rd.step_block()
    assert np.isfinite(np.asarray(rd.chans[7777].last_info["baseband_power"])).all()


def test_per_section_data_streams():
    """A section's `data =` sends its channels' RTP and beacons to its OWN
    multicast group (radio.c:705-754), from the same source port as
    everything else (the stock-client session-matching discipline)."""
    import os
    import select
    import socket
    import time

    from ka9q_radio_tpu.config import load_config
    from ka9q_radio_tpu.runtime.radiod import Radiod
    from ka9q_radio_tpu.net.multicast import resolve_dest, listen_socket
    from ka9q_radio_tpu.net.status import decode_status

    tag = f"psd-{os.getpid()}"
    conf = f"""
[global]
hardware = sig_gen
status = {tag}-st.local
data = {tag}-pcm.local
update = 2
advertise = no
sap = no
[sig_gen]
device = sig_gen
samprate = 256k
complex = yes
carrier = 66k
amplitude = -20
[main]
mode = usb
samprate = 12k
freq = 65k0
[aux]
mode = usb
samprate = 12k
freq = 65k5
data = {tag}-aux.local
update = 1
"""
    rd = Radiod(load_config(conf), use_network=True)
    socks = {name: listen_socket(resolve_dest(f"{tag}-{name}.local", port))
             for name, port in (("pcm", 5004), ("aux", 5004), ("aux-st", 0))}
    socks["aux-st"] = listen_socket((resolve_dest(f"{tag}-aux.local", 5006)))
    seen = {}  # stream -> {ssrc: source_port}
    deadline = time.time() + 30
    while time.time() < deadline and not (
            65 in seen.get("pcm", {}) and 66 in seen.get("aux", {})
            and 66 in seen.get("aux-st", {})):
        rd.step_block()
        r, _, _ = select.select(list(socks.values()), [], [], 0)
        for sk in r:
            name = next(k for k, v in socks.items() if v is sk)
            pkt, addr = sk.recvfrom(65536)
            if name == "aux-st":
                try:
                    _, fields, _ = decode_status(pkt)
                except Exception:
                    continue
                ssrc = fields.get(1) or fields.get(18)  # COMMAND_TAG? OUTPUT_SSRC
                from ka9q_radio_tpu.net.status import StatusType as T
                ssrc = fields.get(T.OUTPUT_SSRC)
                if ssrc is not None:
                    seen.setdefault(name, {})[ssrc] = addr[1]
            elif len(pkt) > 12:
                ssrc = int.from_bytes(pkt[8:12], "big")
                seen.setdefault(name, {})[ssrc] = addr[1]
    assert 65 in seen.get("pcm", {}), seen  # [main] on the global stream
    assert 66 in seen.get("aux", {}), seen  # [aux] on its own stream
    assert 66 not in seen.get("pcm", {}), seen  # and NOT on the global one
    assert 66 in seen.get("aux-st", {}), seen  # beacons on aux's :5006
    # session-matching discipline is per stream: a client of the aux
    # group must see audio and beacons from ONE source port
    assert seen["aux"][66] == seen["aux-st"][66], seen
    # per-section `update =` seeds the channel's beacon cadence
    assert rd.chans[66].update_every == 1 and rd.chans[65].update_every is None


def test_status_covers_reference_dump_keys():
    """Beacons carry the radio_status.c:706-915 dump fields clients render:
    socket triplet, FE edges, second-LO, de-emphasis, PLL phase/wraps,
    filter2 geometry, spectrum noise bandwidth."""
    from ka9q_radio_tpu.config import load_config
    from ka9q_radio_tpu.net.status import StatusType as T, decode_status

    conf = """
[global]
hardware = sig_gen
mode = usb
[sig_gen]
device = sig_gen
samprate = 256k
complex = yes
carrier = 66k
amplitude = -20
[sam]
mode = sam
freq = 66k0
[nbfm]
mode = pm
freq = 70k0
[sweep]
mode = spectrum
freq = 64k0
resolution-bw = 1000
bin-count = 16
[cw]
mode = cwu
freq = 65k0
"""
    rd = Radiod(load_config(conf), use_network=False)
    rd.step_block()
    by_ssrc = {c.ssrc: c for c in rd.chans.values()}
    _, sam, _ = decode_status(rd.encode_channel_status(by_ssrc[66]))
    for k in (T.FE_LOW_EDGE, T.FE_HIGH_EDGE, T.SECOND_LO_FREQUENCY,
              T.PLL_PHASE, T.PLL_WRAPS, T.OUTPUT_TTL, T.OUTPUT_ERRORS):
        assert k in sam, k
    assert sam[T.FE_LOW_EDGE] == -128_000.0 and sam[T.FE_HIGH_EDGE] == 128_000.0
    # second LO = fine-tune remainder, bounded by one bin spacing
    assert abs(sam[T.SECOND_LO_FREQUENCY]) <= rd.engine.samprate / rd.engine.master.N + 1e-6
    _, fm, _ = decode_status(rd.encode_channel_status(by_ssrc[70]))
    assert T.DEEMPH_TC in fm and 100.0 < fm[T.DEEMPH_TC] < 1000.0  # ~530 us
    _, sw, _ = decode_status(rd.encode_channel_status(by_ssrc[64]))
    assert T.NOISE_BW in sw and sw[T.NOISE_BW] > sw[T.RESOLUTION_BW]
    _, cw, _ = decode_status(rd.encode_channel_status(by_ssrc[65]))
    assert T.FILTER2_BLOCKSIZE in cw and T.FILTER2_FIR_LENGTH in cw  # cwu has filter2


def test_backend_flake_drops_block_not_daemon():
    """jax backend errors SUBCLASS RuntimeError (JaxRuntimeError): a
    transient tunnel flake in the device section must count a block drop
    and keep serving, never kill the daemon (rx888.c:675-688 analog)."""
    import jax

    from ka9q_radio_tpu.config import load_config

    rd = Radiod(load_config("""
[global]
hardware = sig_gen
mode = usb
[sig_gen]
device = sig_gen
samprate = 128k
complex = yes
carrier = 33k
[hf]
mode = usb
samprate = 8k
freq = 32k0
"""), use_network=False)
    rd.step_block()
    real_step = rd.step
    calls = {"n": 0}

    def flaky(st, pa, blk):
        calls["n"] += 1
        if calls["n"] == 1:
            raise jax.errors.JaxRuntimeError("UNIMPLEMENTED: TPU backend error")
        return real_step(st, pa, blk)

    rd.step = flaky
    assert rd.step_block() is None  # dropped, not raised
    assert rd.block_drops == 1
    out = rd.step_block()  # next block flows again
    assert out is not None
    assert np.all(np.isfinite(np.asarray(out["hf"]["audio"])))
    # the config error is still a hard error
    rd.step = real_step
    rd.frontend = rd.source_state = None
    with pytest.raises(RuntimeError):
        rd.step_block()


def test_fail_deadline_rides_out_long_bursts():
    """The daemon must survive arbitrarily long flake bursts while blocks
    still land occasionally, and die only after `fail-deadline` seconds
    with NO good block (tunnel-bout policy; rx888.c:675-688 analog)."""
    import jax

    from ka9q_radio_tpu.config import load_config

    rd = Radiod(load_config("""
[global]
hardware = sig_gen
mode = usb
fail-deadline = 0.2
[sig_gen]
device = sig_gen
samprate = 128k
complex = yes
carrier = 33k
[hf]
mode = usb
samprate = 8k
freq = 32k0
"""), use_network=False)
    assert rd.fail_deadline == 0.2
    rd.step_block()
    real_step = rd.step

    def always_flaky(st, pa, blk):
        raise jax.errors.JaxRuntimeError("UNIMPLEMENTED: TPU backend error")

    rd.step = always_flaky
    # a burst longer than the old 100-drop budget: survives while within
    # the deadline window
    rd._last_good = time.monotonic()
    for _ in range(120):
        rd._last_good = time.monotonic()  # pretend blocks landed recently
        assert rd.step_block() is None
    assert rd.block_drops >= 120
    # deadline exceeded with no good block -> surfaces the error
    rd._last_good = time.monotonic() - 1.0
    with pytest.raises(Exception):
        rd.step_block()
    # a good block resets the burst accounting
    rd.step = real_step
    rd._last_good = time.monotonic() - 1.0
    assert rd.step_block() is not None
    assert rd._drop_burst == 0


def test_command_flake_drops_command_not_daemon():
    """A device flake while APPLYING a control command (create/rebuild/
    surgery) drops that command like a lost UDP packet — the daemon
    survives, the engine stays coherent, and a client retry succeeds."""
    import os
    import select

    import jax

    from ka9q_radio_tpu.net.multicast import resolve_dest, output_socket

    tag = f"cmdflake-{os.getpid()}"
    rd = Radiod(load_config(f"""
[global]
hardware = sig_gen
mode = usb
status = {tag}-st.local
data = {tag}-pcm.local
ttl = 0
[sig_gen]
device = sig_gen
samprate = 128k
complex = yes
carrier = 33k
[hf]
mode = usb
samprate = 8k
freq = 32k0
"""), use_network=True)
    rd.step_block()
    eng_before = rd.engine
    ssrc = next(iter(rd.chans))
    orig_apply = rd.apply_command
    calls = {"n": 0}

    def flaky_apply(ch, fields):
        calls["n"] += 1
        if calls["n"] == 1:
            raise jax.errors.JaxRuntimeError("UNAVAILABLE: TPU backend error")
        return orig_apply(ch, fields)

    rd.apply_command = flaky_apply
    tx = output_socket(resolve_dest(f"{tag}-st.local", 5006))
    cmd = encode_status({T.OUTPUT_SSRC: ssrc, T.COMMAND_TAG: 7,
                         T.RADIO_FREQUENCY: 31_000.0}, cmd=True)
    tx.send(cmd)
    deadline = time.monotonic() + 5
    while rd.command_drops == 0 and time.monotonic() < deadline:
        rd.poll_commands()
        time.sleep(0.02)
    assert rd.command_drops == 1
    assert rd.chans[ssrc].freq == 32_000.0  # command lost, state coherent
    assert rd.engine is eng_before
    # the retry lands
    tx.send(cmd)
    deadline = time.monotonic() + 5
    while rd.chans[ssrc].freq != 31_000.0 and time.monotonic() < deadline:
        rd.poll_commands()
        time.sleep(0.02)
    assert rd.chans[ssrc].freq == 31_000.0
    assert rd.step_block() is not None or rd.step_block() is not None
    tx.close()


def test_realtime_pacing(radiod):
    """P7 analog: `run(realtime=True)` paces blocks to the wall clock the
    way the reference's A/D stream does (sig_gen.c:269-363 paces itself;
    SCHED_FIFO keeps the chain ahead of it). The run must take at least
    the RF time it emitted and keep per-block compute stats."""
    rd = radiod
    bt = rd.cfg.blocktime
    t0 = time.monotonic()
    rd.run(nblocks=8, realtime=True)
    elapsed = time.monotonic() - t0
    assert elapsed >= 8 * bt * 0.9, (elapsed, bt)
    # tracing/profiling stats are live (main.c:151-188 analog)
    assert rd.t_min <= rd.t_avg <= rd.t_max
    assert rd.t_max < 8 * bt + 5.0


def test_egress_compaction_daemon():
    """Squelch-gated egress end to end (audio.c:42-110 analog): with
    egress-slots set and the big-group scalable path forced on, only
    OPEN channels' audio reaches the wire (device-side compaction +
    native indexed send), while staggered beacons still cover every
    channel and carry finite powers from the lazily-fetched info."""
    import select
    import socket as socketlib
    import time as timelib
    from ka9q_radio_tpu.config import load_config
    from ka9q_radio_tpu.net.multicast import listen_socket, resolve_dest
    from ka9q_radio_tpu.net.status import StatusType as T, decode_status

    import os as oslib
    tag = f"egress-{oslib.getpid()}"
    conf = f"""
[global]
hardware = sig_gen
mode = usb
status = {tag}-ctl.local
data = {tag}-pcm.local
update = 2
big-group = 4
[sig_gen]
device = sig_gen
samprate = 1m024
real = yes
carrier = 60k7
amplitude = -20
noise = -140
[hf]
mode = usb
samprate = 12k
raster = 40k 120k 10k
snr-squelch = yes
squelch-open = 8
squelch-close = 7
egress-slots = 4
"""
    rd = Radiod(load_config(conf), use_network=True)
    g = rd.engine.groups["hf"]
    assert g.spec.egress_slots == 4 and g.C == 8
    assert "hf" in rd.edges, "compaction demo needs the native edge"
    rx = listen_socket(resolve_dest(f"{tag}-pcm.local", 5004))
    rx_st = listen_socket(resolve_dest(f"{tag}-pcm.local", 5006))
    # warm-up: the filter tail smears the carrier across all bins for the
    # first blocks, so every squelch opens briefly (and the overflow
    # counter fires — by design); drain and ignore
    for _ in range(8):
        rd.step_block()
    while select.select([rx, rx_st], [], [], 0)[0]:
        for sk in select.select([rx, rx_st], [], [], 0)[0]:
            sk.recvfrom(65536)
    warm_overflows = rd.egress_overflows
    audio_ssrcs, beacon_ssrcs = set(), {}
    deadline = timelib.time() + 30
    blocks = 0
    while timelib.time() < deadline and (blocks < 40 or len(beacon_ssrcs) < 8):
        rd.step_block()
        blocks += 1
        r, _, _ = select.select([rx, rx_st], [], [], 0)
        for sk in r:
            pkt, _ = sk.recvfrom(65536)
            if sk is rx and len(pkt) > 12:
                audio_ssrcs.add(int.from_bytes(pkt[8:12], "big"))
            elif sk is rx_st:
                try:
                    _, fields, _ = decode_status(pkt)
                except Exception:
                    continue
                ssrc = fields.get(T.OUTPUT_SSRC)
                if ssrc is not None:
                    beacon_ssrcs[ssrc] = fields
    # only the carrier channel (60 kHz slot, ssrc 60) opened its squelch
    assert audio_ssrcs == {60}, audio_ssrcs
    assert rd.egress_overflows == warm_overflows  # none past warm-up
    # every channel still beacons (staggered slices) with live metrics
    assert set(beacon_ssrcs) >= {40, 50, 60, 70, 80, 90, 100, 110}, set(beacon_ssrcs)
    f60 = beacon_ssrcs[60]
    assert np.isfinite(f60[T.BASEBAND_POWER]) and np.isfinite(f60[T.NOISE_DENSITY])
    # the open channel's baseband power dwarfs a muted one's
    assert f60[T.BASEBAND_POWER] > beacon_ssrcs[90][T.BASEBAND_POWER] + 20


def test_egress_compaction_timeshard():
    """Compacted egress composes with time-shards (the [D, K] sliced
    outputs): only the open channel's audio is emitted per block."""
    conf = """
[global]
hardware = sig_gen
mode = usb
time-shards = 2
update = 100
[sig_gen]
device = sig_gen
samprate = 1m024
real = yes
carrier = 60k7
amplitude = -20
noise = -140
[hf]
mode = usb
samprate = 12k
raster = 40k 120k 10k
snr-squelch = yes
egress-slots = 4
"""
    rd = Radiod(load_config(conf), use_network=False)
    for _ in range(10):
        rd.step_block()
    rd._sent.clear()
    for _ in range(6):
        rd.step_block()
    ssrcs = {int.from_bytes(p[8:12], "big")
             for k, p in rd._sent if k == "data"}
    assert ssrcs == {60}, ssrcs
    audio = np.concatenate([decode_samples(RtpHeader.unpack(p)[1], Encoding.S16BE)
                            for k, p in rd._sent if k == "data"])
    S = np.abs(np.fft.rfft(audio * np.hanning(audio.size)))
    f = np.fft.rfftfreq(audio.size, 1 / 12_000)
    assert abs(f[np.argmax(S)] - 700.0) < 25
