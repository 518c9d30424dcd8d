"""RTCP builders/parser and doppler steering."""
import numpy as np

from ka9q_radio_tpu.net.rtcp import build_sr, build_sdes, build_bye, compound, parse_rtcp
from ka9q_radio_tpu.net.status import StatusType as T, encode_status
from ka9q_radio_tpu.config import load_config
from ka9q_radio_tpu.runtime.radiod import Radiod

CONF = """
[global]
hardware = sig_gen
update = 100
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


def test_rtcp_roundtrip():
    pkt = compound(
        build_sr(1234, 987654, 42, 100000),
        build_sdes(1234, "radiod-tpu test"),
        build_bye([1234, 5678]),
    )
    items = parse_rtcp(pkt)
    assert [pt for pt, _ in items] == [200, 202, 203]
    sr = items[0][1]
    assert sr["ssrc"] == 1234 and sr["rtp_timestamp"] == 987654 and sr["packets"] == 42
    assert sr["ntp_sec"] > 3_900_000_000  # sane NTP era
    sdes = items[1][1]
    assert sdes["items"][1] == "radiod-tpu test"
    assert items[2][1]["ssrcs"] == [1234, 5678]


def test_doppler_steering():
    rd = Radiod(load_config(CONF), use_network=False)
    for _ in range(3):
        rd.step_block()
    shift0 = int(np.asarray(rd.params["hf"]["shifts"][0]))
    # command: doppler offset 0, rate +50 kHz/s => 1 kHz/block
    rd.handle_packet(encode_status({
        T.OUTPUT_SSRC: 200, T.DOPPLER_FREQUENCY: 0.0,
        T.DOPPLER_FREQUENCY_RATE: 50_000.0,
    }, cmd=True))
    assert 200 in rd.doppler
    for _ in range(10):
        rd.step_block()
    shift1 = int(np.asarray(rd.params["hf"]["shifts"][0]))
    moved_hz = (shift1 - shift0) * rd.engine.samprate / rd.engine.master.N
    assert 8_000 < moved_hz < 12_000, moved_hz  # ~10 blocks * 1 kHz
    # cancel steering: retunes back to the nominal frequency
    rd.handle_packet(encode_status({
        T.OUTPUT_SSRC: 200, T.DOPPLER_FREQUENCY: 0.0,
        T.DOPPLER_FREQUENCY_RATE: 0.0,
    }, cmd=True))
    assert 200 not in rd.doppler
    assert int(np.asarray(rd.params["hf"]["shifts"][0])) == shift0


def test_sap_sdp_roundtrip():
    from ka9q_radio_tpu.net.sap import build_sdp, build_sap, parse_sap

    sdp = build_sdp("my radio", "239.1.2.3", 5004, "10.0.0.1",
                    [(77, "L16", 24000, 1), (123, "opus", 48000, 2)])
    assert "m=audio 5004 RTP/AVP 77 123" in sdp
    assert "a=rtpmap:77 L16/24000/1" in sdp
    assert "c=IN IP4 239.1.2.3/1" in sdp
    pkt = build_sap(sdp, "10.0.0.1", msg_id=42)
    origin, msg_id, deletion, text = parse_sap(pkt)
    assert origin == "10.0.0.1" and msg_id == 42 and not deletion
    assert text == sdp
