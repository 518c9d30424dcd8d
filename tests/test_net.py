"""Wire-format tests for the TLV status protocol and RTP framing."""
import numpy as np
import pytest

from ka9q_radio_tpu.net.status import StatusType, PacketType, encode_status, decode_status, encode_tlv
from ka9q_radio_tpu.net.rtp import (
    RtpHeader, RtpState, PayloadRegistry, Encoding, encode_samples, decode_samples,
)


def test_tlv_roundtrip():
    fields = {
        StatusType.OUTPUT_SSRC: 146520,
        StatusType.COMMAND_TAG: 0xDEADBEEF,
        StatusType.RADIO_FREQUENCY: 146_520_000.0,
        StatusType.LOW_EDGE: -8000.0,
        StatusType.HIGH_EDGE: 8000.0,
        StatusType.DEMOD_TYPE: 1,
        StatusType.PRESET: "nfm",
        StatusType.SNR_SQUELCH: True,
        StatusType.AGC_ENABLE: False,  # zero -> zero-length value
        StatusType.NOISE_DENSITY: 1.23e-12,
        StatusType.OUTPUT_DATA_DEST_SOCKET: ("239.1.2.3", 5004),
        StatusType.BIN_DATA: [1.0, 0.5, 0.25],
    }
    pkt = encode_status(fields, cmd=True)
    assert pkt[0] == PacketType.CMD
    ptype, dec, unknown = decode_status(pkt)
    assert ptype == PacketType.CMD and not unknown
    assert dec[StatusType.OUTPUT_SSRC] == 146520
    assert dec[StatusType.COMMAND_TAG] == 0xDEADBEEF
    assert dec[StatusType.RADIO_FREQUENCY] == 146_520_000.0
    assert dec[StatusType.LOW_EDGE] == -8000.0
    assert dec[StatusType.PRESET] == "nfm"
    assert dec[StatusType.SNR_SQUELCH] == 1
    assert dec[StatusType.AGC_ENABLE] == 0
    assert dec[StatusType.OUTPUT_DATA_DEST_SOCKET] == ("239.1.2.3", 5004)
    assert np.allclose(dec[StatusType.BIN_DATA], [1.0, 0.5, 0.25])
    assert abs(dec[StatusType.NOISE_DENSITY] - 1.23e-12) < 1e-18


def test_tlv_wire_details():
    # integer MSB-first, leading zeros stripped: 258 -> 0x01 0x02
    raw = encode_tlv(StatusType.OUTPUT_SSRC, 258)
    assert raw == bytes([int(StatusType.OUTPUT_SSRC), 2, 0x01, 0x02])
    # zero encodes with zero length
    assert encode_tlv(StatusType.CMD_CNT, 0) == bytes([int(StatusType.CMD_CNT), 0])
    # long-length form, spec example (ka9q-api.md:40-42): 258 -> 82 01 02
    s = "x" * 258
    raw = encode_tlv(StatusType.DESCRIPTION, s)
    assert raw[1] == 0x82 and raw[2] == 0x01 and raw[3] == 0x02


def test_rtp_header_roundtrip():
    h = RtpHeader(type=122, seq=4660, timestamp=0x11223344, ssrc=146520, marker=True)
    wire = h.pack()
    assert len(wire) == 12 and wire[0] == 0x80
    h2, payload = RtpHeader.unpack(wire + b"abcd")
    assert h2 == h and payload == b"abcd"


def test_payload_registry_matches_reference_policy():
    reg = PayloadRegistry()
    assert reg.pt_from_info(8000, 1, Encoding.MULAW) == 0
    assert reg.pt_from_info(44100, 2, Encoding.S16BE) == 10
    # pre-registered well-known dynamic PTs match rtp.c:15-143
    assert reg.pt_from_info(24000, 1, Encoding.S16BE) == 116
    assert reg.pt_from_info(12000, 1, Encoding.S16BE) == 122
    pt1 = reg.pt_from_info(24000, 1, Encoding.F16LE)
    assert pt1 == 77  # dynamic pool starts at 77 (rtp.c:287-291)
    assert reg.pt_from_info(24000, 1, Encoding.F16LE) == pt1  # stable
    # 100 is skipped
    pts = {reg.pt_from_info(1000 * k, 1, Encoding.F32LE) for k in range(1, 30)}
    assert 100 not in pts
    # opus folds to 48k stereo
    assert reg.pt_from_info(8000, 1, Encoding.OPUS) == reg.pt_from_info(24000, 2, Encoding.OPUS)


@pytest.mark.parametrize("enc,tol", [
    (Encoding.S16BE, 1e-4), (Encoding.S16LE, 1e-4),
    (Encoding.F32BE, 0.0), (Encoding.F32LE, 0.0),
    (Encoding.F16LE, 1e-3), (Encoding.F16BE, 1e-3),
])
def test_pcm_roundtrip(enc, tol):
    x = (np.sin(np.linspace(0, 20, 480)) * 0.7).astype(np.float32)
    y = decode_samples(encode_samples(x, enc), enc)
    assert np.allclose(x, y, atol=tol)


@pytest.mark.parametrize("enc", [Encoding.MULAW, Encoding.ALAW])
def test_g711_companding(enc):
    x = (np.sin(np.linspace(0, 20, 2000)) * 0.7).astype(np.float32)
    y = decode_samples(encode_samples(x, enc), enc)
    # G.711 SNR for a loud sine should be > 30 dB
    snr = 10 * np.log10(np.mean(x**2) / np.mean((x - y) ** 2))
    assert snr > 30.0, snr
    # monotone in the positive quadrant
    xs = np.linspace(0, 0.99, 200).astype(np.float32)
    ys = decode_samples(encode_samples(xs, enc), enc)
    assert np.all(np.diff(ys) >= 0)


def test_rtp_state_accounting():
    st = RtpState()
    h = RtpHeader(type=77, seq=100, timestamp=0, ssrc=1)
    assert st.process(h, 240) == 0
    h = RtpHeader(type=77, seq=101, timestamp=240, ssrc=1)
    assert st.process(h, 240) == 0
    # drop 2 packets
    h = RtpHeader(type=77, seq=104, timestamp=240 * 4, ssrc=1)
    assert st.process(h, 240) == 480
    assert st.drops == 2
    # duplicate
    h = RtpHeader(type=77, seq=104, timestamp=240 * 4, ssrc=1)
    assert st.process(h, 240) < 0
    assert st.dupes == 1


def test_output_socket_tos_and_iface():
    """`tos =` sets the IP DSCP byte (EF default, radio.c:60) and
    `iface =` selects the outgoing multicast interface (ip_mreqn)."""
    import socket

    from ka9q_radio_tpu.net.multicast import output_socket, output_socket_unconnected

    s = output_socket(("239.1.2.3", 5004), ttl=1)
    assert s.getsockopt(socket.IPPROTO_IP, socket.IP_TOS) == 46 << 2
    s.close()
    s = output_socket_unconnected(("239.1.2.3", 5004), ttl=1, tos=0x10, iface="lo")
    assert s.getsockopt(socket.IPPROTO_IP, socket.IP_TOS) == 0x10
    # kernel accepted IP_MULTICAST_IF for lo
    import struct
    raw = s.getsockopt(socket.IPPROTO_IP, socket.IP_MULTICAST_IF, 4)
    s.close()


def test_status_decoder_robust_to_garbage():
    """The TLV decoder must survive hostile/truncated datagrams — the
    daemon's control socket is an open UDP port (radio_status.c drops
    malformed packets; it must never crash or hang on them)."""
    import numpy as np

    from ka9q_radio_tpu.net.status import StatusType as T, encode_status, decode_status

    rng = np.random.default_rng(3)
    good = encode_status({T.OUTPUT_SSRC: 50, T.RADIO_FREQUENCY: 1e6,
                          T.DESCRIPTION: "x" * 200,
                          T.BIN_DATA: [1.0] * 64}, cmd=True)
    for _ in range(500):
        pkt = bytes(rng.integers(0, 256, rng.integers(0, 120), dtype=np.uint8))
        try:
            decode_status(pkt)
        except Exception:
            pass  # rejecting is fine; crashing the interpreter is not
    # truncations of a real packet
    for n in range(len(good)):
        try:
            decode_status(good[:n])
        except Exception:
            pass
    # bit flips
    for _ in range(300):
        b = bytearray(good)
        i = int(rng.integers(0, len(b)))
        b[i] ^= int(rng.integers(1, 256))
        try:
            decode_status(bytes(b))
        except Exception:
            pass
    # and the intact packet still decodes
    _, f, _ = decode_status(good)
    assert f[T.OUTPUT_SSRC] == 50
