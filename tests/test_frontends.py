"""Front ends: file playback, RTP network ingest, Opus output path."""
import os
import threading
import time

import numpy as np
import pytest

from ka9q_radio_tpu.config import load_config
from ka9q_radio_tpu.runtime.frontends import FileSource, RtpSource
from ka9q_radio_tpu.runtime.radiod import Radiod
from ka9q_radio_tpu.net.rtp import Encoding


def test_file_source_roundtrip(tmp_path):
    fs = 256_000
    t = np.arange(4096) / fs
    iq = (0.5 * np.exp(2j * np.pi * 10_000 * t)).astype(np.complex64)
    path = tmp_path / "cap.iq"
    inter = np.empty(2 * iq.size, np.float32)
    inter[0::2], inter[1::2] = iq.real, iq.imag
    path.write_bytes(inter.astype("<f4").tobytes())

    src = FileSource(str(path), fs, "cf32le")
    blk = src.read_block(4096)
    assert blk.dtype == np.complex64
    assert np.allclose(blk, iq)
    # exhaustion pads zeros
    blk2 = src.read_block(1000)
    assert src.exhausted and np.all(blk2 == 0)

    # s16 real
    real = (np.sin(2 * np.pi * 1000 * t) * 0.5 * 32767).astype("<i2")
    p2 = tmp_path / "cap.s16"
    p2.write_bytes(real.tobytes())
    src2 = FileSource(str(p2), fs, "s16le")
    blk = src2.read_block(4096)
    assert blk.dtype == np.float32
    assert abs(blk.max() - 0.5) < 0.01


def test_radiod_with_file_source(tmp_path):
    """End-to-end: USB channel demodulated from a file capture."""
    fs = 1_024_000
    n = 8 * 20480
    t = np.arange(n) / fs
    iq = (0.05 * np.exp(2j * np.pi * 201_000 * t)).astype(np.complex64)
    inter = np.empty(2 * n, np.float32)
    inter[0::2], inter[1::2] = iq.real, iq.imag
    path = tmp_path / "hf.iq"
    path.write_bytes(inter.astype("<f4").tobytes())

    cfg = load_config(f"""
[global]
hardware = cap
mode = usb
[cap]
device = file
path = {path}
samprate = 1m024
format = cf32le
loop = yes
[hf]
mode = usb
samprate = 16k
freq = 200k0
""")
    assert isinstance(cfg.source, dict) and cfg.source["kind"] == "file"
    rd = Radiod(cfg, use_network=False)
    for _ in range(10):
        rd.step_block()
    audio = np.concatenate(
        [p[12:] for k, p in rd._sent if k == "data"][-20:], axis=None
    )
    pcm = np.frombuffer(b"".join([p[12:] for k, p in rd._sent if k == "data"][-20:]), ">i2").astype(np.float32)
    spec = np.abs(np.fft.rfft(pcm * np.hanning(pcm.size)))
    f = np.fft.rfftfreq(pcm.size, 1 / 16_000)
    assert abs(f[np.argmax(spec)] - 1000.0) < 20.0


def test_rtp_source_loopback():
    """pcmsend-style feeder -> RtpSource reassembly with loss fill."""
    import socket
    from ka9q_radio_tpu.net.rtp import RtpHeader, encode_samples
    from ka9q_radio_tpu.net.multicast import make_maddr

    stream = f"feed-{os.getpid()}.local"
    port = 47000 + os.getpid() % 1000
    src = RtpSource(f"{stream}:{port}", samprate=48_000, real=False, encoding="s16be")
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    tx.setsockopt(socket.IPPROTO_IP, socket.IP_MULTICAST_TTL, 1)
    dest = (make_maddr(stream), port)

    fs = 48_000
    nf = 240
    seq = ts = 0
    sent = []
    for k in range(40):
        t = (np.arange(nf) + k * nf) / fs
        iq = 0.3 * np.exp(2j * np.pi * 1000 * t)
        x = np.empty(2 * nf, np.float32)
        x[0::2], x[1::2] = iq.real, iq.imag
        hdr = RtpHeader(type=97, seq=seq, timestamp=ts, ssrc=7)
        if k != 20:  # drop packet 20
            tx.sendto(hdr.pack() + encode_samples(x, Encoding.S16BE), dest)
        seq = (seq + 1) & 0xFFFF
        ts += nf
        sent.append(iq)
    time.sleep(0.2)
    blk = src.read_block(39 * nf, timeout=0.5)
    assert blk.dtype == np.complex64
    # first packets present
    assert np.allclose(blk[:nf], sent[0], atol=1e-3)
    # dropped packet zero-filled, stream continues aligned
    assert np.all(blk[20 * nf : 21 * nf] == 0)
    assert np.allclose(blk[21 * nf : 22 * nf], sent[21], atol=1e-3)
    src.close()


def test_opus_output_path():
    """encoding=opus produces decodable Opus RTP."""
    pytest.importorskip("ctypes")
    from ka9q_radio_tpu.net.opus import available, OpusDecoder

    if not available():
        pytest.skip("libopus missing")
    cfg = load_config("""
[global]
hardware = sig_gen
mode = usb
encoding = opus
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
""")
    rd = Radiod(cfg, use_network=False)
    for _ in range(10):
        rd.step_block()
    ch = rd.chans[200]
    assert ch.encoding == Encoding.OPUS
    assert rd.registry.info_from_pt(ch.pt) == (48_000, 2, Encoding.OPUS)
    pkts = [p for k, p in rd._sent if k == "data"]
    assert pkts
    dec = OpusDecoder(48_000, 2)
    pcm = np.concatenate([dec.decode(p[12:]) for p in pkts[2:]])
    assert pcm.shape[1] == 2
    spec = np.abs(np.fft.rfft(pcm[:, 0] * np.hanning(pcm.shape[0])))
    f = np.fft.rfftfreq(pcm.shape[0], 1 / 48_000)
    assert abs(f[np.argmax(spec)] - 1000.0) < 30.0
