"""pcmrecord depth: Ogg-Opus container, squelch splitting, --exec, wd/JT
alignment (pcmrecord.c:1-40, wd-record.c)."""
import argparse
import os
import struct
import time

import numpy as np
import pytest

from ka9q_radio_tpu.cli.pcmrecord import Session, _expand_macros
from ka9q_radio_tpu.net.rtp import RtpHeader, Encoding, encode_samples
from ka9q_radio_tpu.net.ogg import OggOpusWriter, ogg_crc


def _args(tmp_path, **kw):
    d = dict(dir=str(tmp_path), stdout=False, exec_cmd=None, raw=False,
             timeout=20.0, mintime=0.0, max_length=None, pad=False, jt=False,
             subdirs=False, flush=False, split_on_marker=True)
    d.update(kw)
    return argparse.Namespace(**d)


def _pcm_packets(n_pkts=20, fs=12_000, pkt=240, freq=1000.0, marker_at=()):
    t = np.arange(n_pkts * pkt) / fs
    audio = (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    out = []
    for i in range(n_pkts):
        payload = encode_samples(audio[i * pkt : (i + 1) * pkt], Encoding.S16BE)
        out.append(RtpHeader(type=122, seq=i, timestamp=i * pkt, ssrc=5,
                             marker=i in marker_at))
    return [(h, encode_samples(audio[i * pkt : (i + 1) * pkt], Encoding.S16BE))
            for i, h in enumerate(out)]


def _parse_ogg(path):
    """Extract packets from an Ogg file, checking page CRCs."""
    data = open(path, "rb").read()
    packets, partial = [], b""
    off = 0
    while off < len(data):
        assert data[off : off + 4] == b"OggS"
        nseg = data[off + 26]
        segs = data[off + 27 : off + 27 + nseg]
        body_off = off + 27 + nseg
        # CRC check: zero the crc field and recompute
        body_len = sum(segs)
        page = bytearray(data[off : body_off + body_len])
        crc_stored = struct.unpack("<I", page[22:26])[0]
        page[22:26] = b"\0\0\0\0"
        assert ogg_crc(bytes(page)) == crc_stored
        p = body_off
        for s in segs:
            partial += data[p : p + s]
            p += s
            if s < 255:
                packets.append(partial)
                partial = b""
        off = body_off + body_len
    return packets


def test_ogg_opus_container(tmp_path):
    from ka9q_radio_tpu.net import opus as opuslib

    if not opuslib.available():
        pytest.skip("no libopus")
    enc = opuslib.OpusEncoder(48_000, 2)
    fs, frame = 48_000, 960
    t = np.arange(fs) / fs
    tone = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    stereo = np.stack([tone, tone], axis=1)

    sess = Session(9, 48_000, 2, Encoding.OPUS, _args(tmp_path))
    for i, off in enumerate(range(0, fs - frame, frame)):
        payload = enc.encode(stereo[off : off + frame])
        sess.write(RtpHeader(type=111, seq=i, timestamp=off, ssrc=9), payload)
    path = sess.path
    sess.close()
    assert path.endswith(".opus") and os.path.exists(path)

    pkts = _parse_ogg(path)
    assert pkts[0].startswith(b"OpusHead")
    assert pkts[1].startswith(b"OpusTags")
    dec = opuslib.OpusDecoder(48_000, 2)
    audio = np.concatenate([dec.decode(p) for p in pkts[2:]])
    A = np.abs(np.fft.rfft(audio[:, 0] * np.hanning(audio.shape[0])))
    f = np.fft.rfftfreq(audio.shape[0], 1 / 48_000)
    assert abs(f[np.argmax(A)] - 440.0) < 4


def test_squelch_split_on_idle_and_marker(tmp_path):
    """Idle timeout closes the file (sender squelch closed); the next
    transmission's marker bit opens a new one (pcmrecord.c --timeout)."""
    sess = Session(5, 12_000, 1, Encoding.S16BE, _args(tmp_path, timeout=0.2))
    pkts = _pcm_packets(10)
    for h, p in pkts[:5]:
        sess.write(h, p)
    first = sess.path
    sess.last_packet -= 1.0  # simulate 1 s of silence
    sess.idle_check(time.monotonic())
    assert sess.path is None and os.path.exists(first)
    time.sleep(1.1)  # distinct timestamp for the second file
    h, p = pkts[5]
    h2 = RtpHeader(type=h.type, seq=h.seq, timestamp=h.timestamp, ssrc=h.ssrc,
                   marker=True)
    sess.write(h2, p)
    second = sess.path
    assert second is not None and second != first
    sess.close()
    assert os.path.exists(second)


def test_mintime_deletes_short_files(tmp_path):
    sess = Session(5, 12_000, 1, Encoding.S16BE, _args(tmp_path, mintime=5.0))
    for h, p in _pcm_packets(3):
        sess.write(h, p)  # 60 ms, far under mintime
    path = sess.path
    sess.close()
    assert not os.path.exists(path)


def test_exec_macros():
    sess = Session.__new__(Session)
    sess.ssrc, sess.samprate, sess.channels = 42, 12_000, 1
    sess.encoding = Encoding.S16LE
    sess.freq, sess.description = 14_074_000.0, "hf rx"
    out = _expand_macros("decode -s $s -r $r -c $c -f $f -m $m -d '$d' $$x", sess)
    assert out == "decode -s 42 -r 12000 -c 1 -f s16le -m 14.074000 -d 'hf rx' $x"


def test_exec_pipes_pcm(tmp_path, monkeypatch):
    import sys
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "")  # fast child start
    out = tmp_path / "pipe.raw"
    cmd = f"{sys.executable} -c \"import sys,shutil;shutil.copyfileobj(sys.stdin.buffer,open('{out}','wb'))\""
    sess = Session(5, 12_000, 1, Encoding.S16BE, _args(tmp_path, exec_cmd=cmd))
    for h, p in _pcm_packets(10):
        sess.write(h, p)
    sess.close()
    data = np.frombuffer(out.read_bytes(), "<i2")
    assert data.size == 10 * 240
    assert np.abs(data).max() > 10_000


def test_wd_alignment_rotation(tmp_path, monkeypatch):
    """--jt --pad --max-length: files align to wall-clock boundaries and
    pad the first file's head with silence (wd-record/wsprdaemon mode)."""
    wall = [1000.75]  # 0.75 s into a 2 s boundary
    monkeypatch.setattr(time, "time", lambda: wall[0])
    sess = Session(5, 12_000, 1, Encoding.S16BE,
                   _args(tmp_path, jt=True, pad=True, max_length=2.0,
                         split_on_marker=False))
    pkts = _pcm_packets(80)  # 1.6 s of audio: crosses the t=1002 boundary
    for i, (h, p) in enumerate(pkts):
        sess.write(h, p)
        wall[0] += 0.02
    sess.close()
    files = sorted(tmp_path.iterdir())
    assert len(files) == 2  # crossed one 2 s boundary
    import wave

    with wave.open(str(files[0])) as w:
        n0 = w.getnframes()
    # first file: padded from boundary (t=1000) to start (1000.75) plus
    # audio up to the t=1002 boundary = 2 s exactly (+- one packet)
    assert abs(n0 - 2 * 12_000) <= 240 * 2


def test_wd_mode_sample_exact_minute_files(tmp_path, monkeypatch):
    """--wd-mode (wd-record.c --wd_mode): recording arms in second L-1,
    starts at the first datagram of second 0, and every file is EXACTLY
    L*samprate frames — packets spanning a boundary split at the frame."""
    import wave

    wall = [2000.3]  # mid-interval: must stay in startup
    monkeypatch.setattr(time, "time", lambda: wall[0])
    sess = Session(5, 12_000, 1, Encoding.S16BE,
                   _args(tmp_path, jt=True, wd_mode=True, max_length=2.0,
                         split_on_marker=False))
    pkts = _pcm_packets(300)  # 6 s of audio at 20 ms/packet
    it = iter(pkts)
    # packets before second L-1: dropped (startup)
    for _ in range(20):
        h, p = next(it)
        sess.write(h, p)
        wall[0] += 0.02
    assert sess.sync_state == "startup" and not list(tmp_path.iterdir())
    wall[0] = 2001.2  # second L-1 of the 2 s interval: arms
    h, p = next(it)
    sess.write(h, p)
    assert sess.sync_state == "armed"
    wall[0] = 2002.01  # first datagram of second 0: starts the series
    nseq = 0
    for h, p in it:
        sess.write(h, p)
        wall[0] += 0.02
        nseq += 1
        if nseq >= 220:  # ~4.4 s: two complete 2 s files + a partial
            break
    sess.close()
    files = sorted(f for f in tmp_path.iterdir())
    assert len(files) >= 2
    for f in files[:2]:
        with wave.open(str(f)) as w:
            assert w.getnframes() == 2 * 12_000  # sample-exact
    # K1JT naming at the interval epochs
    assert files[0].name.startswith(time.strftime(
        "%y%m%d_%H%M%S", time.gmtime(2002.0)))


def test_wd_mode_gap_fill_keeps_alignment(tmp_path, monkeypatch):
    """An RTP drop inside a wd-mode file fills with silence so the frame
    count (and every later file boundary) stays sample-exact."""
    import wave

    wall = [3001.5]
    monkeypatch.setattr(time, "time", lambda: wall[0])
    sess = Session(5, 12_000, 1, Encoding.S16BE,
                   _args(tmp_path, jt=True, wd_mode=True, max_length=2.0,
                         split_on_marker=False))
    pkts = _pcm_packets(200)
    sess.write(*pkts[0])  # arms (second L-1)
    wall[0] = 3002.0
    k = 1
    for h, p in pkts[1:150]:
        if 40 <= k < 45:  # drop 5 packets (100 ms)
            k += 1
            wall[0] += 0.02
            continue
        sess.write(h, p)
        wall[0] += 0.02
        k += 1
    sess.close()
    files = sorted(tmp_path.iterdir())
    assert files
    with wave.open(str(files[0])) as w:
        assert w.getnframes() == 2 * 12_000
