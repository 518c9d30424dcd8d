"""Real-time playout engine (net/playout.py): jitter reorder, loss
concealment, clock tracking — the reference monitor's data pipeline
(monitor-data.c:525-758) driven in a loopback harness.

VERDICT acceptance: a lossy, reordered RTP stream plays with
<1 underrun/min and the audio survives intact.
"""
import numpy as np
import pytest

from ka9q_radio_tpu.net.playout import Mixer, PlayoutSession
from ka9q_radio_tpu.net.rtp import RtpHeader, Encoding, encode_samples

FS_IN = 12_000
FS_OUT = 48_000
PKT = 240  # 20 ms at 12 kHz


def _packets(seconds=4.0, freq=1000.0, fs=FS_IN, amp=0.5, rate_scale=1.0):
    """A tone stream as (hdr, payload) tuples. rate_scale simulates sender
    clock drift: the sender's 'fs' differs from nominal by that factor."""
    n = int(seconds * fs)
    t = np.arange(n) / (fs / rate_scale)
    audio = (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    out = []
    for i, off in enumerate(range(0, n - PKT, PKT)):
        payload = encode_samples(audio[off : off + PKT], Encoding.S16BE)
        out.append((RtpHeader(type=122, seq=i, timestamp=off, ssrc=7), payload))
    return out


def _run(mixer, pkts, blocks_per_pkt=None):
    """Feed packets at the stream's natural cadence: one 20 ms mixer block
    per packet, as the portaudio callback would tick."""
    fmt = (FS_IN, 1, Encoding.S16BE)
    out = []
    # prime: let the first packets land before playout starts
    for hdr, payload in pkts[:4]:
        mixer.ingest(hdr, payload, fmt)
    for hdr, payload in pkts[4:]:
        mixer.ingest(hdr, payload, fmt)
        out.append(mixer.next_block())
    # drain the buffered tail (stop at end-of-stream, like the CLI)
    while any(s.active and s._max_written > mixer.play_head
              for s in mixer.sessions.values()):
        out.append(mixer.next_block())
    return np.concatenate(out, axis=0)


def _tone_of(mix):
    a = mix[mix.shape[0] // 4 :, 0].astype(np.float64)
    A = np.abs(np.fft.rfft(a * np.hanning(a.size)))
    f = np.fft.rfftfreq(a.size, 1 / FS_OUT)
    return f[np.argmax(A)], A


def test_clean_stream_plays():
    mixer = Mixer(FS_OUT, int(FS_OUT * 0.02))
    mix = _run(mixer, _packets())
    peak, _ = _tone_of(mix)
    assert abs(peak - 1000.0) < 3
    assert mixer.underruns == 0
    s = mixer.sessions[7]
    assert s.late == 0 and s.drops == 0


def test_reordered_and_lossy_stream():
    """Packets shuffled within 4-deep windows + 2% loss: the ring absorbs
    the reorder, losses become short silences, <1 underrun/min."""
    rng = np.random.default_rng(1)
    pkts = _packets(seconds=6.0)
    # shuffle within windows of 4
    shuffled = []
    for i in range(0, len(pkts), 4):
        w = pkts[i : i + 4]
        rng.shuffle(w)
        shuffled.extend(w)
    # drop 2%
    keep = [p for p in shuffled if rng.random() > 0.02]
    mixer = Mixer(FS_OUT, int(FS_OUT * 0.02))
    mix = _run(mixer, keep)
    peak, _ = _tone_of(mix)
    assert abs(peak - 1000.0) < 3
    # acceptance: < 1 underrun per minute of audio
    minutes = mix.shape[0] / FS_OUT / 60.0
    assert mixer.underruns <= max(1, minutes), mixer.underruns
    s = mixer.sessions[7]
    assert s.drops > 0  # losses were seen...
    assert s.resets == 0  # ...but never resynced the stream


def test_clock_drift_tracked():
    """Sender clock 300 ppm fast: without tracking the queue depth would
    grow ~108 ms over 6 min; the slewed ratio keeps depth near target."""
    mixer = Mixer(FS_OUT, int(FS_OUT * 0.02))
    pkts = _packets(seconds=30.0, rate_scale=1.0003)
    mix = _run(mixer, pkts)
    s = mixer.sessions[7]
    depth = (s._max_written - mixer.play_head) / FS_OUT
    # queue depth still near the 100 ms target (tracker absorbed the skew)
    assert -0.1 < depth < 0.35, depth
    assert s.ratio != s.nominal  # the tracker actually slewed
    assert mixer.underruns <= 1
    peak, _ = _tone_of(mix)
    assert abs(peak - 1000.0) < 4


def test_late_packet_dropped_not_crashed():
    mixer = Mixer(FS_OUT, int(FS_OUT * 0.02))
    pkts = _packets(seconds=1.0)
    fmt = (FS_IN, 1, Encoding.S16BE)
    for hdr, payload in pkts:
        mixer.ingest(hdr, payload, fmt)
    for _ in range(80):
        mixer.next_block()
    # this packet's slot played long ago
    hdr, payload = pkts[5]
    hdr2 = RtpHeader(type=122, seq=hdr.seq + 100, timestamp=hdr.timestamp,
                     ssrc=7)
    mixer.ingest(hdr2, payload, fmt)
    assert mixer.sessions[7].late >= 1


def test_sender_restart_resyncs():
    mixer = Mixer(FS_OUT, int(FS_OUT * 0.02))
    fmt = (FS_IN, 1, Encoding.S16BE)
    for hdr, payload in _packets(seconds=1.0):
        mixer.ingest(hdr, payload, fmt)
        mixer.next_block()
    # sender restarts with a wild new timestamp base
    audio = np.zeros(PKT, np.float32)
    hdr = RtpHeader(type=122, seq=9000, timestamp=900_000_000, ssrc=7)
    mixer.ingest(hdr, encode_samples(audio, Encoding.S16BE), fmt)
    s = mixer.sessions[7]
    assert s.resets == 1
    assert np.isfinite(s.ratio)


def test_gain_and_pan():
    mixer = Mixer(FS_OUT, int(FS_OUT * 0.02))
    s = mixer.session(7, FS_IN, 1, Encoding.S16BE)
    s.gain = 0.5
    s.pan = 1.0  # full right
    mix = _run(mixer, _packets(seconds=1.0))
    tail = mix[mix.shape[0] // 2 :]
    assert np.abs(tail[:, 0]).max() < 1e-6  # left muted by pan
    assert np.abs(tail[:, 1]).max() > 0.1


@pytest.mark.skipif(
    not __import__("ka9q_radio_tpu.net.opus", fromlist=["available"]).available(),
    reason="no libopus")
def test_opus_plc_conceals_losses():
    from ka9q_radio_tpu.net.opus import OpusEncoder

    enc = OpusEncoder(48_000, 2)
    fs = 48_000
    frame = 960
    t = np.arange(fs * 2) / fs
    tone = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    stereo = np.stack([tone, tone], axis=1)
    pkts = []
    for i, off in enumerate(range(0, tone.size - frame, frame)):
        payload = enc.encode(stereo[off : off + frame])
        pkts.append((RtpHeader(type=111, seq=i, timestamp=off, ssrc=9), payload))
    del pkts[30:33]  # drop a burst
    mixer = Mixer(FS_OUT, int(FS_OUT * 0.02))
    fmt = (48_000, 2, Encoding.OPUS)
    for hdr, payload in pkts[:4]:
        mixer.ingest(hdr, payload, fmt)
    out = []
    for hdr, payload in pkts[4:]:
        mixer.ingest(hdr, payload, fmt)
        out.append(mixer.next_block())
    for _ in range(12):
        out.append(mixer.next_block())
    mix = np.concatenate(out, axis=0)
    a = mix[mix.shape[0] // 4 :, 0].astype(np.float64)
    A = np.abs(np.fft.rfft(a * np.hanning(a.size)))
    f = np.fft.rfftfreq(a.size, 1 / FS_OUT)
    assert abs(f[np.argmax(A)] - 440.0) < 4
    assert mixer.sessions[9].drops >= 3


def test_slew_direction():
    """Clock tracker sign: a too-deep queue must LOWER the ratio (consume
    the backlog), a draining queue must RAISE it (review finding)."""
    s = PlayoutSession(1, FS_IN, 1, Encoding.S16BE, FS_OUT)
    payload = encode_samples(np.zeros(PKT, np.float32), Encoding.S16BE)
    # shallow queue: first packet lands target_latency ahead; depth ~0.12s
    s.ingest(RtpHeader(type=122, seq=0, timestamp=0, ssrc=1), payload, 0)
    # fake a deep queue and ingest again
    s._max_written += int(0.5 * FS_OUT)
    s.ingest(RtpHeader(type=122, seq=1, timestamp=PKT, ssrc=1), payload, 0)
    assert s.ratio < s.nominal  # deep -> slow down placement

    # shallow: the play head nearly caught up with the written frames
    s2 = PlayoutSession(2, FS_IN, 1, Encoding.S16BE, FS_OUT)
    s2.ingest(RtpHeader(type=122, seq=0, timestamp=0, ssrc=2), payload, 0)
    head = s2._max_written - int(0.02 * FS_OUT)
    s2.ingest(RtpHeader(type=122, seq=1, timestamp=PKT, ssrc=2), payload, head)
    assert s2.ratio > s2.nominal  # shallow -> stretch


def test_persistently_late_sender_rebases():
    """A sender whose stream lags the play head (slow source, mid-burst
    join) must rebase after a late run instead of discarding forever."""
    mixer = Mixer(FS_OUT, int(FS_OUT * 0.02))
    fmt = (FS_IN, 1, Encoding.S16BE)
    pkts = _packets(seconds=3.0)
    # establish the stream, then let the play head run far ahead
    for hdr, payload in pkts[:2]:
        mixer.ingest(hdr, payload, fmt)
    for _ in range(60):  # 1.2 s of playout vs 40 ms of stream
        mixer.next_block()
    sent = 0
    for hdr, payload in pkts[2:60]:
        mixer.ingest(hdr, payload, fmt)
        sent += 1
    s = mixer.sessions[7]
    assert s.resets >= 1  # rebase kicked in
    # after the rebase, fresh packets land and play again
    out = []
    for hdr, payload in pkts[60:100]:
        mixer.ingest(hdr, payload, fmt)
        out.append(mixer.next_block())
    mix = np.concatenate(out, axis=0)
    assert np.abs(mix).max() > 0.05  # audio flowing again


def test_monitor_session_renderer():
    """The monitor TUI's table renderer is pure over mixer state."""
    from ka9q_radio_tpu.cli.monitor import render_sessions

    mixer = Mixer(FS_OUT, int(FS_OUT * 0.02))
    _run(mixer, _packets(seconds=1.0))
    mixer.sessions[7].gain = 0.0  # muted
    lines = render_sessions(mixer, {7: 23.0}, selected=0)
    assert any("7" in ln and "MUTE" in ln for ln in lines)
    assert any("23" in ln for ln in lines)
    assert lines[0].startswith(" ") and "ssrc" in lines[0]


def test_playout_robust_to_hostile_rtp():
    """Playout sessions face an open UDP port: random headers (huge
    timestamp jumps, bogus payload sizes, wild sequence numbers) must
    neither crash nor blow up the ring accounting."""
    import numpy as np

    from ka9q_radio_tpu.net.playout import PlayoutSession
    from ka9q_radio_tpu.net.rtp import RtpHeader

    from ka9q_radio_tpu.net.rtp import Encoding, encode_samples

    rng = np.random.default_rng(11)
    sp = PlayoutSession(1, 12_000, 1, Encoding.S16BE, 48_000)
    head = 0
    for k in range(300):
        hdr = RtpHeader(type=122, seq=int(rng.integers(0, 1 << 16)),
                        timestamp=int(rng.integers(0, 1 << 32)),
                        ssrc=1, marker=bool(rng.integers(0, 2)))
        n = int(rng.integers(0, 700))
        payload = encode_samples(
            (rng.integers(-500, 500, n) / 32768.0).astype(np.float32), Encoding.S16BE)
        try:
            sp.ingest(hdr, payload, head)
        except Exception as e:
            raise AssertionError(f"playout crashed on packet {k}: {e}")
        out = sp.pull(head, 960)
        assert out is None or (out.shape[0] == 960 and np.isfinite(out).all())
        head += 960
