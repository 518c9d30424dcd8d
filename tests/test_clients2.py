"""Loopback tests for repeater, aprsfeed (dry-run), pcmspawn, opussend."""
import os
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

from ka9q_radio_tpu.net.rtp import RtpHeader, Encoding, encode_samples, decode_samples
from ka9q_radio_tpu.net.multicast import make_maddr, resolve_dest, listen_socket, output_socket

UNIQ = os.getpid()

# Subprocess clients don't need jax; skip the axon sitecustomize TPU-tunnel
# registration (it can take many seconds per interpreter start).
SUBENV = {**os.environ, "PALLAS_AXON_POOL_IPS": ""}


def _send_tone(dest_name, ssrc=5, seconds=1.0, fs=24_000, pt=11, freq=600.0):
    tx = output_socket(resolve_dest(dest_name, 5004))
    t = np.arange(int(fs * seconds)) / fs
    audio = (0.4 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    seq = ts = 0
    for off in range(0, audio.size, 480):
        chunk = audio[off : off + 480]
        tx.send(RtpHeader(type=pt, seq=seq, timestamp=ts, ssrc=ssrc).pack()
                + encode_samples(chunk, Encoding.S16BE))
        seq += 1
        ts += chunk.size
        time.sleep(0.0005)
    tx.close()


def test_repeater_relays_and_ids():
    from ka9q_radio_tpu.cli.repeater import main as repeater_main
    import threading

    inp, out = f"rptin-{UNIQ}.local", f"rptout-{UNIQ}.local"
    rx = listen_socket(resolve_dest(out, 5004))
    th = threading.Thread(
        target=repeater_main,
        args=([ "--input", inp, "--output", out, "--id", "TEST", "--id-interval", "3600",
                "--samprate", "44100", "--duration", "4"],),
        daemon=True,
    )
    th.start()
    time.sleep(0.5)
    _send_tone(inp, seconds=1.0, fs=44_100)
    pkts = []
    import select as sel
    t_end = time.monotonic() + 3
    while time.monotonic() < t_end:
        r, _, _ = sel.select([rx], [], [], 0.2)
        if r:
            pkts.append(rx.recvfrom(65536)[0])
    th.join(timeout=6)
    assert pkts, "repeater emitted nothing"
    # first output is the Morse ID (keyed at startup), later the relay
    total = b"".join(RtpHeader.unpack(p)[1] for p in pkts)
    audio = decode_samples(total, Encoding.S16BE)
    assert audio.size > 10_000
    assert np.abs(audio).max() > 0.1


def test_aprsfeed_dry_run_gates_frames():
    from ka9q_radio_tpu.daemons.ax25 import Ax25Address, build_ui_frame, afsk_modulate
    from ka9q_radio_tpu.cli.aprsfeed import aprs_passcode

    assert 0 <= aprs_passcode("N0CALL") < 0x8000

    stream = f"aprsin-{UNIQ}.local"
    frame = build_ui_frame(Ax25Address("KA9Q", 1), Ax25Address("APRS"), b">gateway test")
    audio = afsk_modulate(frame, 44_100.0)
    p = subprocess.Popen(
        [sys.executable, "-m", "ka9q_radio_tpu.cli.aprsfeed", "--data", stream,
         "--callsign", "N0CALL", "--dry-run", "--duration", "14"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=SUBENV,
    )
    tx = output_socket(resolve_dest(stream, 5004))
    seq = ts = 0
    padded = np.concatenate([np.zeros(2000, np.float32), audio, np.zeros(2000, np.float32)])
    # resend until the subprocess has surely joined (interpreter start +
    # multicast join can take seconds under load; sends before the join
    # are silently lost)
    deadline = time.monotonic() + 12
    while time.monotonic() < deadline and p.poll() is None:
        for off in range(0, padded.size, 480):
            chunk = padded[off : off + 480]
            tx.send(RtpHeader(type=11, seq=seq, timestamp=ts, ssrc=9).pack()
                    + encode_samples(chunk, Encoding.S16BE))
            seq += 1
            ts += chunk.size
            time.sleep(0.0005)
        time.sleep(1.0)
    out, err = p.communicate(timeout=20)
    assert "KA9Q-1>APRS" in out, (out, err)
    assert ">gateway test" in out


def test_pcmspawn_pipes_audio(tmp_path):
    stream = f"spawn-{UNIQ}.local"
    p = subprocess.Popen(
        [sys.executable, "-m", "ka9q_radio_tpu.cli.pcmspawn", "--data", stream,
         "--duration", "14", "--",
         sys.executable, "-c",
         "import sys,shutil; shutil.copyfileobj(sys.stdin.buffer, open(sys.argv[1],'wb'))",
         f"{tmp_path}/out-{{ssrc}}.raw"],
        stderr=subprocess.PIPE, text=True, env=SUBENV,
    )
    # probe until pcmspawn's session exists (slow interpreter start +
    # multicast join lose early packets), then send the real tone
    deadline = time.monotonic() + 12
    while time.monotonic() < deadline and not list(tmp_path.glob("out-*.raw")):
        _send_tone(stream, ssrc=42, seconds=0.2, fs=44_100)
        time.sleep(0.3)
    _send_tone(stream, ssrc=42, seconds=0.5, fs=44_100)
    p.wait(timeout=20)
    # the {ssrc} substitution happens in pcmspawn's command tokens
    candidates = list(tmp_path.glob("out-*.raw"))
    assert candidates, p.stderr.read() if p.stderr else "no output file"
    data = np.frombuffer(candidates[0].read_bytes(), "<i2")
    assert data.size > 5_000


def test_opussend_stream(tmp_path):
    from ka9q_radio_tpu.net.opus import available

    if not available():
        pytest.skip("no libopus")
    fs = 48_000
    t = np.arange(fs) / fs
    pcm = np.rint(0.4 * np.sin(2 * np.pi * 440 * t) * 32767).astype("<i2")
    f = tmp_path / "tone.s16"
    f.write_bytes(pcm.tobytes())
    stream = f"opustx-{UNIQ}.local"
    rx = listen_socket(resolve_dest(stream, 5004))
    rc = subprocess.run(
        [sys.executable, "-m", "ka9q_radio_tpu.cli.opussend", str(f), "--data", stream,
         "--samprate", "48k", "--flat-out"],
        capture_output=True, text=True, timeout=30, env=SUBENV,
    )
    assert rc.returncode == 0, rc.stderr
    import select as sel
    pkts = []
    while True:
        r, _, _ = sel.select([rx], [], [], 0.5)
        if not r:
            break
        pkts.append(rx.recvfrom(65536)[0])
    assert len(pkts) >= 40  # ~50 x 20 ms frames
    from ka9q_radio_tpu.net.opus import OpusDecoder
    dec = OpusDecoder(48_000, 2)
    out = np.concatenate([dec.decode(RtpHeader.unpack(p)[1]) for p in pkts[1:]])
    spec = np.abs(np.fft.rfft(out[:, 0] * np.hanning(out.shape[0])))
    fgrid = np.fft.rfftfreq(out.shape[0], 1 / 48_000)
    assert abs(fgrid[np.argmax(spec)] - 440.0) < 20


def test_stereod_decodes_composite():
    import threading
    from ka9q_radio_tpu.cli.stereod import main as stereod_main

    inp, out = f"comp-{UNIQ}.local", f"st-{UNIQ}.local"
    rx = listen_socket(resolve_dest(out, 5004))
    th = threading.Thread(target=stereod_main,
                          args=(["--input", inp, "--output", out, "--duration", "14"],),
                          daemon=True)
    th.start()
    time.sleep(0.5)

    fs = 384_000.0
    n = 20 * 7680
    t = np.arange(n) / fs
    left = np.cos(2 * np.pi * 1000.0 * t)
    comp = (0.45 * left + 0.1 * np.sin(2 * np.pi * 19_000.0 * t)
            + 0.45 * left * np.sin(2 * np.pi * 38_000.0 * t)) * 0.9
    tx = output_socket(resolve_dest(inp, 5004))
    seq = ts = 0
    for off in range(0, n, 640):
        chunk = comp[off : off + 640].astype(np.float32)
        tx.send(RtpHeader(type=96, seq=seq, timestamp=ts, ssrc=3).pack()
                + encode_samples(chunk, Encoding.S16BE))
        seq += 1
        ts += chunk.size
        time.sleep(0.0002)

    import select as sel
    pkts = []
    t_end = time.monotonic() + 12
    while time.monotonic() < t_end:
        r, _, _ = sel.select([rx], [], [], 0.3)
        if r:
            pkts.append(rx.recvfrom(65536)[0])
        elif pkts:
            break
    assert len(pkts) > 10, "stereod produced no output"
    frags = sorted((RtpHeader.unpack(p)[0].seq, RtpHeader.unpack(p)[1]) for p in pkts)
    audio = decode_samples(b"".join(pl for _, pl in frags), Encoding.S16BE).reshape(-1, 2)
    # skip warm-up, check the 1 kHz tone decodes with L dominant
    a = audio[len(audio) // 2 :]
    spec_l = np.abs(np.fft.rfft(a[:, 0] * np.hanning(a.shape[0])))
    f = np.fft.rfftfreq(a.shape[0], 1 / 48_000)
    assert abs(f[np.argmax(spec_l)] - 1000.0) < 25
    pl_ = spec_l.max()
    spec_r = np.abs(np.fft.rfft(a[:, 1] * np.hanning(a.shape[0])))
    band = (f > 950) & (f < 1050)
    assert pl_ > 10 * spec_r[band].max()  # >20 dB separation


def test_fftgen_warms_cache(tmp_path):
    conf = tmp_path / "r.conf"
    conf.write_text("""
[global]
hardware = sig_gen
[sig_gen]
device = sig_gen
samprate = 256k
real = no
carrier = 10k
amplitude = -20
[ch]
mode = usb
samprate = 16k
freq = 50k0
""")
    cache = tmp_path / "wisdom"
    rc = subprocess.run(
        [sys.executable, "-m", "ka9q_radio_tpu.cli.fftgen", str(conf), "--wisdom", str(cache)],
        capture_output=True, text=True, timeout=240, env=SUBENV,
    )
    assert rc.returncode == 0, rc.stderr
    assert "compiled master" in rc.stderr
    assert cache.exists() and any(cache.iterdir())


def test_jt_decoded_records_clip(tmp_path):
    stream = f"jt-{UNIQ}.local"
    p = subprocess.Popen(
        [sys.executable, "-m", "ka9q_radio_tpu.cli.jt_decoded", "--data", stream,
         "--mode", "ft8", "--dir", str(tmp_path), "--duration", "4"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=SUBENV,
    )
    time.sleep(3.0)  # interpreter + multicast join can race under load
    _send_tone(stream, ssrc=77, seconds=1.0, fs=44_100, freq=1500.0)
    out, err = p.communicate(timeout=20)
    wavs = list(tmp_path.glob("*_ssrc77.wav"))
    assert wavs, (out, err)
    import wave as wavmod
    with wavmod.open(str(wavs[0])) as w:
        assert w.getframerate() == 44_100
        assert w.getnframes() > 20_000
