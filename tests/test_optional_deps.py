"""Declared optional-dependency surface (pyproject extras): features
backed by scipy / system libopus degrade gracefully instead of raising
runtime exceptions mid-stream."""
import sys

import numpy as np

from ka9q_radio_tpu.config.loader import load_config
from ka9q_radio_tpu.runtime.radiod import Radiod
from ka9q_radio_tpu.net.rtp import Encoding
from ka9q_radio_tpu.net.status import StatusType as T, encode_status

CONF = """
[global]
hardware = gen
status = 127.0.0.1
data = 127.0.0.1

[gen]
device = sig_gen
samprate = 1m024
complex = yes
carrier = 100k
amplitude = -20
noise = -80

[usb]
demod = linear
samprate = 12k
low = 50
high = 3k
freq = 100k
"""


def test_notch_available_reflects_scipy(monkeypatch):
    from ka9q_radio_tpu.cli import monitor

    assert monitor.notch_available()  # scipy is in this image
    monkeypatch.setitem(sys.modules, "scipy.signal", None)
    monkeypatch.setitem(sys.modules, "scipy", None)
    assert not monitor.notch_available()


def test_opus_encoding_rejected_without_libopus(monkeypatch, capsys):
    rd = Radiod(load_config(CONF), use_network=False)
    ch = next(iter(rd.chans.values()))
    import ka9q_radio_tpu.net.opus as opus_mod
    import ka9q_radio_tpu.native as native_mod

    monkeypatch.setattr(opus_mod, "available", lambda: False)
    monkeypatch.setattr(native_mod, "native_has_opus", lambda: False, raising=False)
    rd.handle_packet(encode_status(
        {T.OUTPUT_SSRC: ch.ssrc, T.OUTPUT_ENCODING: int(Encoding.OPUS)}, cmd=True))
    assert ch.encoding != Encoding.OPUS  # rejected, channel keeps working
    assert "Opus encoding rejected" in capsys.readouterr().err
    out = rd.step_block()
    assert np.all(np.isfinite(np.asarray(out["usb"]["audio"])))


def test_opus_encoding_accepted_with_libopus():
    from ka9q_radio_tpu.net.opus import available
    from ka9q_radio_tpu.native import native_has_opus

    if not (available() or native_has_opus()):
        import pytest

        pytest.skip("no libopus in this image")
    rd = Radiod(load_config(CONF), use_network=False)
    ch = next(iter(rd.chans.values()))
    rd.handle_packet(encode_status(
        {T.OUTPUT_SSRC: ch.ssrc, T.OUTPUT_ENCODING: int(Encoding.OPUS)}, cmd=True))
    # 12 kHz is a legal Opus rate, so the encoding flips directly
    assert ch.encoding == Encoding.OPUS


def test_monitor_device_output(tmp_path, monkeypatch):
    """--device pipes the mix into a system player (aplay et al.); with a
    stub player on PATH the PCM bytes arrive intact."""
    import os
    import stat

    sink = tmp_path / "pcm.raw"
    stub = tmp_path / "aplay"
    stub.write_text(f"#!/bin/sh\ncat > {sink}\n")
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{tmp_path}:{os.environ['PATH']}")

    from ka9q_radio_tpu.cli.monitor import _open_audio_device

    dac = _open_audio_device("default", 48_000)
    assert dac is not None
    pcm = (np.arange(960, dtype="<i2")).tobytes()
    dac.stdin.write(pcm)
    dac.stdin.close()
    dac.wait(timeout=5)
    assert sink.read_bytes() == pcm


def test_monitor_device_absent(tmp_path, monkeypatch):
    monkeypatch.setenv("PATH", str(tmp_path))  # nothing on PATH
    from ka9q_radio_tpu.cli.monitor import _open_audio_device

    assert _open_audio_device("default", 48_000) is None
