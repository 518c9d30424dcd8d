"""AFSK/AX.25 packet chain: modulate -> demod -> deframe -> parse."""
import numpy as np
import pytest

from ka9q_radio_tpu.daemons.afsk import AfskDecoder, crc_ccitt
from ka9q_radio_tpu.daemons.ax25 import Ax25Address, build_ui_frame, parse_frame, afsk_modulate

FS = 24_000.0


def test_crc_ccitt_known_vector():
    # X.25 FCS of "123456789" is 0x906E
    assert crc_ccitt(b"123456789") == 0x906E


def test_afsk_roundtrip_clean():
    frame = build_ui_frame(
        Ax25Address("KA9Q", 7), Ax25Address("APRS"),
        b"!4903.50N/07201.75W-Test 001234",
    )
    audio = afsk_modulate(frame, FS)
    dec = AfskDecoder(FS)
    frames = dec.feed(np.concatenate([np.zeros(1000, np.float32), audio, np.zeros(1000, np.float32)]))
    assert frames, "no frame decoded"
    f = parse_frame(frames[0])
    assert f is not None
    assert str(f.src) == "KA9Q-7"
    assert str(f.dest) == "APRS"
    assert f.info == b"!4903.50N/07201.75W-Test 001234"
    assert f.control == 0x03 and f.pid == 0xF0


def test_afsk_roundtrip_noisy_and_streamed():
    rng = np.random.default_rng(1)
    frame = build_ui_frame(Ax25Address("N0CALL", 1), Ax25Address("BEACON"), b"hello world 42")
    audio = afsk_modulate(frame, FS)
    noisy = audio + 0.2 * rng.standard_normal(audio.size).astype(np.float32)
    dec = AfskDecoder(FS)
    got = []
    # feed in 20 ms chunks like RTP delivery
    chunk = 480
    padded = np.concatenate([np.zeros(500, np.float32), noisy, np.zeros(2000, np.float32)])
    for i in range(0, padded.size, chunk):
        got += dec.feed(padded[i : i + chunk])
    assert got
    f = parse_frame(got[0])
    assert f.info == b"hello world 42"
    assert str(f.src) == "N0CALL-1"


def test_digipeater_path():
    frame = build_ui_frame(
        Ax25Address("AA1AA"), Ax25Address("APRS"),
        b">status", digis=[Ax25Address("WIDE1", 1), Ax25Address("WIDE2", 2)],
    )
    audio = afsk_modulate(frame, FS)
    frames = AfskDecoder(FS).feed(np.concatenate([audio, np.zeros(1000, np.float32)]))
    f = parse_frame(frames[0])
    assert [str(d) for d in f.digis] == ["WIDE1-1", "WIDE2-2"]
