"""Morse generator, CTCSS bank, APRS decode."""
import numpy as np
import pytest

from ka9q_radio_tpu.daemons.morse import morse_audio, text_to_elements, MORSE
from ka9q_radio_tpu.daemons.ctcss import GoertzelBank, detect_tone, PL_TONES
from ka9q_radio_tpu.daemons.aprs import decode_aprs, tnc2_format
from ka9q_radio_tpu.daemons.ax25 import Ax25Address, Ax25Frame


def test_morse_timing():
    els = text_to_elements("e t")  # dit | word gap | dah
    assert els == [(True, 1), (False, 7), (True, 3)]
    els = text_to_elements("an")
    # a = .-, gap 3, n = -.
    assert els == [(True, 1), (False, 1), (True, 3), (False, 3), (True, 3), (False, 1), (True, 1)]


def test_morse_audio_decodeable():
    fs, wpm = 24_000.0, 25.0
    audio = morse_audio("paris", fs, wpm, 700.0)
    # standard word "paris" at w wpm lasts 60/wpm seconds (incl. word gap)
    dit = 1.2 / wpm
    assert abs(audio.size / fs - (50 - 7 + 3) * dit) < 0.05  # no trailing word gap; +3 dit pad
    # envelope on/off ratio sanity: energy present only in keyed segments
    env = np.abs(audio)
    assert env.max() > 0.4
    spec = np.abs(np.fft.rfft(audio))
    f = np.fft.rfftfreq(audio.size, 1 / fs)
    assert abs(f[np.argmax(spec)] - 700.0) < 10


@pytest.mark.parametrize("tone", [67.0, 103.5, 250.3])
def test_ctcss_detection(tone):
    fs = 24_000.0
    t = np.arange(int(fs * 0.5)) / fs
    rng = np.random.default_rng(0)
    x = 0.15 * np.sin(2 * np.pi * tone * t) + 0.3 * np.sin(2 * np.pi * 1100 * t) \
        + 0.05 * rng.standard_normal(t.size)
    got = detect_tone(x.astype(np.float32), fs)
    assert got is not None and abs(got - tone) < 1.0


def test_ctcss_streaming_bank():
    fs = 16_000.0
    bank = GoertzelBank(fs)
    t = np.arange(int(fs * 0.30)) / fs
    x = (0.2 * np.sin(2 * np.pi * 123.0 * t)).astype(np.float32)
    results = []
    for i in range(0, x.size, 320):
        r = bank.feed(x[i : i + 320])
        if r:
            results.append(r)
    assert results
    tone, snr = results[0]
    assert abs(tone - 123.0) < 1.0 and snr > 12.0


def test_ctcss_no_false_positive():
    fs = 16_000.0
    rng = np.random.default_rng(2)
    x = (0.2 * rng.standard_normal(int(fs * 0.3))).astype(np.float32)
    assert detect_tone(x, fs) is None


def test_aprs_position_plain():
    rep = decode_aprs(b"!4903.50N/07201.75W-Test comment")
    assert rep.kind == "position"
    assert abs(rep.lat - (49 + 3.5 / 60)) < 1e-6
    assert abs(rep.lon - (-(72 + 1.75 / 60))) < 1e-6
    assert rep.symbol == "/-"
    assert rep.comment == "Test comment"


def test_aprs_status_and_tnc2():
    rep = decode_aprs(b">Mobile in motion")
    assert rep.kind == "status" and rep.text == "Mobile in motion"
    f = Ax25Frame(Ax25Address("APRS"), Ax25Address("KA9Q", 9),
                  [Ax25Address("WIDE2", 1)], 0x03, 0xF0, b"!4903.50N/07201.75W-")
    assert tnc2_format(f) == "KA9Q-9>APRS,WIDE2-1:!4903.50N/07201.75W-"
