"""Morse code audio generation (morse.c / cwd.c) — used for repeater IDs.

Timing follows the reference: dit = 1.2/wpm seconds, dah = 3 dits,
intra-element gap 1 dit, inter-letter 3 dits, inter-word 7 dits; keying is
shaped with a raised-cosine edge to limit key clicks.
"""
from __future__ import annotations

import numpy as np

__all__ = ["MORSE", "text_to_elements", "morse_audio"]

MORSE = {
    "a": ".-", "b": "-...", "c": "-.-.", "d": "-..", "e": ".", "f": "..-.",
    "g": "--.", "h": "....", "i": "..", "j": ".---", "k": "-.-", "l": ".-..",
    "m": "--", "n": "-.", "o": "---", "p": ".--.", "q": "--.-", "r": ".-.",
    "s": "...", "t": "-", "u": "..-", "v": "...-", "w": ".--", "x": "-..-",
    "y": "-.--", "z": "--..",
    "0": "-----", "1": ".----", "2": "..---", "3": "...--", "4": "....-",
    "5": ".....", "6": "-....", "7": "--...", "8": "---..", "9": "----.",
    ".": ".-.-.-", ",": "--..--", "?": "..--..", "/": "-..-.", "-": "-....-",
    "=": "-...-", "+": ".-.-.", "@": ".--.-.", "(": "-.--.", ")": "-.--.-",
    "'": ".----.", '"': ".-..-.", ":": "---...", ";": "-.-.-.",
    "&": ".-...", "!": "-.-.--", "$": "...-..-", "_": "..--.-",
}


def text_to_elements(text: str) -> list[tuple[bool, int]]:
    """(key_down, duration_in_dits) list for a text string."""
    out: list[tuple[bool, int]] = []
    first_in_word = True
    for ch in text.lower():
        if ch.isspace():
            out.append((False, 7))
            first_in_word = True
            continue
        code = MORSE.get(ch)
        if code is None:
            continue
        if not first_in_word:
            out.append((False, 3))
        first_in_word = False
        for i, sym in enumerate(code):
            if i:
                out.append((False, 1))
            out.append((True, 3 if sym == "-" else 1))
    return out


def morse_audio(text: str, fs: float = 48_000.0, wpm: float = 20.0,
                tone_hz: float = 600.0, amplitude: float = 0.5,
                edge_ms: float = 5.0) -> np.ndarray:
    """Render text to keyed-CW float32 audio."""
    dit = 1.2 / wpm
    dit_n = int(round(dit * fs))
    edge_n = min(int(edge_ms * 1e-3 * fs), dit_n // 2)
    ramp = 0.5 * (1 - np.cos(np.pi * np.arange(edge_n) / max(edge_n, 1)))

    envs = []
    for key, dits in text_to_elements(text):
        n = dits * dit_n
        if key:
            e = np.ones(n)
            e[:edge_n] = ramp
            e[n - edge_n :] = ramp[::-1]
        else:
            e = np.zeros(n)
        envs.append(e)
    if not envs:
        return np.zeros(0, np.float32)
    env = np.concatenate(envs + [np.zeros(3 * dit_n)])
    t = np.arange(env.size) / fs
    return (amplitude * env * np.sin(2 * np.pi * tone_hz * t)).astype(np.float32)
