"""CTCSS/PL tone detection over the standard tone set (ctcss.c, and the
monitor's 55-tone Goertzel bank, monitor.h:101-104)."""
from __future__ import annotations

import numpy as np

__all__ = ["PL_TONES", "GoertzelBank", "detect_tone"]

# the 55-tone list the reference's monitor scans (EIA/TIA + extras)
PL_TONES = np.array([
    67.0, 69.3, 71.9, 74.4, 77.0, 79.7, 82.5, 85.4, 88.5, 91.5,
    94.8, 97.4, 100.0, 103.5, 107.2, 110.9, 114.8, 118.8, 123.0, 127.3,
    131.8, 136.5, 141.3, 146.2, 150.0, 151.4, 156.7, 159.8, 162.2, 165.5,
    167.9, 171.3, 173.8, 177.3, 179.9, 183.5, 186.2, 189.9, 192.8, 196.6,
    199.5, 203.5, 206.5, 210.7, 218.1, 225.7, 229.1, 233.6, 241.8, 250.3,
    254.1, 256.0, 159.0, 165.0, 171.0,
], np.float64)


class GoertzelBank:
    """Streaming Goertzel over a tone set; integrate ~240 ms then decide."""

    def __init__(self, fs: float, tones=PL_TONES, integrate_s: float = 0.24):
        self.fs = fs
        self.tones = np.asarray(tones, np.float64)
        self.coeff = 2.0 * np.cos(2 * np.pi * self.tones / fs)
        self.n_target = int(round(integrate_s * fs))
        self.reset()

    def reset(self):
        self.s1 = np.zeros_like(self.tones)
        self.s2 = np.zeros_like(self.tones)
        self.energy = 0.0
        self.count = 0

    def feed(self, x: np.ndarray):
        """Returns (tone_hz, snr_db) when an integration window completes,
        else None."""
        out = None
        x = np.asarray(x, np.float64)
        for v in x:  # per-sample recurrence over the bank (vector across tones)
            s0 = v + self.coeff * self.s1 - self.s2
            self.s2 = self.s1
            self.s1 = s0
        self.energy += float(np.sum(x * x))
        self.count += x.size
        if self.count >= self.n_target:
            power = (
                self.s1 * self.s1 + self.s2 * self.s2 - self.coeff * self.s1 * self.s2
            )
            k = int(np.argmax(power))
            # detection metric: dominance of the winning tone over the
            # median of the rest of the bank (noise-only gives ~8 dB for a
            # 55-tone bank, so the default threshold sits above that)
            others = np.delete(power, k)
            med = float(np.median(others))
            snr_db = 10.0 * np.log10(max(float(power[k]), 1e-30) / max(med, 1e-30))
            out = (float(self.tones[k]), snr_db)
            self.reset()
        return out


def detect_tone(audio: np.ndarray, fs: float, min_snr_db: float = 12.0):
    """One-shot detection over a buffer; returns tone Hz or None."""
    bank = GoertzelBank(fs, integrate_s=audio.size / fs)
    r = bank.feed(audio)
    if r is None or r[1] < min_snr_db:
        return None
    return r[0]
