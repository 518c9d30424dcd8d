"""Deterministic WFM stereo composite scene, shared by the golden capture
(reference radiod via the file.so plugin front end) and
tests/test_reference_parity.py (our radiod via `device = file`) — the SAME
float32 I/Q file drives both daemons, so demodulated audio must match.

The reference's own sig_gen cannot FM-modulate (sig_gen.c:291 "FM to be
implemented"), hence file playback. Scene (all pure tones, no RNG):

  t in [0, 3) s   STEREO: pilot (19 kHz, 10%) + L-R DSB at 38 kHz
                  L = 700 Hz, R = 1100 Hz tones
  t in [3, 6) s   MONO: pilot and subcarrier gated off (smooth 20 ms ramps)
                  -> receivers must fall back to mono (wfm.c:211-226 pilot
                  detector), audio becomes (L+R)/2 in both channels

File loops seamlessly: every tone is integer-Hz (periodic in 1 s), the
gate is 6 s-periodic, and a tiny constant frequency correction (< 0.2 Hz)
zeroes the accumulated FM phase across the wrap.
"""
from __future__ import annotations

import numpy as np

FS = 768_000  # virtual A/D rate, complex
SECONDS = 6
IF_HZ = 100_000.0  # composite carrier offset from the front-end center
CENTER_HZ = 100.0e6  # front-end `frequency =` (so the station is 100.1 MHz)
AMPLITUDE = 0.1  # -20 dBFS carrier
DEVIATION = 75_000.0
F_L, F_R, F_PILOT = 700.0, 1100.0, 19_000.0
STEREO_SECONDS = 3.0  # pilot gated off after this
RAMP = 0.020  # gate ramp, s


def _gate(t: np.ndarray) -> np.ndarray:
    """1 during the stereo segment, 0 during mono, raised-cosine ramps,
    periodic over SECONDS (off at both file edges -> seamless loop)."""

    def edge(x):  # 0 -> 1 over [0, RAMP]
        x = np.clip(x / RAMP, 0.0, 1.0)
        return 0.5 - 0.5 * np.cos(np.pi * x)

    return edge(t) * (1.0 - edge(t - (STEREO_SECONDS - RAMP)))


def composite_mux(t: np.ndarray) -> np.ndarray:
    """The baseband multiplex m(t), |m| <= 1 (88-108 MHz broadcast form).

    Pilot and 38 kHz subcarrier are SINES (the broadcast phase standard:
    the subcarrier is in phase with the frequency-doubled pilot) — the
    receiver regenerates the subcarrier by squaring the pilot phasor and
    demodulates L-R from its quadrature (wfm.c:246-248), so a cosine
    subcarrier would null the stereo difference entirely."""
    L = np.cos(2 * np.pi * F_L * t)
    R = np.cos(2 * np.pi * F_R * t)
    g = _gate(t)
    mono = 0.5 * (L + R)
    sub = 0.5 * (L - R) * np.sin(2 * np.pi * 2 * F_PILOT * t)
    pilot = 0.1 * np.sin(2 * np.pi * F_PILOT * t)
    return 0.9 * (mono + g * sub) + g * pilot


def write_composite(path: str) -> str:
    n = FS * SECONDS
    t = np.arange(n, dtype=np.float64) / FS
    m = composite_mux(t)
    phase = (2 * np.pi * DEVIATION / FS) * np.cumsum(m)
    # force loop continuity: cancel the residual phase with a constant
    # frequency offset (phase_end spread over the file; well under 1 Hz)
    wrap = phase[-1] + (2 * np.pi * DEVIATION / FS) * m[0]
    phase -= wrap * (np.arange(n, dtype=np.float64) + 1) / n
    iq = AMPLITUDE * np.exp(1j * (phase + 2 * np.pi * IF_HZ * t))
    buf = np.empty(2 * n, np.float32)
    buf[0::2] = iq.real.astype(np.float32)
    buf[1::2] = iq.imag.astype(np.float32)
    buf.tofile(path)
    return path


CONF = """
[global]
hardware = rf
status = {stat}
data = {data}
update = 10
ttl = 1
advertise = no

[rf]
device = file
path = {path}
samprate = 768k
format = cf32le
loop = yes
frequency = 100m

[stations]
mode = wfm
freq = 100m100
stereo = yes
"""

SSRC = 100100  # default ssrc = kHz of freq (radio.c:936)
