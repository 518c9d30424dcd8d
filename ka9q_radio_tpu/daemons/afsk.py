"""Bell-202 AFSK demodulation + HDLC deframing (packetd.c).

1200 baud FSK: mark 1200 Hz, space 2200 Hz, NRZI (transition = 0). The
demodulator is the classic dual-tone quadrature correlator: complex mixing
with each tone, single-symbol integrate, compare magnitudes; then a
digital PLL recovers bit timing and HDLC hunts for 0x7E flags, un-stuffs
bits and checks CRC-CCITT.
"""
from __future__ import annotations

import numpy as np

__all__ = ["afsk_demod", "hdlc_deframe", "crc_ccitt", "AfskDecoder",
           "MARK_HZ", "SPACE_HZ", "BAUD"]

MARK_HZ = 1200.0
SPACE_HZ = 2200.0
BAUD = 1200.0


def _tone_mag(x: np.ndarray, freq: float, fs: float, nsym: int) -> np.ndarray:
    """Envelope of x correlated against a tone over a sliding symbol window."""
    n = np.arange(x.size)
    lo = x * np.exp(-2j * np.pi * freq * n / fs)
    kern = np.ones(nsym) / nsym
    return np.abs(np.convolve(lo, kern, mode="same"))


def afsk_demod(audio: np.ndarray, fs: float) -> np.ndarray:
    """Audio -> soft mark/space decision per sample (>0 = mark)."""
    nsym = max(int(round(fs / BAUD)), 1)
    return _tone_mag(audio, MARK_HZ, fs, nsym) - _tone_mag(audio, SPACE_HZ, fs, nsym)


class _Dpll:
    """Bit-clock recovery: re-center the sampling phase at mid-bit on every
    zero crossing; streaming across blocks."""

    def __init__(self, fs: float):
        self.sps = fs / BAUD
        self.phase = 0.0
        self.last = False

    def feed(self, soft: np.ndarray) -> list[int]:
        bits: list[int] = []
        phase, last, sps = self.phase, self.last, self.sps
        for v in soft:
            cur = v > 0
            phase += 1.0
            if cur != last:
                phase = 0.5 * sps
                last = cur
            if phase >= sps:
                phase -= sps
                bits.append(1 if cur else 0)
        self.phase, self.last = phase, last
        return bits


def crc_ccitt(data: bytes) -> int:
    """CRC-CCITT (X.25/HDLC FCS), reflected, init 0xFFFF, xorout 0xFFFF."""
    crc = 0xFFFF
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = (crc >> 1) ^ 0x8408 if crc & 1 else crc >> 1
    return crc ^ 0xFFFF


class HdlcDeframer:
    """Streaming NRZI decode + flag hunt + bit unstuff + FCS check."""

    MAX_FRAME_BITS = 4096 * 8

    def __init__(self):
        self.prev_level: int | None = None
        self.ones = 0
        self.cur: list[int] = []
        self.in_frame = False
        self.pending_flag = False  # saw 6 ones, awaiting the closing 0

    def feed(self, nrzi_bits) -> list[bytes]:
        frames: list[bytes] = []
        for lvl in nrzi_bits:
            if self.prev_level is None:
                self.prev_level = lvl
                continue
            b = 1 if lvl == self.prev_level else 0  # NRZI: transition = 0
            self.prev_level = lvl

            if self.pending_flag:
                self.pending_flag = False
                if b == 0:  # 01111110 flag: close any frame, open a new one
                    payload = self.cur[:-7]
                    if self.in_frame and len(payload) >= 8 * 3 and len(payload) % 8 == 0:
                        data = bytes(
                            sum(payload[k * 8 + j] << j for j in range(8))
                            for k in range(len(payload) // 8)
                        )
                        if len(data) > 2 and crc_ccitt(data[:-2]) == data[-2] | (data[-1] << 8):
                            frames.append(data[:-2])
                    self.in_frame = True
                    self.cur = []
                    self.ones = 0
                    continue
                # 7+ ones: abort
                self.in_frame = False
                self.cur = []
                self.ones = 0
                continue

            if b == 1:
                self.ones += 1
                self.cur.append(1)
                if self.ones == 6:
                    self.pending_flag = True
                if len(self.cur) > self.MAX_FRAME_BITS:
                    self.in_frame = False
                    self.cur = []
            else:
                if self.ones == 5:
                    self.ones = 0  # stuffed bit
                    continue
                self.ones = 0
                self.cur.append(0)
        return frames


def hdlc_deframe(nrzi_bits) -> list[bytes]:
    """One-shot convenience over HdlcDeframer."""
    return HdlcDeframer().feed(nrzi_bits)


class AfskDecoder:
    """Streaming AFSK+HDLC decoder.

    The correlator is evaluated only where it has a full symbol of context;
    an `nsym`-sample audio tail makes consecutive calls produce a gapless,
    overlap-free soft-decision stream feeding a persistent DPLL and HDLC
    deframer — a frame may straddle any number of RTP-sized chunks.
    """

    def __init__(self, fs: float):
        self.fs = fs
        self.nsym = max(int(round(fs / BAUD)), 1)
        self._tail = np.zeros(self.nsym, np.float32)
        self._dpll = _Dpll(fs)
        self._hdlc = HdlcDeframer()

    def feed(self, audio: np.ndarray) -> list[bytes]:
        new = np.asarray(audio, np.float32)
        if new.size == 0:
            return []
        x = np.concatenate([self._tail, new])
        half = self.nsym // 2
        soft = afsk_demod(x, self.fs)[half : x.size - (self.nsym - half)]
        self._tail = x[-self.nsym :]
        return self._hdlc.feed(self._dpll.feed(soft))
