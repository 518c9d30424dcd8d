"""RDS (Radio Data System) decoder — the rdsd.c daemon's core.

Input: the 57 kHz subcarrier derotated to baseband by the WFM demodulator's
cubed-pilot reference (models/wfm.py emits `rds_baseband` at 48 kHz). Here:
biphase matched filter -> symbol timing search -> differential decode ->
26-bit block sync via the RDS (341,26) shortened cyclic code syndromes ->
group assembly (PI, PTY, PS name from 0A/0B, RadioText from 2A/2B).

Also includes an encoder (checkword generation + biphase modulator) used
by the tests and usable as an RDS generator.
"""
from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["RDS_BAUD", "OFFSETS", "rds_checkword", "encode_group", "rds_modulate",
           "RdsDecoder", "RdsStation"]

RDS_BAUD = 1187.5
_G = 0x5B9  # g(x) = x^10+x^8+x^7+x^5+x^4+x^3+1

OFFSETS = {"A": 0x0FC, "B": 0x198, "C": 0x168, "C'": 0x350, "D": 0x1B4}
_OFFSET_SEQ = ["A", "B", "C", "D"]  # C' substitutes for C in B-version groups


def _poly_mod(v: int, nbits: int) -> int:
    """v(x) * x^10 mod g(x) over GF(2), v is nbits wide."""
    r = v << 10
    for i in range(nbits + 10 - 1, 9, -1):
        if r & (1 << i):
            r ^= _G << (i - 10)
    return r & 0x3FF


def rds_checkword(info: int, offset: str) -> int:
    return _poly_mod(info & 0xFFFF, 16) ^ OFFSETS[offset]


def _block(info: int, offset: str) -> int:
    return ((info & 0xFFFF) << 10) | rds_checkword(info, offset)


def encode_group(a: int, b: int, c: int, d: int) -> list[int]:
    """Four info words -> 104 bits (as ints 0/1), offsets A B C|C' D."""
    coff = "C'" if (b >> 11) & 1 else "C"
    bits = []
    for info, off in zip((a, b, c, d), ("A", "B", coff, "D")):
        blk = _block(info, off)
        bits.extend((blk >> (25 - i)) & 1 for i in range(26))
    return bits


def rds_modulate(groups: list[tuple[int, int, int, int]], fs: float = 48_000.0,
                 amplitude: float = 1.0) -> np.ndarray:
    """Groups -> baseband biphase waveform (pre-57 kHz-mixing).

    Differential encode then biphase: each data bit spans one symbol period
    split into +/- half-symbols (bit sense from the differential decoder's
    XOR, so absolute polarity is irrelevant).
    """
    bits: list[int] = []
    for g in groups:
        bits.extend(encode_group(*g))
    e = 0
    enc = []
    for d in bits:
        e ^= d
        enc.append(e)
    sps = fs / RDS_BAUD
    total = int(round(len(enc) * sps))
    t = np.arange(total)
    sym = np.minimum((t / sps).astype(int), len(enc) - 1)
    frac = t / sps - sym
    half = np.where(frac < 0.5, 1.0, -1.0)
    lvl = np.where(np.asarray(enc)[sym] == 1, 1.0, -1.0)
    # soften edges with a raised-cosine-ish window per half symbol
    shape = np.sin(np.pi * np.where(frac < 0.5, frac * 2, (frac - 0.5) * 2))
    return (amplitude * lvl * half * shape).astype(np.float32)


@dataclasses.dataclass
class RdsStation:
    pi: int = 0
    pty: int = 0
    ps: list = dataclasses.field(default_factory=lambda: [" "] * 8)
    rt: list = dataclasses.field(default_factory=lambda: [" "] * 64)
    groups: int = 0
    block_errors: int = 0

    @property
    def ps_name(self) -> str:
        return "".join(self.ps)

    @property
    def radiotext(self) -> str:
        return "".join(self.rt).rstrip()


class RdsDecoder:
    """Streaming decoder: feed 48 kHz rds_baseband blocks, read .station."""

    def __init__(self, fs: float = 48_000.0):
        self.fs = fs
        self.sps = fs / RDS_BAUD
        self._buf = np.zeros(0, np.float32)
        self._bits: list[int] = []
        self._prev_soft = 0.0
        self._bitbuf = 0
        self._nbits = 0
        self._synced = False
        self._blocks: list[int] = []  # info words since sync
        self._expected = 0  # index into offset sequence
        self.station = RdsStation()

    # -- symbol layer -------------------------------------------------------
    def _demod_symbols(self, x: np.ndarray) -> list[float]:
        """Half-symbol difference matched filter + per-chunk timing search."""
        sps = self.sps
        n_sym = int(x.size // sps) - 2
        if n_sym < 8:
            return []
        # search timing offset maximizing sum |soft|
        best, best_tau = None, 0.0
        half = sps / 2
        cs = np.concatenate([[0.0], np.cumsum(x)])  # shared by all tau
        sym_idx = np.arange(n_sym) * sps
        for tau in np.linspace(0, sps, 20, endpoint=False):
            # half-symbol sums via the cumulative sum
            h1s = (sym_idx + tau).astype(int)
            h2s = (sym_idx + tau + half).astype(int)
            h3s = (sym_idx + tau + 2 * half).astype(int)
            s1 = cs[np.minimum(h2s, x.size)] - cs[np.minimum(h1s, x.size)]
            s2 = cs[np.minimum(h3s, x.size)] - cs[np.minimum(h2s, x.size)]
            soft = s1 - s2
            score = float(np.sum(np.abs(soft)))
            if best is None or score > best:
                best, best_tau, best_soft = score, tau, soft
        return list(best_soft)

    def feed(self, baseband: np.ndarray):
        self._buf = np.concatenate([self._buf, np.asarray(baseband, np.float32)])
        # process in ~1/4 s chunks (≈300 symbols): enough statistics for the
        # timing search, short enough for low decode latency
        chunk = int(self.fs) // 4
        while self._buf.size >= chunk + int(2 * self.sps):
            x = self._buf[:chunk]
            n_sym = int(x.size // self.sps) - 2
            # consume a whole number of symbols to keep chunks roughly
            # symbol-aligned (each chunk re-searches its own timing)
            self._buf = self._buf[int(round(max(n_sym, 0) * self.sps)) or chunk :]
            for soft in self._demod_symbols(x):
                bit = 1 if (soft > 0) != (self._prev_soft > 0) else 0  # differential
                self._prev_soft = soft
                self._push_bit(bit)
        return self.station

    # -- block layer --------------------------------------------------------
    def _push_bit(self, bit: int):
        self._bitbuf = ((self._bitbuf << 1) | bit) & ((1 << 26) - 1)
        self._nbits += 1
        if not self._synced:
            if self._nbits >= 26:
                off = self._match(self._bitbuf)
                if off == "A":
                    self._accept("A", self._bitbuf >> 10)
                    self._synced = True
                    self._nbits = 0
            return
        if self._nbits == 26:
            self._nbits = 0
            want = _OFFSET_SEQ[self._expected]
            off = self._match(self._bitbuf)
            if off == want or (want == "C" and off == "C'"):
                self._accept(off, self._bitbuf >> 10)
            else:
                self.station.block_errors += 1
                self._synced = False
                self._blocks = []
                self._expected = 0
                self._nbits = 26  # keep hunting bit-by-bit

    @staticmethod
    def _match(word: int):
        info, chk = word >> 10, word & 0x3FF
        syn = _poly_mod(info, 16) ^ chk
        for name, off in OFFSETS.items():
            if syn == off:
                return name
        return None

    def _accept(self, off: str, info: int):
        if off == "A":
            self._blocks = [info]
            self._expected = 1
            return
        self._blocks.append(info)
        self._expected += 1
        if self._expected == 4:
            self._group(self._blocks)
            self._expected = 0
            self._blocks = []

    def _group(self, blocks: list[int]):
        a, b, c, d = blocks
        st = self.station
        st.pi = a
        st.pty = (b >> 5) & 0x1F
        gtype = b >> 12
        st.groups += 1
        if gtype == 0:  # 0A/0B: PS name, 2 chars per segment
            seg = b & 0x3
            st.ps[2 * seg] = chr((d >> 8) & 0x7F)
            st.ps[2 * seg + 1] = chr(d & 0x7F)
        elif gtype == 2:  # 2A: RadioText, 4 chars per segment
            seg = b & 0xF
            if (b >> 11) & 1:  # 2B: 2 chars from D
                st.rt[2 * seg] = chr((d >> 8) & 0x7F)
                st.rt[2 * seg + 1] = chr(d & 0x7F)
            else:
                st.rt[4 * seg] = chr((c >> 8) & 0x7F)
                st.rt[4 * seg + 1] = chr(c & 0x7F)
                st.rt[4 * seg + 2] = chr((d >> 8) & 0x7F)
                st.rt[4 * seg + 3] = chr(d & 0x7F)
