"""AX.25 framing (ax25.c): address parse/build, UI frames, and an AFSK
modulator used both by tests and as a CW/packet beacon source."""
from __future__ import annotations

import dataclasses

import numpy as np

from .afsk import crc_ccitt, MARK_HZ, SPACE_HZ, BAUD

__all__ = ["Ax25Address", "Ax25Frame", "parse_frame", "build_ui_frame", "afsk_modulate"]


@dataclasses.dataclass
class Ax25Address:
    call: str
    ssid: int = 0

    def __str__(self):
        return f"{self.call}-{self.ssid}" if self.ssid else self.call


@dataclasses.dataclass
class Ax25Frame:
    dest: Ax25Address
    src: Ax25Address
    digis: list
    control: int
    pid: int
    info: bytes


def _decode_addr(b: bytes) -> tuple[Ax25Address, bool]:
    call = "".join(chr(x >> 1) for x in b[:6]).rstrip()
    ssid = (b[6] >> 1) & 0x0F
    last = bool(b[6] & 1)
    return Ax25Address(call, ssid), last


def _encode_addr(a: Ax25Address, last: bool = False, command: bool = False) -> bytes:
    call = a.call.ljust(6)[:6].upper()
    out = bytes((ord(c) << 1) for c in call)
    ssid = 0x60 | ((a.ssid & 0x0F) << 1) | (1 if last else 0)
    if command:
        ssid |= 0x80
    return out + bytes([ssid])


def parse_frame(data: bytes) -> Ax25Frame | None:
    """Decode an AX.25 frame (CRC already stripped by hdlc_deframe)."""
    if len(data) < 15:
        return None
    dest, _ = _decode_addr(data[0:7])
    src, last = _decode_addr(data[7:14])
    digis = []
    off = 14
    while not last and off + 7 <= len(data) and len(digis) < 8:
        d, last = _decode_addr(data[off : off + 7])
        digis.append(d)
        off += 7
    if off + 2 > len(data):
        return None
    control = data[off]
    pid = data[off + 1] if (control & 0x03) == 0x03 else 0  # UI/I frames carry PID
    info = data[off + 2 :] if (control & 0x03) == 0x03 else data[off + 1 :]
    return Ax25Frame(dest, src, digis, control, pid, info)


def build_ui_frame(src: Ax25Address, dest: Ax25Address, info: bytes,
                   digis: list | None = None) -> bytes:
    """UI frame (control 0x03, PID 0xF0) with FCS appended."""
    digis = digis or []
    addrs = [dest, src] + digis
    body = b""
    for i, a in enumerate(addrs):
        body += _encode_addr(a, last=(i == len(addrs) - 1), command=(i == 0))
    body += bytes([0x03, 0xF0]) + info
    fcs = crc_ccitt(body)
    return body + bytes([fcs & 0xFF, fcs >> 8])


def afsk_modulate(frame: bytes, fs: float, preamble_flags: int = 32,
                  tail_flags: int = 4) -> np.ndarray:
    """Frame bytes -> Bell-202 AFSK audio (HDLC stuffing + NRZI + CPFSK)."""
    bits: list[int] = []

    def flag():
        bits.extend([0, 1, 1, 1, 1, 1, 1, 0])

    for _ in range(preamble_flags):
        flag()
    ones = 0
    for byte in frame:
        for j in range(8):
            b = (byte >> j) & 1
            bits.append(b)
            if b:
                ones += 1
                if ones == 5:
                    bits.append(0)
                    ones = 0
            else:
                ones = 0
    for _ in range(tail_flags):
        flag()

    # NRZI encode: 0 = transition, 1 = hold
    level = 0
    nrzi = []
    for b in bits:
        if b == 0:
            level ^= 1
        nrzi.append(level)

    # continuous-phase FSK
    sps = fs / BAUD
    total = int(round(len(nrzi) * sps))
    idx = np.minimum((np.arange(total) / sps).astype(int), len(nrzi) - 1)
    freq = np.where(np.asarray(nrzi)[idx] == 1, MARK_HZ, SPACE_HZ)
    phase = 2 * np.pi * np.cumsum(freq) / fs
    return np.sin(phase).astype(np.float32)
