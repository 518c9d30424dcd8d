"""Minimal Ogg encapsulation for Opus streams (RFC 3533 + RFC 7845).

pcmrecord puts received Opus RTP packets into a standard Ogg container
without re-encoding (pcmrecord.c "Opus streams are placed in a standard
Ogg container"); any player (ffplay, opusdec, mpv) can read the result.
Pure Python: Ogg page framing + the OpusHead/OpusTags header packets.
"""
from __future__ import annotations

import struct

__all__ = ["OggOpusWriter", "ogg_crc"]

# Ogg CRC32: poly 0x04c11db7, init 0, no reflection, no final xor
_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) if (_r & 0x80000000) else (_r << 1)
    _CRC_TABLE.append(_r & 0xFFFFFFFF)


def ogg_crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) & 0xFF) ^ b]
    return crc


def _page(serial: int, seqno: int, granule: int, packets: list[bytes],
          header_type: int = 0) -> bytes:
    """Build one Ogg page holding whole packets (each < 255*255 bytes)."""
    segs = bytearray()
    body = bytearray()
    for p in packets:
        n = len(p)
        while n >= 255:
            segs.append(255)
            n -= 255
        segs.append(n)
        body += p
    hdr = struct.pack("<4sBBqIII", b"OggS", 0, header_type,
                      granule & 0xFFFFFFFFFFFFFFFF, serial & 0xFFFFFFFF,
                      seqno & 0xFFFFFFFF, 0) + bytes([len(segs)]) + bytes(segs)
    crc = ogg_crc(hdr + bytes(body))
    hdr = hdr[:22] + struct.pack("<I", crc) + hdr[26:]
    return hdr + bytes(body)


class OggOpusWriter:
    """Stream Opus packets into an .opus (Ogg) file."""

    def __init__(self, fp, channels: int = 2, serial: int = 0xD00D,
                 pre_skip: int = 312, input_rate: int = 48_000):
        self.fp = fp
        self.serial = serial
        self.seq = 0
        self.granule = 0  # 48 kHz sample count (RFC 7845 granule position)
        self.pending: list[bytes] = []
        self.pending_bytes = 0
        head = (b"OpusHead" + struct.pack("<BBHIhB", 1, channels, pre_skip,
                                          input_rate, 0, 0))
        tags = (b"OpusTags" + struct.pack("<I", 14) + b"ka9q-radio-tpu"
                + struct.pack("<I", 0))
        self._write_page([head], header_type=2)  # BOS
        self._write_page([tags])

    def _write_page(self, packets, granule=None, header_type=0):
        g = self.granule if granule is None else granule
        self.fp.write(_page(self.serial, self.seq, g, packets, header_type))
        self.seq += 1

    @staticmethod
    def packet_samples(packet: bytes) -> int:
        """48 kHz sample count of one Opus packet from its TOC byte."""
        if not packet:
            return 0
        toc = packet[0]
        config = toc >> 3
        code = toc & 3
        # configs 0-11 SILK (10/20/40/60 ms), 12-15 hybrid (10/20 ms),
        # 16-31 CELT (2.5/5/10/20 ms) — RFC 6716 section 3.1
        if config < 12:
            frame = (480, 960, 1920, 2880)[config % 4]
        elif config < 16:
            frame = (480, 960)[config % 2]
        else:
            frame = (120, 240, 480, 960)[config % 4]
        nframes = {0: 1, 1: 2, 2: 2}.get(code)
        if nframes is None:  # code 3: count in the next byte
            nframes = packet[1] & 0x3F if len(packet) > 1 else 1
        return frame * nframes

    def write(self, packet: bytes, flush: bool = False):
        self.granule += self.packet_samples(packet)
        self.pending.append(packet)
        self.pending_bytes += len(packet)
        if flush or self.pending_bytes >= 4096 or len(self.pending) >= 32:
            self._write_page(self.pending)
            self.pending = []
            self.pending_bytes = 0

    def close(self):
        self._write_page(self.pending, header_type=4)  # EOS
        self.pending = []
        self.fp.flush()
