"""APRS information-field decoding (aprs.c): position reports (plain and
compressed), Mic-E destination-encoded positions are out of scope for v1,
plus status/message extraction. Output mirrors what the reference's aprs
client prints and what aprsfeed forwards to APRS-IS."""
from __future__ import annotations

import dataclasses
import re

from .ax25 import Ax25Frame

__all__ = ["AprsReport", "decode_aprs", "tnc2_format"]


@dataclasses.dataclass
class AprsReport:
    kind: str  # "position" | "status" | "message" | "other"
    lat: float | None = None
    lon: float | None = None
    symbol: str = ""
    comment: str = ""
    text: str = ""


_POS_RE = re.compile(
    rb"^([!=/@])(?:[0-9]{6}[zh/])?"
    rb"(?P<lat>[0-9]{4}\.[0-9]{2})(?P<ns>[NS])(?P<sym1>.)"
    rb"(?P<lon>[0-9]{5}\.[0-9]{2})(?P<ew>[EW])(?P<sym2>.)"
)


def _base91(chars: bytes) -> int:
    v = 0
    for c in chars:
        v = v * 91 + (c - 33)
    return v


def decode_aprs(info: bytes) -> AprsReport:
    if not info:
        return AprsReport("other")
    dti = info[:1]
    if dti in b"!=/@":
        m = _POS_RE.match(info)
        if m:
            lat = float(m.group("lat")[:2]) + float(m.group("lat")[2:]) / 60.0
            if m.group("ns") == b"S":
                lat = -lat
            lon = float(m.group("lon")[:3]) + float(m.group("lon")[3:]) / 60.0
            if m.group("ew") == b"W":
                lon = -lon
            rest = info[m.end():]
            return AprsReport("position", lat, lon,
                              (m.group("sym1") + m.group("sym2")).decode("latin1"),
                              rest.decode("latin1", "replace"))
        # compressed position: /YYYYXXXX$csT
        body = info[1:]
        if len(body) >= 13:
            try:
                lat = 90.0 - _base91(body[1:5]) / 380926.0
                lon = -180.0 + _base91(body[5:9]) / 190463.0
                sym = body[0:1] + body[9:10]
                return AprsReport("position", lat, lon, sym.decode("latin1"),
                                  body[13:].decode("latin1", "replace"))
            except Exception:
                pass
        return AprsReport("other", text=info.decode("latin1", "replace"))
    if dti == b">":
        return AprsReport("status", text=info[1:].decode("latin1", "replace"))
    if dti == b":":
        return AprsReport("message", text=info[1:].decode("latin1", "replace"))
    return AprsReport("other", text=info.decode("latin1", "replace"))


def tnc2_format(f: Ax25Frame) -> str:
    """TNC2 monitor format, the APRS-IS wire line (aprsfeed.c)."""
    path = ",".join(str(d) for d in f.digis)
    via = f",{path}" if path else ""
    return f"{f.src}>{f.dest}{via}:{f.info.decode('latin1', 'replace')}"
