"""Frequency / time string parsing.

Behavior-compatible with the reference's parse_frequency (misc.c, used by
radio.c:817 and the `tune` client): accepts plain Hz, suffix multipliers
(k/m/g, case-insensitive), and the ham "infix decimal point" notation where
the multiplier letter sits at the decimal point, e.g. "147m435" = 147.435 MHz.

Without a multiplier letter the reference applies a magnitude heuristic when
`default_heuristic` is on (used by interactive tools): values < 100 are MHz,
100..500000 are kHz, >= 500000 are Hz.  radiod config parsing uses raw Hz.
"""
from __future__ import annotations

import re

_MULT = {"k": 1e3, "m": 1e6, "g": 1e9}

_RE = re.compile(
    r"""^\s*
        (?P<int>\d*)
        (?:
            (?P<mult>[kKmMgG])      # infix multiplier acts as decimal point
            (?P<frac>\d*)
          |
            (?:\.(?P<frac2>\d+))?
            (?P<mult2>[kKmMgG]?)
        )
        \s*(?:[hH][zZ])?\s*$""",
    re.VERBOSE,
)


def parse_frequency(s: str | float | int, default_heuristic: bool = False) -> float:
    """Parse a frequency string to Hz."""
    if isinstance(s, (int, float)):
        value, mult = float(s), None
    else:
        m = _RE.match(str(s))
        if not m:
            raise ValueError(f"cannot parse frequency: {s!r}")
        if m.group("mult"):
            intpart = m.group("int") or "0"
            frac = m.group("frac") or ""
            value = float(f"{intpart}.{frac}" if frac else intpart)
            mult = m.group("mult").lower()
        else:
            intpart = m.group("int") or "0"
            frac = m.group("frac2")
            value = float(f"{intpart}.{frac}" if frac else intpart)
            mult = (m.group("mult2") or "").lower() or None
    if mult:
        return value * _MULT[mult]
    if default_heuristic and value != 0:
        if value < 100.0:
            return value * 1e6
        if value < 500000.0:
            return value * 1e3
    return value
