"""Band plan lookup (bandplan.c + share/bandplan.txt).

A compact built-in table of amateur allocations (ITU region 2 flavored,
like the reference's shipped bandplan.txt) plus major broadcast/utility
ranges; `band_name(freq)` feeds the control client's display.
"""
from __future__ import annotations

__all__ = ["BANDS", "band_name", "power_limit"]

# (low Hz, high Hz, name, note)
BANDS = [
    (135_700, 137_800, "2200m", "CW/digital"),
    (472_000, 479_000, "630m", "CW/digital"),
    (530_000, 1_700_000, "AM BC", "broadcast"),
    (1_800_000, 2_000_000, "160m", "amateur"),
    (2_300_000, 2_495_000, "120m BC", "broadcast"),
    (3_200_000, 3_400_000, "90m BC", "broadcast"),
    (3_500_000, 4_000_000, "80m", "amateur"),
    (4_750_000, 4_995_000, "60m BC", "broadcast"),
    (5_330_500, 5_406_400, "60m", "amateur channels"),
    (5_900_000, 6_200_000, "49m BC", "broadcast"),
    (7_000_000, 7_300_000, "40m", "amateur"),
    (7_200_000, 7_450_000, "41m BC", "broadcast"),
    (9_400_000, 9_900_000, "31m BC", "broadcast"),
    (10_100_000, 10_150_000, "30m", "amateur CW/digital"),
    (11_600_000, 12_100_000, "25m BC", "broadcast"),
    (13_570_000, 13_870_000, "22m BC", "broadcast"),
    (14_000_000, 14_350_000, "20m", "amateur"),
    (15_100_000, 15_800_000, "19m BC", "broadcast"),
    (17_480_000, 17_900_000, "16m BC", "broadcast"),
    (18_068_000, 18_168_000, "17m", "amateur"),
    (21_000_000, 21_450_000, "15m", "amateur"),
    (21_450_000, 21_850_000, "13m BC", "broadcast"),
    (24_890_000, 24_990_000, "12m", "amateur"),
    (25_670_000, 26_100_000, "11m BC", "broadcast"),
    (26_965_000, 27_405_000, "CB", "citizens band"),
    (28_000_000, 29_700_000, "10m", "amateur"),
    (50_000_000, 54_000_000, "6m", "amateur"),
    (88_000_000, 108_000_000, "FM BC", "broadcast"),
    (108_000_000, 137_000_000, "Air", "aviation"),
    (144_000_000, 148_000_000, "2m", "amateur"),
    (156_000_000, 162_025_000, "Marine", "marine VHF"),
    (162_400_000, 162_550_000, "WX", "NOAA weather"),
    (222_000_000, 225_000_000, "1.25m", "amateur"),
    (420_000_000, 450_000_000, "70cm", "amateur"),
    (902_000_000, 928_000_000, "33cm", "amateur"),
    (1_240_000_000, 1_300_000_000, "23cm", "amateur"),
    (2_300_000_000, 2_450_000_000, "13cm", "amateur"),
]


def band_name(freq: float) -> str:
    """Name of the band containing freq, or '' (bandplan.c lookup)."""
    for lo, hi, name, _ in BANDS:
        if lo <= freq <= hi:
            return name
    return ""


def power_limit(freq: float) -> str:
    """Note/annotation for the band (the reference displays usage notes)."""
    for lo, hi, _, note in BANDS:
        if lo <= freq <= hi:
            return note
    return ""
