"""Config loader: radiod.conf dialect -> engine GroupSpecs."""
import numpy as np
import pytest

from ka9q_radio_tpu.config import load_config, PRESETS
from ka9q_radio_tpu.utils.parse import parse_frequency
from ka9q_radio_tpu.runtime import Engine

CONF = """
# synthetic front end + three channel groups (reference dialect)
[global]
hardware = sig_gen
status = test.local       ; DNS name
data = test-pcm.local
mode = usb                # default preset
ttl = 1
blocktime = 20
overlap = 5

[sig_gen]
device = "sig_gen"
description = "Software Signal Generator"
carrier = 10m0
amplitude = -20 # dBFS
noise = -120
samprate = 1m024
real = no

[wwv]
mode = am
freq = "100k0 200k0"

[repeaters]
mode = pm
samprate = 16k
freq = 300k0
tone = 107.2

[scan]
mode = nfm
samprate = 16k
raster = 100k 125k 5k
except = 110k
"""


def test_load_config_full():
    cfg = load_config(CONF)
    assert cfg.source is not None
    assert cfg.source.samprate == 1_024_000
    assert not cfg.source.real
    assert abs(cfg.source.amplitude - 0.1) < 1e-9
    # "noise" is the reference's per-sample amplitude key (sig_gen.c:149):
    # sigma = -120 dBFS -> N0 = 2*sigma^2/fs
    want_n0 = 2.0 * (10 ** (-120 / 20.0)) ** 2 / 1_024_000
    assert abs(10 * np.log10(cfg.source.noise_n0) - 10 * np.log10(want_n0)) < 1e-6
    assert cfg.blocktime == 0.02 and cfg.overlap == 5
    assert cfg.options["status"] == "test.local"

    by_name = {g.name: g for g in cfg.groups}
    assert set(by_name) == {"wwv", "repeaters", "scan"}

    wwv = by_name["wwv"]
    assert wwv.demod == "linear" and wwv.envelope  # am preset
    assert wwv.samprate == 12_000
    assert [c.freq for c in wwv.channels] == [100_000.0, 200_000.0]
    assert wwv.hangtime_s == 0.0 and wwv.recovery_rate_db == 50.0

    rpt = by_name["repeaters"]
    assert rpt.demod == "fm" and rpt.samprate == 16_000  # section overrides preset
    assert rpt.ctcss and rpt.channels[0].tone_freq == 107.2
    assert rpt.threshold_extend  # pm preset
    assert rpt.squelch_open_db == 10.0 and rpt.squelch_close_db == 6.0
    assert rpt.deemph_tc_us == 530.5 and rpt.deemph_gain_db == 12.0

    scan = by_name["scan"]
    freqs = [c.freq for c in scan.channels]
    assert freqs == [100_000.0, 105_000.0, 115_000.0, 120_000.0]  # 110k excepted
    assert scan.channels[0].resolved_ssrc() == 100

    # and the whole thing builds a working engine
    eng = Engine(samprate=cfg.samprate, real=cfg.real, groups=cfg.groups,
                 blocktime=cfg.blocktime, overlap=cfg.overlap)
    assert eng.L == 20_480


def test_presets_complete():
    # the reference ships these presets (share/presets.conf)
    for want in ["pm", "npm", "wpm", "fm", "nfm", "wfm", "am", "sam", "ame", "iq",
                 "cwu", "cwl", "usb", "lsb", "dsb", "isb", "amsq", "wspr",
                 "spectrum", "nam"]:
        assert want in PRESETS, want


def test_parse_frequency_signs_and_infix():
    assert parse_frequency("147m435") == 147_435_000.0
    assert parse_frequency("-6k25") == -6250.0
    assert parse_frequency("+8k") == 8000.0
    assert parse_frequency("-100.0") == -100.0
    assert parse_frequency("10m0") == 10_000_000.0
    assert parse_frequency("446", True) == 446_000_000.0  # heuristic: MHz
    assert parse_frequency("7040", True) == 7_040_000.0  # heuristic: kHz


def test_cw_preset_shift():
    cfg = load_config("""
[global]
hardware =
mode = cwu
[cw]
freq = 100k0
mode = cwu
samprate = 12k
""")
    g = cfg.groups[0]
    assert g.channels[0].shift_hz == 500.0
    assert g.channels[0].low == -200.0 and g.channels[0].high == 200.0
    assert g.hangtime_s == 0.2


def test_bandplan_lookup():
    from ka9q_radio_tpu.config.bandplan import band_name, power_limit

    assert band_name(14_074_000) == "20m"
    assert band_name(146_520_000) == "2m"
    assert band_name(96_300_000) == "FM BC"
    assert band_name(162_475_000) == "WX"
    assert band_name(999) == ""
    assert power_limit(7_100_000) == "amateur"


def test_runtime_global_keys_validate_clean():
    """Every [global] key the runtime reads must be known to the validator
    (a documented key must not warn 'unknown key' — config_validate analog,
    radio.c:282)."""
    cfg = load_config("""
[global]
hardware = sig_gen
mode = usb
mesh = no
fail-deadline = 0
dyn-slots = 2
prealloc = usb
wisdom = /tmp/x
[sig_gen]
device = sig_gen
samprate = 512k
complex = yes
[ch]
mode = usb
samprate = 12k
freq = 100k0
""")
    bad = [w for w in cfg.warnings if "unknown key" in w]
    assert not bad, bad


def test_config_fuzz_never_crashes_uncleanly():
    """Hostile config text must either load or raise a clean ValueError /
    configparser error — never TypeError/KeyError/etc. (config_validate
    reports, radio.c:88-118; the reference exits with a message)."""
    import configparser
    import random

    base = """
[global]
hardware = sig_gen
mode = usb
[sig_gen]
device = sig_gen
samprate = 512k
complex = yes
carrier = 101k
[usb]
mode = usb
samprate = 12k
freq = 100k3
"""
    # OSError: a no-newline garbage string is treated as a config *path*
    # (missing-file errors are clean CLI errors too)
    ok = (ValueError, configparser.Error, OSError)
    rng = random.Random(1234)

    def attempt(text):
        try:
            load_config(text)
        except ok:
            pass

    # pure garbage
    for _ in range(40):
        attempt("".join(chr(rng.randrange(32, 127)) for _ in range(rng.randrange(0, 300))))
    # random binary-ish garbage with newlines and brackets
    for _ in range(40):
        attempt("".join(rng.choice("[]=\n#;ab:0 \t") for _ in range(rng.randrange(0, 400))))
    # mutated valid configs: byte flips, deletions, duplications
    for _ in range(120):
        t = list(base)
        for _ in range(rng.randrange(1, 6)):
            i = rng.randrange(len(t))
            op = rng.random()
            if op < 0.4:
                t[i] = chr(rng.randrange(32, 127))
            elif op < 0.7:
                del t[i]
            else:
                t.insert(i, rng.choice("[]=\nkmg0123456789.-"))
        attempt("".join(t))
    # hostile values in every slot of a valid skeleton
    hostile = ["", "-", "nan", "inf", "-inf", "1e309", "0x41", "999999999k",
               "yes no", "\x00", "🦊", "1/0", "None", "[global]", "=", "m", "k9"]
    for v in hostile:
        attempt(base.replace("12k", v))
        attempt(base.replace("100k3", v))
        attempt(base.replace("usb", v))
        attempt(base.replace("512k", v))
        attempt(base.replace("yes", v))


def test_service_units_reference_real_tools():
    """Every ExecStart in service/*.service must invoke a console script
    this package installs, with long flags its argparse actually defines
    (deploy-artifact analog of the reference's service/ templates)."""
    import configparser
    import glob
    import os
    import re

    root = os.path.join(os.path.dirname(__file__), "..")
    scripts = {}  # name -> module path
    for line in open(os.path.join(root, "pyproject.toml")):
        m = re.match(r'([\w-]+) = "([\w.]+):\w+"', line.strip())
        if m:
            scripts[m.group(1)] = m.group(2)
    assert scripts, "pyproject console scripts parse failed"

    units = glob.glob(os.path.join(root, "service", "*.service"))
    assert len(units) >= 6
    for unit in units:
        cp = configparser.ConfigParser(strict=False, interpolation=None)
        cp.read(unit)
        assert cp.has_section("Service") and cp.has_section("Install"), unit
        for key in ("ExecStart", "ExecStartPre"):
            if not cp.has_option("Service", key):
                continue
            cmd = cp.get("Service", key).lstrip("-").split()
            tool = os.path.basename(cmd[0])
            assert tool in scripts, f"{unit}: unknown tool {tool}"
            src = open(os.path.join(
                root, scripts[tool].replace(".", os.sep) + ".py")).read()
            for arg in cmd[1:]:
                if arg.startswith("--"):
                    flag = arg.split("=")[0]
                    assert f'"{flag}"' in src, f"{unit}: {tool} lacks {flag}"
