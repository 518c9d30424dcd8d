"""RDS: code-layer vectors, waveform round-trip, and WFM->RDS end-to-end."""
import numpy as np
import jax
import pytest

from ka9q_radio_tpu.daemons.rds import (
    RDS_BAUD, OFFSETS, rds_checkword, encode_group, rds_modulate, RdsDecoder,
)


def make_groups(pi=0x54A8, ps="KA9QTPU!", rt="HELLO FROM THE TPU"):
    groups = []
    for seg in range(4):  # 0A: PS name
        b = (0 << 12) | (0 << 11) | (5 << 5) | seg
        d = (ord(ps[2 * seg]) << 8) | ord(ps[2 * seg + 1])
        groups.append((pi, b, 0xE0CD, d))
    rt = rt.ljust(64)
    for seg in range(16):  # 2A: radiotext
        b = (2 << 12) | (5 << 5) | seg
        c = (ord(rt[4 * seg]) << 8) | ord(rt[4 * seg + 1])
        d = (ord(rt[4 * seg + 2]) << 8) | ord(rt[4 * seg + 3])
        groups.append((pi, b, c, d))
    return groups


def test_checkword_syndrome_consistency():
    # decoder's matcher must identify every offset from encoded blocks
    for off in OFFSETS:
        info = 0x1234
        blk = (info << 10) | rds_checkword(info, off)
        assert RdsDecoder._match(blk) == off
    # corrupted block matches nothing
    blk ^= 0x00400
    assert RdsDecoder._match(blk) is None


def test_bit_layer_roundtrip():
    bits = encode_group(0x54A8, (0 << 12) | (5 << 5) | 2, 0xE0CD, 0x4142)
    assert len(bits) == 104
    dec = RdsDecoder()
    # push differentially-encoded bits straight into the block layer
    for b in bits * 3:
        dec._push_bit(b)
    assert dec.station.pi == 0x54A8
    assert dec.station.pty == 5
    assert dec.station.ps[4:6] == ["A", "B"]


def test_waveform_roundtrip():
    groups = make_groups()
    wave = rds_modulate(groups * 4, fs=48_000.0)
    dec = RdsDecoder(48_000.0)
    # stream in 20 ms blocks
    for i in range(0, wave.size, 960):
        dec.feed(wave[i : i + 960])
    st = dec.station
    assert st.groups > 10
    assert st.pi == 0x54A8
    assert st.ps_name == "KA9QTPU!"
    assert st.radiotext.startswith("HELLO FROM THE TPU")


def test_wfm_rds_end_to_end():
    """Full chain: FM multiplex with RDS at 57 kHz -> engine -> RdsDecoder."""
    from ka9q_radio_tpu.runtime import ChannelSpec, GroupSpec, Engine

    FS = 3_840_000
    STATION = 500_000.0
    eng = Engine(
        samprate=FS, real=False,
        groups=[GroupSpec(name="wfm", demod="wfm", samprate=384_000,
                          channels=(ChannelSpec(freq=STATION, low=-100_000.0, high=100_000.0),))],
    )
    nblocks = 80
    n = nblocks * eng.L
    t = np.arange(n) / FS

    rds_bb = rds_modulate(make_groups() * 6, fs=FS)  # baseband biphase at FS
    rds_bb = np.resize(rds_bb, n)
    pilot_ph = 2 * np.pi * 19_000.0 * t
    comp = (
        0.9 * np.cos(2 * np.pi * 1000.0 * t)  # mono tone
        + 0.1 * np.sin(pilot_ph)
        + 0.06 * rds_bb * np.sin(3 * pilot_ph)  # RDS on 57 kHz, locked to pilot
    )
    phase = 2 * np.pi * np.cumsum(STATION + 75_000.0 * comp * 0.5) / FS
    sig = (0.25 * np.exp(1j * phase)).astype(np.complex64)

    state, params = eng.init_state(), eng.init_params()
    step = jax.jit(eng.step)
    dec = RdsDecoder(48_000.0)
    for k in range(nblocks):
        state, out = step(state, params, sig[k * eng.L : (k + 1) * eng.L])
        info = jax.device_get(out["wfm"]["info"])
        if k >= 4:  # skip filter warm-up
            dec.feed(np.asarray(info["rds_baseband"][0]))
    st = dec.station
    assert st.groups >= 5, (st.groups, st.block_errors)
    assert st.pi == 0x54A8
    assert "".join(st.ps).strip("\x00 ") != ""
