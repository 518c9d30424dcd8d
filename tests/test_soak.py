"""Control-plane churn soak: hundreds of create/retune/move/remove cycles
against one daemon, checking the invariants the targeted tests can't see —
slot accounting never leaks, rebuilds stay bounded by the number of
distinct compiled classes, carried state stays finite, and parked-state
saves don't accumulate (radio_status.c's command loop runs for months)."""
import numpy as np
import pytest

from ka9q_radio_tpu.config import load_config
from ka9q_radio_tpu.runtime.radiod import Radiod
from ka9q_radio_tpu.net.status import StatusType as T, encode_status

CONF = """
[global]
hardware = sig_gen
mode = usb
dyn-slots = 2

[sig_gen]
device = sig_gen
samprate = 1m024
complex = yes
carrier = 201k0
amplitude = -20
noise = -130

[hf]
mode = usb
samprate = 16k
freq = 200k0

[cw]
mode = cwu
freq = 150k0
"""


def cmd(rd, ssrc, **kv):
    fields = {T.OUTPUT_SSRC: ssrc}
    fields.update({T[k]: v for k, v in kv.items()})
    rd.handle_packet(encode_status(fields, cmd=True))
    return rd.chans.get(ssrc)


def check_slots(rd):
    """Every live channel holds a unique slot; used + free == C per group."""
    used: dict[str, set] = {}
    for ch in rd.chans.values():
        assert ch.idx not in used.setdefault(ch.group, set()), (ch.group, ch.idx)
        used[ch.group].add(ch.idx)
    for gname, g in rd.engine.groups.items():
        u = used.get(gname, set())
        free = set(rd.free_slots.get(gname, []))
        assert not (u & free), f"{gname}: live slots marked free: {u & free}"
        assert len(u) + len(free) == g.C, (
            f"{gname}: {len(u)} used + {len(free)} free != C={g.C}")


def test_control_plane_churn():
    rng = np.random.default_rng(7)
    rd = Radiod(load_config(CONF), use_network=False)
    rd.step_block()
    presets = ["am", "usb", "cwu", "nfm"]
    engines = {id(rd.engine)}
    live = []
    for i in range(120):
        op = rng.integers(0, 5)
        if op == 0 or not live:  # create
            ssrc = 5000 + i
            ch = cmd(rd, ssrc, PRESET=str(rng.choice(presets)),
                     RADIO_FREQUENCY=float(rng.uniform(150e3, 250e3)))
            if ch is not None:
                live.append(ssrc)
        elif op == 1:  # retune (sometimes out of coverage -> park)
            f = float(rng.uniform(100e3, 300e3)) if rng.random() < 0.8 else 9e9
            cmd(rd, int(rng.choice(live)), RADIO_FREQUENCY=f)
        elif op == 2:  # rate-class move
            cmd(rd, int(rng.choice(live)),
                OUTPUT_SAMPRATE=int(rng.choice([8000, 12000, 24000])))
        elif op == 3:  # preset move
            cmd(rd, int(rng.choice(live)), PRESET=str(rng.choice(presets)))
        else:  # remove
            rd.remove_channel(live.pop(int(rng.integers(0, len(live)))))
        engines.add(id(rd.engine))
        if i % 20 == 19:
            out = rd.step_block()
            assert out is not None
            for name, g in out.items():
                if name.startswith("_"):
                    continue
                assert np.all(np.isfinite(np.asarray(g["audio"]))), name
            check_slots(rd)
    check_slots(rd)
    # park saves only for live parked channels
    parked = {(c.group, c.idx) for c in rd.chans.values() if c.parked}
    assert set(rd._park_saves) <= parked, (set(rd._park_saves), parked)
    # rebuilds bounded: distinct (preset x samprate-ish) classes, not churn count
    assert len(engines) < 40, f"{len(engines)} rebuilds for 120 ops"
    # the static channels survived it all
    out = rd.step_block()
    assert np.all(np.isfinite(np.asarray(out["hf"]["audio"])))
