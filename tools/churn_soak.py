"""Long-churn live soak (VERDICT r3 #10): continuous dynamic
creates/removes/preset-moves/retunes against the paced daemon on the
ambient platform, at restocking pace, asserting the control-plane
invariants targeted tests can't see at duration:

  * zero FOREGROUND rebuilds after warmup — every command lands as
    params surgery or a warm-class slot reuse; pool growth happens only
    via background restock swaps (radio_status.c:92-105's months-long
    command loop, made recompile-free);
  * zero dropped blocks outside device-flake bursts;
  * memory stability (VmRSS growth bounded).

Prints ONE json summary line. Run time: --seconds (default 630).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")

CONF = """
[global]
hardware = sig_gen
time-shards = 16
dyn-slots = 24
status = churn-{tag}-st.local
data = churn-{tag}-pcm.local
update = 25
ttl = 0

[sig_gen]
device = sig_gen
samprate = 1m024
complex = yes
carrier = 201k0
amplitude = -20
noise = -110

[hf]
mode = usb
samprate = 12k
freq = 200k0 210k0 220k0 230k0

[fmgrp]
mode = nfm
samprate = 24k
freq = 300k0
"""


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def main() -> int:
    seconds = 630.0
    dyn_slots = None
    rss_out = None
    for i, a in enumerate(sys.argv):
        if a == "--seconds":
            seconds = float(sys.argv[i + 1])
        elif a == "--dyn-slots":
            dyn_slots = int(sys.argv[i + 1])
        elif a == "--rss-out":
            rss_out = sys.argv[i + 1]

    from ka9q_radio_tpu.config import load_config
    from ka9q_radio_tpu.runtime.radiod import Radiod
    from ka9q_radio_tpu.net.status import StatusType as T, encode_status

    conf = CONF.format(tag=os.getpid())
    if dyn_slots is not None:
        conf = conf.replace("dyn-slots = 24", f"dyn-slots = {dyn_slots}")
    rd = Radiod(load_config(conf), use_network=True)

    def cmd(ssrc, **kv):
        fields = {T.OUTPUT_SSRC: ssrc}
        fields.update({T[k]: v for k, v in kv.items()})
        rd.handle_packet(encode_status(fields, cmd=True))
        return rd.chans.get(ssrc)

    # --- warmup: compile every class the churn will touch (usb reuses the
    # static [hf] class; nfm reuses [fmgrp]; am is the one new class),
    # then let the first restock settle so the spare pool starts full
    t0 = time.monotonic()
    rd.step_block()
    cmd(9001, PRESET="usb", RADIO_FREQUENCY=205e3)
    cmd(9002, PRESET="am", RADIO_FREQUENCY=215e3)
    cmd(9003, PRESET="nfm", RADIO_FREQUENCY=310e3)
    for _ in range(3):
        rd.step_block()
    t_settle = time.monotonic() + 90.0
    while (rd._restock is not None or rd._restock_pending) \
            and time.monotonic() < t_settle:
        rd.step_block()
    warm_s = time.monotonic() - t0

    rng = np.random.default_rng(11)
    presets = ["usb", "am", "nfm"]
    live = [9001, 9002, 9003]
    next_ssrc = 9010
    fg_rebuilds = 0
    restock_swaps = 0
    commands = 0
    dispatches = 0
    rss0 = rss_mb()
    rss_series = [rss0]
    epoch = rd._engine_epoch

    t_start = time.monotonic()
    deadline = t_start + seconds
    per = (rd._time_shards or 1) * rd.cfg.blocktime  # stream s per dispatch
    next_due = time.monotonic()
    while time.monotonic() < deadline:
        # 1-2 control operations per dispatch (~6/s of stream time at
        # restocking pace: creates trend the pool upward so background
        # restocks actually fire)
        for _ in range(int(rng.integers(1, 3))):
            op = int(rng.integers(0, 10))
            e0 = rd._engine_epoch
            if (op <= 1 and len(live) < 24) or not live:  # create (20%)
                cmd(next_ssrc, PRESET=str(rng.choice(presets)),
                    RADIO_FREQUENCY=float(rng.uniform(150e3, 450e3)))
                if next_ssrc in rd.chans:
                    live.append(next_ssrc)
                next_ssrc += 1
            elif op <= 6:  # retune (50%)
                cmd(int(rng.choice(live)),
                    RADIO_FREQUENCY=float(rng.uniform(150e3, 450e3)))
            elif op == 7:  # preset move within the warm set (10%)
                cmd(int(rng.choice(live)), PRESET=str(rng.choice(presets)))
            elif len(live) > 8:  # remove (20%, keep a floor)
                rd.remove_channel(live.pop(int(rng.integers(0, len(live)))))
            commands += 1
            if rd._engine_epoch != e0:
                fg_rebuilds += 1  # a command forced a foreground rebuild
        e0 = rd._engine_epoch
        rd.step_block()
        dispatches += 1
        if rd._engine_epoch != e0:
            restock_swaps += 1  # background pool-grow swapped in
        next_due += per
        lag = next_due - time.monotonic()
        if lag > 0:
            time.sleep(lag)  # realtime pacing
        if dispatches % 30 == 0:
            rss_series.append(rss_mb())
            if rss_out:
                with open(rss_out, "a") as fh:
                    fh.write(json.dumps({
                        "t": round(time.monotonic() - t_start, 1),
                        "rss_mb": round(rss_series[-1], 1),
                        "blocks": rd.blocks, "commands": commands,
                        "fg_rebuilds": fg_rebuilds,
                        "restock_swaps": restock_swaps,
                        "pools": {k: len(v) for k, v in rd.free_slots.items()},
                    }) + "\n")

    out = {
        "seconds": round(time.monotonic() - t_start, 1),
        "warmup_s": round(warm_s, 1),
        "stream_blocks": rd.blocks,
        "dispatches": dispatches,
        "commands": commands,
        "live_channels_end": len(rd.chans),
        "fg_rebuilds_after_warmup": fg_rebuilds,
        "restock_swaps": restock_swaps,
        "block_drops": rd.block_drops,
        "command_drops": rd.command_drops,
        "rss_start_mb": round(rss0, 1),
        "rss_end_mb": round(rss_series[-1], 1),
        "rss_peak_mb": round(max(rss_series), 1),
        "p50_ms": round(rd.latency_percentiles((50,))[0] * 1e3, 2),
        "p99_ms": round(rd.latency_percentiles((99,))[0] * 1e3, 2),
        "dyn_slots": rd.dyn_spare,
        "restock_latency_s": {k: round(v, 1) for k, v in rd._restock_latency.items()},
    }
    print(json.dumps(out), flush=True)
    # memory check = PLATEAU, not absolute growth: caches warm up early
    # (compiled programs for every class the churn touches, deepened
    # restock pools); a leak shows as continued growth in the BACK HALF
    half = rss_series[len(rss_series) // 2 :]
    plateau_ok = (not half) or out["rss_end_mb"] <= min(half) * 1.10 + 32
    ok = (out["fg_rebuilds_after_warmup"] == 0 and out["block_drops"] == 0
          and plateau_ok)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
