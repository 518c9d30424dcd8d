"""End-to-end dispatch latency: block-in -> RTP-out, per dispatch mode.

Measures the DAEMON path (Radiod.step_block: device step + d2h + host
packetization + multicast send) on the ambient platform, for
time-shards = 0 / 4 / 16 on one device. Each sample is one dispatch's
wall time; a time-sharded dispatch carries D blocks, so its per-block
audio latency adds up to (D-1)*20 ms of queueing on top (reported as
`added_latency_ms`). Prints one JSON line per mode.

Over the axon tunnel the per-dispatch floor is the tunnel RTT — that is
the number this tool exists to make honest (docs/OPERATIONS.md).
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
hardware = gen
{opts}status = lat-{tag}-st.local
data = lat-{tag}-pcm.local
update = 25
ttl = 0

[gen]
device = sig_gen
samprate = 1m024
complex = yes
carrier = 100k
amplitude = -20
noise = -90

[usb]
mode = usb
samprate = 12k
freq = 100k0 110k0 120k0 130k0 140k0 150k0 160k0 170k0
"""


def measure(ts: int, dispatches: int) -> dict:
    from ka9q_radio_tpu.config import load_config
    from ka9q_radio_tpu.runtime.radiod import Radiod

    opts = "" if ts == 0 else f"time-shards = {ts}\n"
    cfg = load_config(CONF.format(opts=opts, tag=f"{os.getpid()}-{ts}"))
    rd = Radiod(cfg, use_network=True)
    try:
        for _ in range(3):  # warm the compile caches + first transfers
            rd.step_block()
        spans = []
        for _ in range(dispatches):
            t0 = time.perf_counter()
            rd.step_block()
            spans.append(time.perf_counter() - t0)
    finally:
        for sock in (rd.data_sock, rd.status_in, getattr(rd, "status_out", None)):
            try:
                if sock is not None:
                    sock.close()
            except OSError:
                pass
    s = np.sort(np.asarray(spans)) * 1e3
    d = max(ts, 1)
    return {
        "mode": f"time-shards={ts}" if ts else "per-block",
        "blocks_per_dispatch": d,
        "dispatch_p50_ms": round(float(np.percentile(s, 50)), 2),
        "dispatch_p99_ms": round(float(np.percentile(s, 99)), 2),
        # worst-case extra audio latency a block can see from riding a
        # D-block dispatch: the dispatch itself + (D-1) blocks of queueing
        "added_latency_ms": round(float(np.percentile(s, 50)) + (d - 1) * 20.0, 1),
        "samples": len(s),
    }


def main():
    modes = [int(a) for a in sys.argv[1:]] or [0, 4, 16]
    for ts in modes:
        n = {0: 200, 4: 60}.get(ts, 20)
        for attempt in range(3):
            try:
                print(json.dumps(measure(ts, n)), flush=True)
                break
            except Exception as e:
                print(f"# ts={ts} attempt {attempt}: {type(e).__name__}: "
                      f"{str(e)[:120]}", file=sys.stderr, flush=True)
                time.sleep(20)


if __name__ == "__main__":
    main()
