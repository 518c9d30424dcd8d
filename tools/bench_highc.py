#!/usr/bin/env python
"""High-C daemon demo (VERDICT r5 #2): a LIVE radiod serving tens of
thousands of channels in real time — not just engine compute.

32,768 SSB channels (majority squelched; a sig_gen carrier opens a few)
with device-side squelch-gated egress (`egress-slots`), the native
indexed edge, lazy info d2h and staggered beacons. Runs the paced
daemon for --secs of stream time on the ambient (TPU) platform and spot
taps the carrier channel's RTP to verify real audio leaves the wire.

Prints ONE json line; append it to docs/bench/ as the daemon-level
channels/chip evidence (the README ceiling is engine-compute; THIS is
the served number).

Usage: python tools/bench_highc.py [--channels 32768] [--secs 60]
                                   [--shards 8] [--slots 512]
"""
import argparse
import json
import select
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=32_768)
    ap.add_argument("--secs", type=float, default=60.0)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--slots", type=int, default=512)
    ap.add_argument("--fs", type=float, default=129.6e6)
    a = ap.parse_args()

    from ka9q_radio_tpu.config.loader import load_config
    from ka9q_radio_tpu.runtime.radiod import Radiod
    from ka9q_radio_tpu.net.multicast import listen_socket, resolve_dest
    from ka9q_radio_tpu.net.rtp import RtpHeader, Encoding, decode_samples

    fs = a.fs
    lo, hi = 0.02 * fs, 0.48 * fs
    step = (hi - lo) / a.channels
    # the carrier lands 700 Hz into ONE channel's USB passband
    k = a.channels // 3
    carrier = lo + k * step + 700.0
    tag = f"highc-{int(time.time())%100000}"
    conf = f"""
[global]
hardware = sig_gen
mode = usb
time-shards = {a.shards}
status = {tag}-ctl.local
data = {tag}-pcm.local
update = 2000
ttl = 0
[sig_gen]
device = sig_gen
samprate = {int(fs)}
real = yes
carrier = {carrier:.0f}
amplitude = -20
noise = -135
[hf]
mode = usb
samprate = 12k
raster = {lo:.1f} {hi:.1f} {step:.6f}
snr-squelch = yes
egress-slots = {a.slots}
"""
    t_build0 = time.monotonic()
    rd = Radiod(load_config(conf), use_network=True)
    build_s = time.monotonic() - t_build0
    C = rd.engine.groups["hf"].C
    g = rd.engine.groups["hf"]
    # kHz-rounded SSRCs collide at sub-kHz rasters and get bumped — find
    # the carrier channel by its slot index
    want_ssrc = next(ch.ssrc for ch in rd.chans.values()
                     if ch.group == "hf" and ch.idx == k)
    rx = listen_socket(resolve_dest(f"{tag}-pcm.local", 5004))

    D = rd._time_shards or 1
    per = D * rd.cfg.blocktime
    # warmup / compile
    t0 = time.monotonic()
    rd.step_block()
    compile_s = time.monotonic() - t0
    for _ in range(2):
        rd.step_block()
    while select.select([rx], [], [], 0)[0]:
        rx.recvfrom(65536)
    overflow0 = rd.egress_overflows

    payloads = []
    audio_ssrcs = set()
    ndisp = int(a.secs / per)
    next_due = time.monotonic()
    t_start = time.monotonic()
    late = 0
    for _ in range(ndisp):
        rd.step_block()
        while select.select([rx], [], [], 0)[0]:
            pkt, _ = rx.recvfrom(65536)
            if len(pkt) > 12:
                h, pl = RtpHeader.unpack(pkt)
                audio_ssrcs.add(h.ssrc)
                if h.ssrc == want_ssrc:
                    payloads.append(pl)
        next_due += per
        lag = next_due - time.monotonic()
        if lag > 0:
            time.sleep(lag)
        else:
            late += 1
    wall = time.monotonic() - t_start
    p50, p99 = rd.latency_percentiles()
    # spot tap: the carrier channel's decoded audio carries a 700 Hz tone
    tone_hz = 0.0
    if payloads:
        audio = np.concatenate([decode_samples(p, Encoding.S16BE)
                                for p in payloads[2:]])
        if audio.size > 4096:
            S = np.abs(np.fft.rfft(audio * np.hanning(audio.size)))
            tone_hz = float(np.fft.rfftfreq(audio.size, 1 / 12_000)[np.argmax(S)])
    out = {
        "mode": "highc_daemon", "channels": C, "fs_msps": fs / 1e6,
        "egress_slots": a.slots, "time_shards": D,
        "blocks": rd.blocks, "block_drops": rd.block_drops,
        "stream_secs": round(rd.blocks * rd.cfg.blocktime, 1),
        "wall_secs": round(wall, 1),
        "realtime_margin": round(ndisp * per / wall, 3),
        "late_dispatches": late,
        "p50_ms_per_block": round(p50 * 1e3 / D, 2),
        "p99_ms_per_block": round(p99 * 1e3 / D, 2),
        "egress_overflows_after_warmup": rd.egress_overflows - overflow0,
        "open_ssrcs_on_wire": sorted(audio_ssrcs)[:8],
        "tap_ssrc": want_ssrc, "tap_tone_hz": tone_hz,
        "tap_packets": len(payloads),
        "chan_kernel": bool(g.chan_kernel),
        "build_s": round(build_s, 1), "first_dispatch_s": round(compile_s, 1),
    }
    print(json.dumps(out), flush=True)
    ok = (rd.block_drops == 0 and abs(tone_hz - 700.0) < 20
          and out["egress_overflows_after_warmup"] == 0)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
