"""Capture golden outputs from the REAL reference radiod.

Builds /root/reference radiod (CPU, via the shims in this directory), runs
it against its sig_gen front end on the BASELINE scenarios, captures the
RTP audio and TLV status beacons off the multicast groups with our own
client stack, and writes tests/golden/ref_<name>.npz.

tests/test_reference_parity.py then runs OUR radiod on the *same config
file* and asserts the BASELINE.md acceptance bound (outputs within 0.1 dB
of radiod/sig_gen).

Usage:  python reference_build/capture_golden.py [seconds]
"""
from __future__ import annotations

import os
import json
import select
import signal
import subprocess
import sys
import time

import numpy as np

os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "reference_build"))
BUILD = "/tmp/refbuild"
GOLDEN_DIR = os.path.join(REPO, "tests", "golden")

# Scenarios: the SAME ini drives the reference radiod and (in the parity
# test) our radiod. BASELINE.md configs #1 (NBFM) and #2 (linear w/ AGC).
# 512 ksps complex master: N = 12800 = 2^9*5^2 (fast for the FFT shim).
SIGGEN = """
[sig_gen]
device = sig_gen
samprate = 512k
complex = yes
carrier = {carrier}
amplitude = -20
noise = -140
"""

SCENARIOS = {
    # carrier inside the NBFM passband: quiet discriminator, strong SNR
    "nbfm": dict(
        carrier="100k",
        conf="""
[global]
hardware = sig_gen
status = {stat}
data = {data}
update = 10
ttl = 1
advertise = no
{siggen}
[chan]
mode = nfm
samprate = 12k
freq = 100k
""",
        ssrcs=[100],
    ),
    # 8 USB channels; the carrier lands 1 kHz into channel 50k's passband
    "linear8": dict(
        carrier="51k",
        conf="""
[global]
hardware = sig_gen
status = {stat}
data = {data}
update = 10
ttl = 1
advertise = no
{siggen}
[hf]
mode = usb
samprate = 12k
freq = 50k0 60k0 70k0 80k0 90k0 110k0 120k0 130k0
""",
        ssrcs=[50, 60, 70, 80, 90, 110, 120, 130],
    ),
}

# WFM stereo: the composite is synthesized offline (reference sig_gen can't
# FM-modulate, sig_gen.c:291) and played through the file.so plugin front
# end — see wfm_scene.py for the scene. Needs >= 7 s of capture to span the
# stereo->mono pilot-gate transition at t=3 s in the 6 s looping file.
import wfm_scene  # noqa: E402  (same directory)

SCENARIOS["wfm"] = dict(
    carrier=None,
    conf=wfm_scene.CONF,
    ssrcs=[wfm_scene.SSRC],
    path_hook=wfm_scene.write_composite,
    min_seconds=8.0,
)

KEEP_KEYS = [  # TLV keys captured per ssrc (engineering units, see status.h)
    "NOISE_DENSITY", "BASEBAND_POWER", "OUTPUT_LEVEL", "GAIN", "FM_SNR",
    "PLL_SNR", "OUTPUT_SAMPRATE", "LOW_EDGE", "HIGH_EDGE", "RADIO_FREQUENCY",
    "DEMOD_TYPE", "OUTPUT_ENCODING", "IF_POWER",
]


def build():
    if not os.path.exists(os.path.join(BUILD, "radiod")):
        subprocess.run(["bash", os.path.join(REPO, "reference_build", "build_reference.sh"),
                        BUILD], check=True)


def capture(name: str, sc: dict, seconds: float):
    from ka9q_radio_tpu.net.multicast import resolve_dest, listen_socket
    from ka9q_radio_tpu.net.status import decode_status, StatusType, PacketType
    from ka9q_radio_tpu.net.rtp import RtpHeader

    tag = f"gold-{name}-{os.getpid()}"
    stat, data = f"{tag}-st.local", f"{tag}-pcm.local"
    fmt = dict(stat=stat, data=data)
    if sc.get("path_hook"):
        fmt["path"] = sc["path_hook"](f"/tmp/{tag}.cf32")
    else:
        fmt["siggen"] = SIGGEN.format(carrier=sc["carrier"])
    conf = sc["conf"].format(**fmt)
    seconds = max(seconds, sc.get("min_seconds", 0.0))
    cfile = f"/tmp/{tag}.conf"
    with open(cfile, "w") as f:
        f.write(conf)

    errlog = open(f"/tmp/{tag}.err", "wb")  # NOT a pipe: radiod must never
    env = dict(os.environ)                  # block on stderr
    # keep radiod off SCHED_FIFO: this container's cgroup has no RT runtime,
    # so a FIFO thread (we run as root) is runnable but never scheduled
    env["LD_PRELOAD"] = os.path.join(BUILD, "nort.so")
    proc = subprocess.Popen([os.path.join(BUILD, "radiod"), cfile],
                            stdout=subprocess.DEVNULL, stderr=errlog, env=env)
    try:
        time.sleep(2.0)  # filters warm up; skip the turn-on transient
        if proc.poll() is not None:
            sys.stderr.write(open(f"/tmp/{tag}.err").read())
            raise RuntimeError(f"reference radiod exited {proc.returncode}")
        rtp_sock = listen_socket(resolve_dest(data, 5004))
        # periodic per-channel beacons ride the OUTPUT stream's status port
        # (radio.c response(): chan->status.dest_socket), not the control
        # group — the control group only answers polls
        st_sock = listen_socket(resolve_dest(data, 5006))
        audio: dict[int, list[bytes]] = {}
        pts: dict[int, int] = {}
        status: dict[int, dict] = {}
        t_end = time.time() + seconds
        while time.time() < t_end:
            r, _, _ = select.select([rtp_sock, st_sock], [], [], 0.5)
            for s in r:
                pkt, _ = s.recvfrom(65536)
                if s is rtp_sock:
                    try:
                        h, payload = RtpHeader.unpack(pkt)
                    except Exception:
                        continue
                    audio.setdefault(h.ssrc, []).append(payload)
                    pts[h.ssrc] = h.type
                    # per-PT split: channels can change mid-stream (WFM
                    # mono fallback switches the payload type, wfm.c:266)
                    audio.setdefault((h.ssrc, h.type), []).append(payload)
                else:
                    try:
                        ptype, fields, _ = decode_status(pkt)
                    except Exception:
                        continue
                    if ptype != PacketType.STATUS:
                        continue
                    ssrc = fields.get(StatusType.OUTPUT_SSRC)
                    if ssrc is None:
                        continue
                    d = status.setdefault(int(ssrc), {})
                    for k in KEEP_KEYS:
                        v = fields.get(StatusType[k])
                        if v is not None:
                            d.setdefault(k, []).append(float(v))
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(3)
        except subprocess.TimeoutExpired:
            proc.kill()

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    out = {}
    for ssrc in sc["ssrcs"]:
        raw = b"".join(audio.get(ssrc, []))
        out[f"audio_{ssrc}"] = np.frombuffer(raw, ">i2").astype(np.int16)
        out[f"pt_{ssrc}"] = np.int32(pts.get(ssrc, -1))
        for key in audio:
            if isinstance(key, tuple) and key[0] == ssrc:
                raw = b"".join(audio[key])
                out[f"audio_{ssrc}_pt{key[1]}"] = np.frombuffer(raw, ">i2").astype(np.int16)
    # status: keep the tail-half mean of each metric (settled values)
    stat_json = {}
    for ssrc, d in status.items():
        stat_json[str(ssrc)] = {k: float(np.mean(v[len(v) // 2:])) for k, v in d.items()}
    out["status_json"] = np.frombuffer(json.dumps(stat_json).encode(), np.uint8)
    out["conf"] = np.frombuffer(conf.encode(), np.uint8)
    path = os.path.join(GOLDEN_DIR, f"ref_{name}.npz")
    np.savez_compressed(path, **out)
    n_aud = {s: out[f"audio_{s}"].size for s in sc["ssrcs"]}
    print(f"{name}: wrote {path}; audio samples {n_aud}; status ssrcs {list(stat_json)}")


def main():
    args = sys.argv[1:]
    names = [a for a in args if not a.replace(".", "").isdigit()]
    secs = [float(a) for a in args if a.replace(".", "").isdigit()]
    seconds = secs[0] if secs else 6.0
    build()
    for name, sc in SCENARIOS.items():
        if names and name not in names:
            continue
        capture(name, sc, seconds)


if __name__ == "__main__":
    main()
