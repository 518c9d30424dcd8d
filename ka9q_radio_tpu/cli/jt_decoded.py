"""jt-decoded-tpu — FT8/FT4/WSPR clip recorder + decoder spawner
(jt-decoded.c).

Records each SSRC's audio into UTC-cycle-aligned WAV clips (15 s for FT8,
7.5 s for FT4, 120 s for WSPR) and optionally spawns an external decoder
(wsjtx's jt9/wsprd) on each completed clip.

    jt-decoded-tpu --data ft8-pcm.local --mode ft8 --dir /tmp/clips
                   [--exec "jt9 -8 -d 3 {file}"] [--duration N]
"""
from __future__ import annotations

import argparse
import os
import select
import shlex
import subprocess
import sys
import time
import wave

import numpy as np

from ..net.rtp import RtpHeader, Encoding, PayloadRegistry, decode_samples
from ..net.multicast import resolve_dest, listen_socket, DEFAULT_RTP_PORT

CYCLES = {"ft8": 15.0, "ft4": 7.5, "wspr": 120.0}


class Clip:
    def __init__(self, outdir: str, ssrc: int, cycle_start: float, samprate: int):
        ts = time.strftime("%Y%m%dT%H%M%S", time.gmtime(cycle_start))
        self.path = os.path.join(outdir, f"{ts}_ssrc{ssrc}.wav")
        self.w = wave.open(self.path, "wb")
        self.w.setnchannels(1)
        self.w.setsampwidth(2)
        self.w.setframerate(samprate)

    def write(self, audio: np.ndarray):
        self.w.writeframes(np.rint(np.clip(audio * 32767, -32768, 32767)).astype("<i2").tobytes())

    def close(self) -> str:
        self.w.close()
        return self.path


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="jt-decoded-tpu")
    ap.add_argument("--data", required=True)
    ap.add_argument("--mode", choices=sorted(CYCLES), default="ft8")
    ap.add_argument("--dir", default=".")
    ap.add_argument("--exec", dest="exec_cmd", default=None,
                    help="command per clip; {file} substituted")
    ap.add_argument("--duration", type=float, default=None)
    args = ap.parse_args(argv)

    cycle = CYCLES[args.mode]
    rx = listen_socket(resolve_dest(args.data, DEFAULT_RTP_PORT))
    registry = PayloadRegistry()
    clips: dict[int, Clip] = {}
    rates: dict[int, int] = {}
    cur_cycle = None
    t_end = time.monotonic() + args.duration if args.duration else None

    def roll(now: float):
        nonlocal cur_cycle
        start = (now // cycle) * cycle
        if start == cur_cycle:
            return
        for ssrc, clip in clips.items():
            path = clip.close()
            print(f"clip {path}", flush=True)
            if args.exec_cmd:
                cmd = args.exec_cmd.replace("{file}", path)
                subprocess.Popen(shlex.split(cmd))
        clips.clear()
        cur_cycle = start

    try:
        while t_end is None or time.monotonic() < t_end:
            roll(time.time())
            r, _, _ = select.select([rx], [], [], 0.2)
            if not r:
                continue
            pkt, _ = rx.recvfrom(65536)
            try:
                h, payload = RtpHeader.unpack(pkt)
            except Exception:
                continue
            fmt = registry.info_from_pt(h.type)
            if fmt is None:
                continue
            samprate, channels, enc = fmt
            rates[h.ssrc] = samprate
            clip = clips.get(h.ssrc)
            if clip is None:
                clip = clips[h.ssrc] = Clip(args.dir, h.ssrc, (time.time() // cycle) * cycle, samprate)
            audio = decode_samples(payload, enc)
            if channels == 2:
                audio = audio[0::2]
            clip.write(audio)
    except KeyboardInterrupt:
        pass
    for clip in clips.values():
        print(f"clip {clip.close()}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
