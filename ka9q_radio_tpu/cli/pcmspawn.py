"""pcmspawn-tpu — spawn a command per RTP session with PCM on stdin
(pcmspawn.c). Useful for piping each channel into an external decoder.

    pcmspawn-tpu --data pcm.local -- command args...   ({ssrc} substituted)
"""
from __future__ import annotations

import argparse
import select
import shlex
import subprocess
import sys
import time

import numpy as np

from ..net.rtp import RtpHeader, Encoding, PayloadRegistry, decode_samples
from ..net.multicast import resolve_dest, listen_socket, DEFAULT_RTP_PORT


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="pcmspawn-tpu")
    ap.add_argument("--data", required=True)
    ap.add_argument("--duration", type=float, default=None)
    ap.add_argument("command", nargs=argparse.REMAINDER)
    args = ap.parse_args(argv)
    cmd = [c for c in args.command if c != "--"]
    if not cmd:
        print("no command given", file=sys.stderr)
        return 1

    rx = listen_socket(resolve_dest(args.data, DEFAULT_RTP_PORT))
    registry = PayloadRegistry()
    procs: dict[int, subprocess.Popen] = {}
    t_end = time.monotonic() + args.duration if args.duration else None
    try:
        while t_end is None or time.monotonic() < t_end:
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
            p = procs.get(h.ssrc)
            if p is None:
                c = [tok.replace("{ssrc}", str(h.ssrc)) for tok in cmd]
                p = procs[h.ssrc] = subprocess.Popen(c, stdin=subprocess.PIPE)
                print(f"spawned {shlex.join(c)} for ssrc {h.ssrc}", file=sys.stderr)
            audio = decode_samples(payload, fmt[2])
            pcm = np.rint(np.clip(audio * 32767, -32768, 32767)).astype("<i2")
            try:
                p.stdin.write(pcm.tobytes())
                p.stdin.flush()
            except (BrokenPipeError, OSError):
                procs.pop(h.ssrc, None)
    except KeyboardInterrupt:
        pass
    for p in procs.values():
        try:
            p.stdin.close()
            p.wait(timeout=2)
        except Exception:
            p.kill()
    return 0


if __name__ == "__main__":
    sys.exit(main())
