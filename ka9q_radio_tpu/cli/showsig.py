"""show-sig-tpu — live signal readout for one channel (show-sig.c).

Polls a channel and prints the key levels each interval.

    show-sig-tpu --radio test.local --ssrc 200 [--interval 1] [--count N]
"""
from __future__ import annotations

import argparse
import random
import select
import sys
import time

from ..net.status import StatusType as T, PacketType, encode_status, decode_status
from ..net.multicast import resolve_dest, output_socket, listen_socket, DEFAULT_STAT_PORT


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="show-sig-tpu")
    ap.add_argument("--radio", required=True)
    ap.add_argument("--ssrc", type=int, required=True)
    ap.add_argument("--interval", type=float, default=1.0)
    ap.add_argument("--count", type=int, default=None)
    ap.add_argument("--timeout", type=float, default=2.0)
    args = ap.parse_args(argv)

    dest = resolve_dest(args.radio, DEFAULT_STAT_PORT)
    rx = listen_socket(dest)
    tx = output_socket(dest)
    n = 0
    try:
        while args.count is None or n < args.count:
            tag = random.getrandbits(31)
            tx.send(encode_status({T.OUTPUT_SSRC: args.ssrc, T.COMMAND_TAG: tag}, cmd=True))
            deadline = time.monotonic() + args.timeout
            f = None
            while time.monotonic() < deadline:
                r, _, _ = select.select([rx], [], [], deadline - time.monotonic())
                if not r:
                    break
                pkt, _ = rx.recvfrom(65536)
                try:
                    ptype, ff, _ = decode_status(pkt)
                except Exception:
                    continue
                if ptype == PacketType.STATUS and ff.get(T.COMMAND_TAG) == tag:
                    f = ff
                    break
            if f is None:
                print("no response", file=sys.stderr)
            else:
                snr = f.get(T.FM_SNR, f.get(T.PLL_SNR))
                snr_s = f"snr {snr:6.1f} dB" if snr is not None else ""
                print(
                    f"{f.get(T.RADIO_FREQUENCY, 0):>12.0f} Hz  "
                    f"bb {f.get(T.BASEBAND_POWER, 0):7.1f} dB  "
                    f"n0 {f.get(T.NOISE_DENSITY, 0):7.1f} dB/Hz  "
                    f"out {f.get(T.OUTPUT_LEVEL, 0):7.1f} dB  {snr_s}",
                    flush=True,
                )
            n += 1
            if args.count is None or n < args.count:
                time.sleep(args.interval)
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
