"""powers-tpu — spectrum bin-power poller (reference powers.c).

Polls a SPECT_DEMOD channel and prints rtl_power-style CSV lines:
date, time, hz_low, hz_high, hz_bin_width, num_bins, dB, dB, ...

    powers-tpu --radio test.local --ssrc 1000 [--count 1] [--interval 1.0]
"""
from __future__ import annotations

import argparse
import datetime
import random
import select
import sys
import time

import numpy as np

from ..net.status import StatusType as T, PacketType, encode_status, decode_status
from ..net.multicast import resolve_dest, output_socket, listen_socket, DEFAULT_STAT_PORT


def poll_once(tx, rx, ssrc: int, timeout: float):
    tag = random.getrandbits(31)
    tx.send(encode_status({T.OUTPUT_SSRC: ssrc, T.COMMAND_TAG: tag}, cmd=True))
    deadline = time.monotonic() + timeout
    while True:
        left = deadline - time.monotonic()
        if left <= 0:
            return None
        r, _, _ = select.select([rx], [], [], left)
        if not r:
            return None
        pkt, _ = rx.recvfrom(65536)
        try:
            ptype, f, _ = decode_status(pkt)
        except Exception:
            continue
        if ptype == PacketType.STATUS and f.get(T.OUTPUT_SSRC) == ssrc \
                and (T.BIN_DATA in f or T.BIN_RICE_DATA in f):
            return f


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="powers-tpu")
    ap.add_argument("--radio", required=True)
    ap.add_argument("--ssrc", type=int, required=True)
    ap.add_argument("--count", type=int, default=1)
    ap.add_argument("--frequency", "-f", help="retune the spectrum channel first")
    ap.add_argument("--bins", "-b", type=int, help="set bin count")
    ap.add_argument("--bin-width", "-w", type=float, help="set resolution bandwidth, Hz")
    ap.add_argument("--details", "-d", action="store_true",
                    help="one 'bin frequency dB' line per bin (powers.c -d)")
    ap.add_argument("--interval", type=float, default=1.0)
    ap.add_argument("--timeout", type=float, default=2.0)
    args = ap.parse_args(argv)

    dest = resolve_dest(args.radio, DEFAULT_STAT_PORT)
    rx = listen_socket(dest)
    tx = output_socket(dest)

    # configure/create the sweep first (powers.c -f/-b/-w: unknown SSRC +
    # PRESET=spectrum creates a dynamic spectrum channel server-side)
    setup = {}
    if args.frequency is not None:
        from ..utils.parse import parse_frequency
        setup[T.RADIO_FREQUENCY] = parse_frequency(args.frequency, True)
        setup[T.PRESET] = "spectrum"
    if args.bins is not None:
        setup[T.BIN_COUNT] = args.bins
    if args.bin_width is not None:
        setup[T.RESOLUTION_BW] = args.bin_width
    if setup:
        setup[T.OUTPUT_SSRC] = args.ssrc
        setup[T.COMMAND_TAG] = random.getrandbits(31)
        tx.send(encode_status(setup, cmd=True))
        time.sleep(0.2)  # let the sweep accumulate frames

    for k in range(args.count):
        f = poll_once(tx, rx, args.ssrc, args.timeout)
        if f is None:
            print("no response", file=sys.stderr)
            return 1
        if T.BIN_RICE_DATA in f:
            # Rice-coded quantized levels (net/rice.py) — already
            # lowest-frequency-first like BIN_BYTE_DATA
            from ..net.rice import rice_decode, dequantize_bins
            n = int(f.get(T.BIN_COUNT, 0))
            lv = rice_decode(bytes(f[T.BIN_RICE_DATA]), n)
            dbq = dequantize_bins(lv, float(f.get(T.SPECTRUM_BASE, -120.0)),
                                  float(f.get(T.SPECTRUM_STEP, 0.5)))
            bins = 10.0 ** (dbq / 10.0)
        else:
            bins = np.asarray(f[T.BIN_DATA], np.float64)
            # BIN_DATA arrives in FFT order (powers.c); rotate lowest-first
            bins = np.roll(bins, bins.size // 2)
        rbw = float(f.get(T.RESOLUTION_BW, 0.0))
        freq = float(f.get(T.RADIO_FREQUENCY, 0.0))
        n = bins.size
        lo = freq - rbw * (n // 2)
        hi = lo + rbw * n
        now = datetime.datetime.now(datetime.timezone.utc)
        db = 10.0 * np.log10(np.maximum(bins, 1e-30))
        if args.details:
            print()
            for i, x in enumerate(db):
                print(f"{i} {lo + i * rbw:.6f} {x:.2f}")
        else:
            print(
                f"{now:%Y-%m-%d},{now:%H:%M:%S},{lo:.0f},{hi:.0f},{rbw:.2f},{n},"
                + ",".join(f"{x:.2f}" for x in db)
            )
        if k + 1 < args.count:
            time.sleep(args.interval)
    return 0


if __name__ == "__main__":
    sys.exit(main())
