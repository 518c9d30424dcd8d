"""tune-tpu — one-shot TLV tune/poll client (reference tune.c).

    tune-tpu --radio test.local --ssrc 200 [--frequency 7m040] [--low -3k]
             [--high 3k] [--gain 20] [--poll-only] [--timeout 2]
"""
from __future__ import annotations

import argparse
import random
import select
import sys

from ..net.status import StatusType as T, PacketType, encode_status, decode_status, dump_text
from ..net.multicast import resolve_dest, output_socket, listen_socket, DEFAULT_STAT_PORT
from ..utils.parse import parse_frequency


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="tune-tpu")
    ap.add_argument("--radio", required=True, help="radiod status stream name/addr")
    ap.add_argument("--ssrc", type=int, required=True)
    ap.add_argument("--frequency", "-f")
    ap.add_argument("--low")
    ap.add_argument("--high")
    ap.add_argument("--gain", type=float)
    ap.add_argument("--headroom", type=float)
    ap.add_argument("--squelch-open", type=float)
    ap.add_argument("--squelch-close", type=float)
    ap.add_argument("--shift", type=float)
    ap.add_argument("--mode", "-m", help="preset name (usb/lsb/am/nfm/...)")
    ap.add_argument("--samprate", "-r", help="output sample rate")
    ap.add_argument("--encoding", "-e", help="s16be/s16le/f32le/opus/...")
    ap.add_argument("--agc", type=int, choices=(0, 1))
    ap.add_argument("--lifetime", "-t", type=float,
                    help="dynamic channel idle lifetime, seconds")
    ap.add_argument("--timeout", type=float, default=2.0)
    args = ap.parse_args(argv)

    tag = random.getrandbits(31)
    fields = {T.OUTPUT_SSRC: args.ssrc, T.COMMAND_TAG: tag}
    if args.frequency is not None:
        fields[T.RADIO_FREQUENCY] = parse_frequency(args.frequency, True)
    if args.low is not None:
        fields[T.LOW_EDGE] = parse_frequency(args.low)
    if args.high is not None:
        fields[T.HIGH_EDGE] = parse_frequency(args.high)
    if args.gain is not None:
        fields[T.GAIN] = args.gain
    if args.headroom is not None:
        fields[T.HEADROOM] = args.headroom
    if args.mode is not None:
        fields[T.PRESET] = args.mode
    if args.samprate is not None:
        fields[T.OUTPUT_SAMPRATE] = int(round(parse_frequency(args.samprate)))
    if args.encoding is not None:
        from ..net.rtp import Encoding
        fields[T.OUTPUT_ENCODING] = int(Encoding[args.encoding.upper()])
    if args.agc is not None:
        fields[T.AGC_ENABLE] = bool(args.agc)
    if args.lifetime is not None:
        fields[T.LIFETIME] = int(args.lifetime * 50)  # blocks (20 ms)
    if args.squelch_open is not None:
        fields[T.SQUELCH_OPEN] = args.squelch_open
    if args.squelch_close is not None:
        fields[T.SQUELCH_CLOSE] = args.squelch_close
    if args.shift is not None:
        fields[T.SHIFT_FREQUENCY] = args.shift

    dest = resolve_dest(args.radio, DEFAULT_STAT_PORT)
    rx = listen_socket(dest)
    tx = output_socket(dest)
    tx.send(encode_status(fields, cmd=True))

    r, _, _ = select.select([rx], [], [], args.timeout)
    while r:
        pkt, _ = rx.recvfrom(65536)
        try:
            ptype, f, _ = decode_status(pkt)
        except Exception:
            continue
        if ptype == PacketType.STATUS and f.get(T.OUTPUT_SSRC) == args.ssrc and f.get(T.COMMAND_TAG) == tag:
            print(dump_text(pkt))
            return 0
        r, _, _ = select.select([rx], [], [], args.timeout)
    print("no response", file=sys.stderr)
    return 1


def main_setfilt(argv=None) -> int:
    """setfilt-tpu — set predetection filter edges (reference setfilt.c).

    Positional low/high in Hz; a leading ``m`` means minus (setfilt.c:102-107
    — getopt eats a bare ``-`` so the reference spells -3000 as m3000).
    Edges are swapped if given out of order, like setfilt.c:110-114. The
    reference marks the tool obsolete in favor of tune; this is a thin
    front end over the same TLV command path.
    """
    if argv is None:
        argv = sys.argv[1:]
    ap = argparse.ArgumentParser(prog="setfilt-tpu")
    ap.add_argument("--radio", "-r", required=True, help="radiod status stream name/addr")
    ap.add_argument("--ssrc", "-s", type=int, required=True)
    ap.add_argument("--verbose", "-v", action="store_true")
    ap.add_argument("--timeout", type=float, default=2.0)
    ap.add_argument("low", help="low edge, Hz (m prefix = negative)")
    ap.add_argument("high", help="high edge, Hz (m prefix = negative)")
    args = ap.parse_args(argv)

    def edge(s: str) -> float:
        if s and s[0] in "mM":
            s = "-" + s[1:]
        return parse_frequency(s)

    lo, hi = edge(args.low), edge(args.high)
    if lo > hi:
        lo, hi = hi, lo
    rc = main(["--radio", args.radio, "--ssrc", str(args.ssrc),
               "--low", repr(lo), "--high", repr(hi),
               "--timeout", repr(args.timeout)])
    return rc


if __name__ == "__main__":
    sys.exit(main())
