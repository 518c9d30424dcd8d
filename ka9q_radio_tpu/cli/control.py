"""control-tpu — interactive channel control (reference control.c).

A line-oriented counterpart of the reference's ncurses panel: poll any
channel, watch its status keys, and set parameters. Commands:

    ssrc <n>            select channel
    poll                poll and display status
    f <freq>            set frequency (k/m/g accepted)
    low <f> / high <f>  filter edges
    gain/headroom/sqopen/sqclose <dB>
    watch [sec]         stream beacons for a while
    quit
"""
from __future__ import annotations

import argparse
import random
import select
import sys
import time

from ..net.status import StatusType as T, PacketType, encode_status, decode_status, dump_text
from ..net.multicast import resolve_dest, output_socket, listen_socket, DEFAULT_STAT_PORT
from ..utils.parse import parse_frequency


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="control-tpu")
    ap.add_argument("--radio", default=None)
    ap.add_argument("--browse", action="store_true", help="discover radiods via mDNS")
    ap.add_argument("--ssrc", type=int, default=None)
    ap.add_argument("-c", "--command", action="append", default=None,
                    help="run commands non-interactively")
    args = ap.parse_args(argv)

    if args.browse:
        from ..net.mdns import browse as mdns_browse, SVC_CTL
        for e in mdns_browse(SVC_CTL, timeout=2.0):
            txt = " ".join(f"{k}={v}" for k, v in e.get("txt", {}).items())
            print(f"{e.get('instance')}  {e.get('addr')}:{e.get('port')}  {txt}")
        return 0
    if not args.radio:
        ap.error("--radio required (or use --browse)")

    dest = resolve_dest(args.radio, DEFAULT_STAT_PORT)
    rx = listen_socket(dest)
    tx = output_socket(dest)
    ssrc = args.ssrc

    def transact(fields: dict, timeout=2.0) -> bool:
        tag = random.getrandbits(31)
        fields = {T.OUTPUT_SSRC: ssrc, T.COMMAND_TAG: tag, **fields}
        tx.send(encode_status(fields, cmd=True))
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            r, _, _ = select.select([rx], [], [], deadline - time.monotonic())
            if not r:
                break
            pkt, _ = rx.recvfrom(65536)
            try:
                ptype, f, _ = decode_status(pkt)
            except Exception:
                continue
            if ptype == PacketType.STATUS and f.get(T.COMMAND_TAG) == tag:
                freq = f.get(T.RADIO_FREQUENCY)
                if freq:
                    from ..config.bandplan import band_name
                    b = band_name(float(freq))
                    if b:
                        print(f"[{b}]")
                print(dump_text(pkt))
                return True
        print("(no response)", file=sys.stderr)
        return False

    def run_cmd(line: str) -> bool:
        nonlocal ssrc
        toks = line.split()
        if not toks:
            return True
        op = toks[0].lower()
        if op in ("quit", "exit", "q"):
            return False
        if op == "ssrc" and len(toks) > 1:
            ssrc = int(toks[1])
            return True
        if ssrc is None:
            print("select a channel first: ssrc <n>", file=sys.stderr)
            return True
        if op == "poll":
            transact({})
        elif op in ("f", "freq") and len(toks) > 1:
            transact({T.RADIO_FREQUENCY: parse_frequency(toks[1], True)})
        elif op == "low" and len(toks) > 1:
            transact({T.LOW_EDGE: parse_frequency(toks[1])})
        elif op == "high" and len(toks) > 1:
            transact({T.HIGH_EDGE: parse_frequency(toks[1])})
        elif op == "gain" and len(toks) > 1:
            transact({T.GAIN: float(toks[1])})
        elif op == "headroom" and len(toks) > 1:
            transact({T.HEADROOM: float(toks[1])})
        elif op == "sqopen" and len(toks) > 1:
            transact({T.SQUELCH_OPEN: float(toks[1])})
        elif op == "sqclose" and len(toks) > 1:
            transact({T.SQUELCH_CLOSE: float(toks[1])})
        elif op == "watch":
            until = time.monotonic() + (float(toks[1]) if len(toks) > 1 else 5.0)
            while time.monotonic() < until:
                r, _, _ = select.select([rx], [], [], 0.25)
                if r:
                    pkt, _ = rx.recvfrom(65536)
                    try:
                        _, f, _ = decode_status(pkt)
                        if f.get(T.OUTPUT_SSRC) == ssrc:
                            print(dump_text(pkt))
                    except Exception:
                        pass
        else:
            print(f"unknown command {op!r}", file=sys.stderr)
        return True

    if args.command:
        for c in args.command:
            if not run_cmd(c):
                break
        return 0
    while True:
        try:
            line = input(f"control[{ssrc}]> ")
        except EOFError:
            break
        if not run_cmd(line):
            break
    return 0


if __name__ == "__main__":
    sys.exit(main())
