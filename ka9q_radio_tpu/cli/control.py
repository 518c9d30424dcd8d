"""control-tpu — interactive channel control (reference control.c).

Two frontends over the same TLV transactions:

  * line mode (default): scriptable commands covering every settable key
    the daemon accepts (the full decode_radio_commands surface);
  * --tui: a curses panel like the reference's ncurses control —
    grouped windows (Tuning / Signal / Filtering / Demodulator / Output /
    RTP), live 10x/s polling, keyboard tuning with a movable digit cursor
    (arrows), preset hotkeys, and direct command entry (control.c:92-101,
    keyboard loop).

    ssrc <n>              select channel          mode <preset>   switch preset
    poll / watch [sec]    status                  demod <type>    linear/fm/wfm/spectrum
    f <freq>              tune (k/m/g ok)         samprate <r>    output rate
    low/high/shift <f>    filter edges, shift     encoding <name> s16be/opus/...
    gain/headroom <dB>    levels (gain sets AGC off)
    sqopen/sqclose <dB>   squelch                 agc on|off      linear AGC
    hang/recovery/thresh  AGC knobs               beta <b>        Kaiser beta
    pll on|off|bw <hz>|square on|off              envelope on|off
    isb on|off            independent sideband    channels 1|2    mono/stereo
    opus-bitrate/dtx/app  Opus knobs              maxdelay <n>    output agg
    rbw/bins/avg/crossover/window <v>             spectrum keys
    doppler <hz> [rate]   doppler steering        lifetime <blk>  self-destruct
    create <ssrc> <preset> <freq>                 new dynamic channel
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
from ..net.rtp import Encoding
from ..utils.parse import parse_frequency

_ONOFF = {"on": True, "yes": True, "1": True, "off": False, "no": False, "0": False}
_DEMODS = {"linear": 0, "fm": 1, "wfm": 2, "spectrum": 3}
_WINDOWS = ("kaiser", "rect", "blackman", "exact_blackman", "gaussian",
            "hann", "hamming", "blackman_harris", "hp5ft")


class Controller:
    """Socket transactions shared by the line and curses frontends."""

    def __init__(self, radio: str, ssrc: int | None = None):
        self.dest = resolve_dest(radio, DEFAULT_STAT_PORT)
        self.rx = listen_socket(self.dest)
        self.tx = output_socket(self.dest)
        self.ssrc = ssrc

    def transact(self, fields: dict, ssrc: int | None = None, timeout=2.0):
        """Send a command, return the tagged response field dict (or None)."""
        tag = random.getrandbits(31)
        fields = {T.OUTPUT_SSRC: ssrc if ssrc is not None else self.ssrc,
                  T.COMMAND_TAG: tag, **fields}
        self.tx.send(encode_status(fields, cmd=True))
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            r, _, _ = select.select([self.rx], [], [], deadline - time.monotonic())
            if not r:
                break
            pkt, _ = self.rx.recvfrom(65536)
            try:
                ptype, f, _ = decode_status(pkt)
            except Exception:
                continue
            if ptype == PacketType.STATUS and f.get(T.COMMAND_TAG) == tag:
                return f, pkt
        return None, None

    # one table drives the line commands AND documents the settable surface
    def command_fields(self, op: str, toks: list[str]) -> dict | None:
        def onoff(i=1):
            return _ONOFF[toks[i].lower()]

        if op in ("f", "freq"):
            return {T.RADIO_FREQUENCY: parse_frequency(toks[1], True)}
        if op == "low":
            return {T.LOW_EDGE: parse_frequency(toks[1])}
        if op == "high":
            return {T.HIGH_EDGE: parse_frequency(toks[1])}
        if op == "shift":
            return {T.SHIFT_FREQUENCY: parse_frequency(toks[1])}
        if op in ("mode", "preset"):
            return {T.PRESET: toks[1]}
        if op == "demod":
            return {T.DEMOD_TYPE: _DEMODS[toks[1].lower()]}
        if op == "samprate":
            return {T.OUTPUT_SAMPRATE: int(parse_frequency(toks[1]))}
        if op == "gain":
            return {T.GAIN: float(toks[1])}
        if op == "headroom":
            return {T.HEADROOM: float(toks[1])}
        if op == "sqopen":
            return {T.SQUELCH_OPEN: float(toks[1])}
        if op == "sqclose":
            return {T.SQUELCH_CLOSE: float(toks[1])}
        if op == "agc":
            return {T.AGC_ENABLE: onoff()}
        if op == "hang":
            return {T.AGC_HANGTIME: float(toks[1])}
        if op == "recovery":
            return {T.AGC_RECOVERY_RATE: float(toks[1])}
        if op == "thresh":
            return {T.AGC_THRESHOLD: float(toks[1])}
        if op == "beta":
            return {T.KAISER_BETA: float(toks[1])}
        if op == "pll":
            if toks[1].lower() == "bw":
                return {T.PLL_BW: float(toks[2])}
            if toks[1].lower() == "square":
                return {T.PLL_SQUARE: _ONOFF[toks[2].lower()]}
            return {T.PLL_ENABLE: onoff()}
        if op == "envelope":
            return {T.ENVELOPE: onoff()}
        if op == "isb":
            return {T.INDEPENDENT_SIDEBAND: onoff()}
        if op == "snr-squelch":
            return {T.SNR_SQUELCH: onoff()}
        if op == "channels":
            return {T.OUTPUT_CHANNELS: int(toks[1])}
        if op == "encoding":
            return {T.OUTPUT_ENCODING: int(Encoding[toks[1].upper()])}
        if op == "opus-bitrate":
            return {T.OPUS_BIT_RATE: int(parse_frequency(toks[1]))}
        if op == "opus-dtx":
            return {T.OPUS_DTX: onoff()}
        if op == "opus-app":
            return {T.OPUS_APPLICATION: {"voip": 2048, "audio": 2049}[toks[1].lower()]}
        if op == "maxdelay":
            return {T.MAXDELAY: int(toks[1])}
        if op == "filter2":
            return {T.FILTER2: int(toks[1])}
        if op == "rbw":
            return {T.RESOLUTION_BW: float(parse_frequency(toks[1]))}
        if op == "bins":
            return {T.BIN_COUNT: int(toks[1])}
        if op == "avg":
            return {T.SPECTRUM_AVG: int(toks[1])}
        if op == "crossover":
            return {T.CROSSOVER: float(parse_frequency(toks[1]))}
        if op == "window":
            return {T.WINDOW_TYPE: _WINDOWS.index(toks[1].lower())}
        if op == "tone":
            return {T.PL_TONE: float(toks[1])}
        if op == "doppler":
            f = {T.DOPPLER_FREQUENCY: float(toks[1])}
            if len(toks) > 2:
                f[T.DOPPLER_FREQUENCY_RATE] = float(toks[2])
            return f
        if op == "lifetime":
            # wire unit is BLOCKS (radio_status.c:678 stores it verbatim,
            # radio.c:1465 decrements per block)
            return {T.LIFETIME: int(toks[1])}
        if op == "interval":
            return {T.STATUS_INTERVAL: int(toks[1])}
        return None


# fixed layout of the tuning line: "  freq " then a 16-char right-aligned
# frequency with thousands separators — the digit-cursor/mouse map needs
# stable columns (control.c's per-digit tuning cursor)
FREQ_ROW = 2
FREQ_COL = 7
FREQ_WIDTH = 16


def freq_digit_columns(freq: float) -> list[tuple[int, float]]:
    """Screen columns of the tunable digits of the frequency display ->
    (column, step_hz). Commas/decimal point are skipped; leading spaces
    have no digit. Mirrors control.c's mouse/arrow digit tuning."""
    s = f"{freq:>{FREQ_WIDTH},.3f}"
    # place value of each char, scanning from the right: .3f -> last three
    # are milli-digits
    out = []
    place = -3
    for i in range(len(s) - 1, -1, -1):
        ch = s[i]
        if ch.isdigit():
            out.append((FREQ_COL + i, 10.0 ** place))
            place += 1
        elif ch in ",. ":
            continue
    return out


# presets shown in the panel's presets window (clickable / 'p' prompt)
PANEL_PRESETS = ("usb", "lsb", "cwu", "cwl", "am", "sam", "iq", "fm", "pm",
                 "wfm", "spectrum")


def render_panel(f: dict, width: int = 78) -> list[str]:
    """Build the TUI screen (pure: status fields -> lines) — the testable
    core of the curses panel, mirroring control.c's window set (Tuning /
    Input / Signal / Filtering / Demodulator / Options / Output /
    RTP-Status / Presets, control.c:88-101)."""
    from ..config.bandplan import band_name

    def g(key, fmt="{}", default="—"):
        v = f.get(key)
        return fmt.format(v) if v is not None else default

    freq = f.get(T.RADIO_FREQUENCY, 0.0) or 0.0
    band = band_name(float(freq)) or ""
    demod = {0: "linear", 1: "fm", 2: "wfm", 3: "spectrum"}.get(f.get(T.DEMOD_TYPE), "?")
    enc = Encoding(f[T.OUTPUT_ENCODING]).name.lower() if T.OUTPUT_ENCODING in f else "—"

    def flag(key, name):
        v = f.get(key)
        return f"[{name}]" if v else f" {name} "

    lines = [
        f"ssrc {g(T.OUTPUT_SSRC)}  {g(T.DESCRIPTION)}",
        "== Tuning " + "=" * (width - 10),
        f"  freq {freq:>{FREQ_WIDTH},.3f} Hz  {band}   shift {g(T.SHIFT_FREQUENCY)}  preset {g(T.PRESET)}",
        f"  2nd LO {g(T.SECOND_LO_FREQUENCY, '{:+.3f}')} Hz   doppler {g(T.DOPPLER_FREQUENCY, '{:+.1f}', '0')} Hz",
        "== Input " + "=" * (width - 9),
        f"  {g(T.INPUT_SAMPRATE)} sps {'real' if f.get(T.FE_ISREAL) else 'complex'}   "
        f"coverage [{g(T.FE_LOW_EDGE, '{:,.0f}')}, {g(T.FE_HIGH_EDGE, '{:,.0f}')}] Hz   "
        f"1st LO {g(T.FIRST_LO_FREQUENCY, '{:,.0f}')} Hz",
        f"  A/D {g(T.AD_BITS_PER_SAMPLE)} bit   rf gain {g(T.RF_GAIN, '{:.0f}')} dB   "
        f"overranges {g(T.AD_OVER)}   samples {g(T.INPUT_SAMPLES)}",
        "== Signal " + "=" * (width - 10),
        f"  if {g(T.IF_POWER, '{:.1f}')} dBFS   baseband {g(T.BASEBAND_POWER, '{:.1f}')} dB   "
        f"N0 {g(T.NOISE_DENSITY, '{:.1f}')} dB/Hz",
        f"  snr {g(T.FM_SNR, '{:.1f}', g(T.PLL_SNR, '{:.1f}'))} dB   out {g(T.OUTPUT_LEVEL, '{:.1f}')} dB   "
        f"gain {g(T.GAIN, '{:.1f}')} dB",
        "== Filtering " + "=" * (width - 13),
        f"  edges [{g(T.LOW_EDGE, '{:+.0f}')}, {g(T.HIGH_EDGE, '{:+.0f}')}] Hz   beta {g(T.KAISER_BETA)}   "
        f"fft {g(T.FILTER_BLOCKSIZE)}/{g(T.FILTER_FIR_LENGTH)}   drops {g(T.FILTER_DROPS)}",
        "== Demodulator " + "=" * (width - 15),
        f"  {demod}   pll {g(T.PLL_ENABLE)}/{g(T.PLL_SQUARE)} bw {g(T.PLL_BW)}   agc {g(T.AGC_ENABLE)}   "
        f"sq [{g(T.SQUELCH_OPEN, '{:.1f}')}/{g(T.SQUELCH_CLOSE, '{:.1f}')}] dB",
        f"  pll phase {g(T.PLL_PHASE, '{:+.3f}')} rad wraps {g(T.PLL_WRAPS)}   "
        f"deemph {g(T.DEEMPH_TC, '{:.0f}')} us {g(T.DEEMPH_GAIN, '{:+.1f}')} dB   "
        f"offset {g(T.FREQ_OFFSET, '{:+.1f}')} Hz",
        "== Options " + "=" * (width - 11),
        "  " + "  ".join([
            flag(T.AGC_ENABLE, "a:agc"), flag(T.PLL_ENABLE, "l:pll"),
            flag(T.PLL_SQUARE, "u:square"), flag(T.ENVELOPE, "e:env"),
            flag(T.INDEPENDENT_SIDEBAND, "i:isb"),
            flag(T.SNR_SQUELCH, "n:snrsq"), flag(T.THRESH_EXTEND, "x:ext"),
        ]),
        "== Output " + "=" * (width - 10),
        f"  {g(T.OUTPUT_SAMPRATE)} Hz x{g(T.OUTPUT_CHANNELS)} {enc}   pt {g(T.RTP_PT)}   "
        f"pkts {g(T.OUTPUT_DATA_PACKETS)}   ssrc {g(T.OUTPUT_SSRC)}",
        "== RTP/Status " + "=" * (width - 14),
        f"  beacons {g(T.OUTPUT_METADATA_PACKETS)}   cmds {g(T.CMD_CNT)}   "
        f"interval {g(T.STATUS_INTERVAL)}   input {g(T.INPUT_SAMPRATE)} sps",
        f"  data {g(T.OUTPUT_DATA_DEST_SOCKET)} <- src {g(T.OUTPUT_DATA_SOURCE_SOCKET)}   "
        f"ttl {g(T.OUTPUT_TTL)}   errs {g(T.OUTPUT_ERRORS)}",
        "== Presets " + "=" * (width - 11),
        "  " + "  ".join(PANEL_PRESETS),
    ]
    return [ln[:width] for ln in lines]


# tuning cursor steps, Hz (reference: digit-position tuning incl. the
# milli-Hz digits the .3f display carries)
_STEPS = (0.001, 0.01, 0.1, 1, 10, 100, 1_000, 10_000, 100_000, 1_000_000,
          10_000_000)

# option-toggle hotkeys (the reference's Options window toggles)
_TOGGLES = {
    ord("a"): T.AGC_ENABLE, ord("l"): T.PLL_ENABLE, ord("u"): T.PLL_SQUARE,
    ord("e"): T.ENVELOPE, ord("i"): T.INDEPENDENT_SIDEBAND,
    ord("n"): T.SNR_SQUELCH, ord("x"): T.THRESH_EXTEND,
}


def tui(ctl: Controller) -> int:
    import curses

    def loop(scr):
        curses.curs_set(0)
        scr.timeout(100)  # 10 Hz refresh
        curses.mousemask(curses.ALL_MOUSE_EVENTS)
        step_i = _STEPS.index(1_000)  # 1 kHz
        fields = {}
        last_poll = 0.0
        msg = ("arrows: tune/digit  wheel: tune  click digit/preset  "
               "a/l/u/e/i/n/x: toggles  p: preset  c: cmd  q: quit")
        while True:
            now = time.monotonic()
            if now - last_poll > 0.1:
                f, _ = ctl.transact({}, timeout=0.3)
                if f:
                    fields = f
                last_poll = now
            freq = fields.get(T.RADIO_FREQUENCY)
            scr.erase()
            lines = render_panel(fields, width=scr.getmaxyx()[1] - 1)
            presets_row = len(lines) - 1
            for i, ln in enumerate(lines):
                try:
                    scr.addstr(i, 0, ln)
                except curses.error:
                    pass
            # digit cursor: highlight the active tuning digit (control.c's
            # per-digit cursor)
            if freq is not None:
                for col, step in freq_digit_columns(float(freq)):
                    if abs(step - _STEPS[step_i]) < step * 0.01:
                        try:
                            scr.chgat(FREQ_ROW, col, 1, curses.A_REVERSE)
                        except curses.error:
                            pass
                        break
            h = scr.getmaxyx()[0]
            try:
                scr.addstr(h - 2, 0, f"step {_STEPS[step_i]:,} Hz   {msg}"[: scr.getmaxyx()[1] - 1])
            except curses.error:
                pass
            scr.refresh()
            ch = scr.getch()
            if ch == -1:
                continue
            if ch in (ord("q"), 27):
                return 0
            if ch == curses.KEY_MOUSE:
                try:
                    _, mx, my, _, bstate = curses.getmouse()
                except curses.error:
                    continue
                if bstate & getattr(curses, "BUTTON4_PRESSED", 0) and freq is not None:
                    ctl.transact({T.RADIO_FREQUENCY: float(freq) + _STEPS[step_i]}, timeout=0.5)
                elif bstate & getattr(curses, "BUTTON5_PRESSED", 0) and freq is not None:
                    ctl.transact({T.RADIO_FREQUENCY: max(float(freq) - _STEPS[step_i], 0.0)}, timeout=0.5)
                elif my == FREQ_ROW and freq is not None:
                    # click a frequency digit -> move the tuning cursor
                    for col, step in freq_digit_columns(float(freq)):
                        if col == mx and step in _STEPS:
                            step_i = _STEPS.index(step)
                            msg = f"step {step:,} Hz"
                            break
                elif my == presets_row:
                    # click a preset name -> apply it
                    line = lines[presets_row]
                    if mx < len(line) and line[mx] != " ":
                        a = line.rfind(" ", 0, mx) + 1
                        b = line.find(" ", mx)
                        name = line[a:b if b > 0 else None]
                        if name in PANEL_PRESETS:
                            ctl.transact({T.PRESET: name}, timeout=15.0)
                            msg = f"preset {name}"
                continue
            if ch in _TOGGLES:
                key = _TOGGLES[ch]
                ctl.transact({key: not bool(fields.get(key))}, timeout=15.0)
                msg = f"toggled {key.name.lower()}"
                continue
            if ch in (curses.KEY_UP, curses.KEY_DOWN) and freq is None:
                msg = "no status yet - tuning keys ignored"
            elif ch == curses.KEY_UP:
                ctl.transact({T.RADIO_FREQUENCY: float(freq) + _STEPS[step_i]}, timeout=0.5)
            elif ch == curses.KEY_DOWN:
                ctl.transact({T.RADIO_FREQUENCY: max(float(freq) - _STEPS[step_i], 0.0)}, timeout=0.5)
            elif ch == curses.KEY_LEFT:
                step_i = min(step_i + 1, len(_STEPS) - 1)
            elif ch == curses.KEY_RIGHT:
                step_i = max(step_i - 1, 0)
            elif ch in (ord("p"), ord("c")):
                curses.echo()
                scr.addstr(h - 1, 0, "preset: " if ch == ord("p") else "cmd: ")
                scr.refresh()
                line = scr.getstr(h - 1, 8 if ch == ord("p") else 5).decode()
                curses.noecho()
                if ch == ord("p") and line.strip():
                    ctl.transact({T.PRESET: line.strip()})
                elif line.strip():
                    toks = line.split()
                    try:
                        cf = ctl.command_fields(toks[0].lower(), toks)
                        if cf:
                            ctl.transact(cf)
                            msg = f"sent {toks[0]}"
                        else:
                            msg = f"unknown: {toks[0]}"
                    except (KeyError, ValueError, IndexError) as e:
                        msg = f"bad command: {e}"

    return curses.wrapper(loop)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="control-tpu")
    ap.add_argument("--radio", default=None)
    ap.add_argument("--browse", action="store_true", help="discover radiods via mDNS")
    ap.add_argument("--ssrc", type=int, default=None)
    ap.add_argument("--tui", action="store_true", help="full-screen curses panel")
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

    ctl = Controller(args.radio, args.ssrc)
    if args.tui:
        if ctl.ssrc is None:
            ap.error("--tui needs --ssrc")
        return tui(ctl)

    def run_cmd(line: str) -> bool:
        toks = line.split()
        if not toks:
            return True
        op = toks[0].lower()
        if op in ("quit", "exit", "q"):
            return False
        if op == "ssrc" and len(toks) > 1:
            ctl.ssrc = int(toks[1])
            return True
        if op == "create" and len(toks) > 3:
            # dynamic channel: command an unknown ssrc w/ preset+freq
            f, pkt = ctl.transact({T.PRESET: toks[2],
                                   T.RADIO_FREQUENCY: parse_frequency(toks[3], True)},
                                  ssrc=int(toks[1]), timeout=30.0)
            if pkt:
                print(dump_text(pkt))
            else:
                print("(no response)", file=sys.stderr)
            return True
        if ctl.ssrc is None:
            print("select a channel first: ssrc <n>", file=sys.stderr)
            return True
        if op == "poll":
            f, pkt = ctl.transact({})
            if pkt:
                freq = f.get(T.RADIO_FREQUENCY)
                if freq:
                    from ..config.bandplan import band_name
                    b = band_name(float(freq))
                    if b:
                        print(f"[{b}]")
                print(dump_text(pkt))
            else:
                print("(no response)", file=sys.stderr)
            return True
        if op == "panel":
            f, _ = ctl.transact({})
            if f:
                print("\n".join(render_panel(f)))
            return True
        if op == "watch":
            until = time.monotonic() + (float(toks[1]) if len(toks) > 1 else 5.0)
            while time.monotonic() < until:
                r, _, _ = select.select([ctl.rx], [], [], 0.25)
                if r:
                    pkt, _ = ctl.rx.recvfrom(65536)
                    try:
                        _, f, _ = decode_status(pkt)
                        if f.get(T.OUTPUT_SSRC) == ctl.ssrc:
                            print(dump_text(pkt))
                    except Exception:
                        pass
            return True
        try:
            fields = ctl.command_fields(op, toks)
        except (KeyError, ValueError, IndexError) as e:
            print(f"bad command: {e}", file=sys.stderr)
            return True
        if fields is None:
            print(f"unknown command {op!r}", file=sys.stderr)
            return True
        _, pkt = ctl.transact(fields, timeout=15.0)
        if pkt:
            print(dump_text(pkt))
        else:
            print("(no response)", file=sys.stderr)
        return True

    if args.command:
        for c in args.command:
            if not run_cmd(c):
                break
        return 0
    while True:
        try:
            line = input(f"control[{ctl.ssrc}]> ")
        except EOFError:
            break
        if not run_cmd(line):
            break
    return 0


if __name__ == "__main__":
    sys.exit(main())
