"""monitor-tpu — real-time multicast audio monitor (reference monitor.c).

The data engine (net/playout.py) is the reference's per-session pipeline:
a 2.73 s playout ring written at RTP-timestamp positions (out-of-order
packets land in place), Opus packet-loss concealment, per-session clock
tracking via a slewed resampling ratio, and a mixer "callback" that pulls
every session's ring at a common playout clock (monitor-data.c:525-758,
monitor.c:642). Without portaudio in this environment the mixed stereo
stream goes to raw s16le stdout (pipe into aplay/ffplay) and/or a WAV
file, paced by wall clock in --live mode.

    monitor-tpu --data test-pcm.local [--wav out.wav] [--raw] [--live]
                [--duration 5] [--samprate 48000] [--gain ssrc=dB ...]
                [--vote] [--notch] [--quiet] [--tui]

--tui adds the reference's ncurses session display (monitor-display.c):
one row per session with a level meter, drop/late counters and SNR;
up/down selects a session, +/- trims its gain, l/r pans, m mutes.

--device [DEV] plays the mix on a sound device by piping into whichever
system player exists (aplay/pacat/play) — the portaudio-less form of the
reference's direct DAC output (monitor.c:642).
"""
from __future__ import annotations

import argparse
import select
import sys
import time

import numpy as np

from ..net.rtp import RtpHeader, Encoding, PayloadRegistry
from ..net.status import StatusType as T, PacketType, decode_status
from ..net.multicast import resolve_dest, listen_socket, DEFAULT_RTP_PORT, DEFAULT_STAT_PORT
from ..net.playout import Mixer
from ..daemons.ctcss import GoertzelBank


def _open_audio_device(device: str, samprate: int):
    """Live DAC output without portaudio: pipe the s16le stereo mix into
    whichever system player exists (aplay/pacat/play — the containers this
    runs in rarely have a sound stack, so this is best-effort). Returns a
    Popen with a writable stdin, or None."""
    import shutil
    import subprocess

    candidates = [
        (["aplay", "-q", "-t", "raw", "-f", "S16_LE", "-c", "2",
          "-r", str(samprate)] + ([] if device == "default" else ["-D", device]),
         "aplay"),
        (["pacat", "--format=s16le", "--channels=2", f"--rate={samprate}"]
         + ([] if device == "default" else [f"--device={device}"]), "pacat"),
        (["play", "-q", "-t", "raw", "-e", "signed", "-b", "16", "-c", "2",
          "-r", str(samprate), "-"], "play"),
    ]
    for argv, exe in candidates:
        if shutil.which(exe) is None:
            continue
        try:
            return subprocess.Popen(argv, stdin=subprocess.PIPE,
                                    stdout=subprocess.DEVNULL,
                                    stderr=subprocess.DEVNULL)
        except OSError:
            continue
    return None


def notch_available() -> bool:
    """scipy present? (the [notch] optional extra)"""
    try:
        from scipy.signal import lfilter  # noqa: F401

        return True
    except ImportError:
        return False


class _PlNotch:
    """Streaming 2-pole notch (iir.c:54-77, r=0.997) retuned to whatever
    PL tone the Goertzel bank finds (monitor.h:101). Vectorized via
    scipy.signal.lfilter with carried state."""

    def __init__(self, fs: float):
        self.fs = fs
        self.bank = GoertzelBank(fs)
        self.ba = None
        self.zi = None
        self.tone = None

    def __call__(self, frames: np.ndarray) -> np.ndarray:
        from scipy.signal import lfilter

        mono = frames.mean(axis=1).astype(np.float64)
        r = self.bank.feed(mono)
        if r is not None and r[1] >= 12.0 and r[0] != self.tone:
            # retune only when the detected tone CHANGES — resetting the
            # filter state on every report would thump the audio
            self.tone = r[0]
            c = 2.0 * np.cos(2.0 * np.pi * r[0] / self.fs)
            rr = 0.997
            # y[n] = x[n] - c x[n-1] + x[n-2] + rr c y[n-1] - rr^2 y[n-2]
            self.ba = (np.array([1.0, -c, 1.0]), np.array([1.0, -rr * c, rr * rr]))
            self.zi = np.zeros(2)
        if self.ba is None:
            return frames
        y, self.zi = lfilter(self.ba[0], self.ba[1], mono, zi=self.zi)
        return np.repeat(y.astype(np.float32)[:, None], 2, axis=1)


def render_sessions(mixer, snr_by_ssrc, selected: int, width: int = 78) -> list[str]:
    """Pure renderer for the session table (testable without curses)."""
    lines = [f"{'':1} {'ssrc':>8} {'rate':>6} {'level':>7} {'gain':>5} {'pan':>4} "
             f"{'pkts':>7} {'drops':>5} {'late':>5} {'snr':>5}  meter"]
    for i, (ssrc, s) in enumerate(sorted(mixer.sessions.items())):
        lvl = 20 * np.log10(max(s.level, 1e-9))
        meter = "#" * max(0, min(20, int((lvl + 60) / 3)))
        snr = snr_by_ssrc.get(ssrc)
        g_db = 20 * np.log10(max(s.gain, 1e-9)) if s.gain > 0 else float("-inf")
        gtxt = "MUTE" if s.gain == 0 else f"{g_db:+.0f}"
        lines.append(
            f"{'>' if i == selected else ' '} {ssrc:>8} {s.samprate:>6} {lvl:>6.1f}d "
            f"{gtxt:>5} {s.pan:>+4.1f} {s.packets:>7} {s.drops:>5} {s.late:>5} "
            f"{f'{snr:.0f}' if snr is not None else '—':>5}  {meter}")
    lines.append(f"underruns {mixer.underruns}   blocks {mixer.play_head // max(mixer.block,1)}")
    return [ln[:width] for ln in lines]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="monitor-tpu")
    ap.add_argument("--data", required=True)
    ap.add_argument("--status", default=None)
    ap.add_argument("--wav", default=None, help="stream the mix to a WAV file")
    ap.add_argument("--raw", action="store_true", help="s16le stereo mix on stdout")
    ap.add_argument("--device", nargs="?", const="default", default=None,
                    metavar="DEV",
                    help="play on the sound device via aplay/pacat/play "
                         "(the reference's portaudio output, monitor.c:642)")
    ap.add_argument("--live", action="store_true",
                    help="pace output to wall clock (real-time playout)")
    ap.add_argument("--duration", type=float, default=None)
    ap.add_argument("--samprate", type=int, default=48_000, help="mix output rate")
    ap.add_argument("--latency", type=float, default=0.1, help="playout target, s")
    ap.add_argument("--gain", action="append", default=[], help="ssrc=dB per-session gain")
    ap.add_argument("--pan", action="append", default=[], help="ssrc=pos (-1..1)")
    ap.add_argument("--ssrc", type=int, action="append", default=None, help="only these SSRCs")
    ap.add_argument("--vote", action="store_true",
                    help="mix only the best-SNR session (monitor.h:185 voting)")
    ap.add_argument("--notch", action="store_true", help="PL tone notch filter")
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--tui", action="store_true",
                    help="curses session display w/ per-session gain/pan/mute")
    args = ap.parse_args(argv)
    if args.tui:
        args.quiet = True
    if args.notch and not notch_available():
        # declared optional dependency (pyproject [notch] extra): degrade
        # to no-notch instead of crashing mid-stream on the first packet
        print("--notch needs scipy (pip install 'ka9q-radio-tpu[notch]'); "
              "continuing without the PL notch", file=sys.stderr, flush=True)
        args.notch = False

    gains = {}
    for g in args.gain:
        k, _, v = g.partition("=")
        gains[int(k)] = 10.0 ** (float(v) / 20.0)
    pans = {}
    for g in args.pan:
        k, _, v = g.partition("=")
        pans[int(k)] = float(v)

    rx = listen_socket(resolve_dest(args.data, DEFAULT_RTP_PORT))
    # per-channel beacons ride the data group's status port; a separate
    # control group can be given too
    brx = listen_socket(resolve_dest(args.data, DEFAULT_STAT_PORT))
    srx = listen_socket(resolve_dest(args.status, DEFAULT_STAT_PORT)) if args.status else None
    registry = PayloadRegistry()
    fmt_by_ssrc: dict[int, tuple] = {}
    snr_by_ssrc: dict[int, float] = {}
    notches: dict[int, _PlNotch] = {}

    block = max(1, int(args.samprate * 0.02))
    mixer = Mixer(out_rate=args.samprate, block_frames=block)

    wav = None
    if args.wav:
        import wave

        wav = wave.open(args.wav, "wb")
        wav.setnchannels(2)
        wav.setsampwidth(2)
        wav.setframerate(args.samprate)

    dac = None
    if args.device is not None:
        dac = _open_audio_device(args.device, args.samprate)
        if dac is None:
            print("--device: no audio player found (tried aplay, pacat, "
                  "play); continuing without DAC output", file=sys.stderr,
                  flush=True)

    def emit(chunk: np.ndarray):
        pcm = np.clip(chunk * 32767.0, -32768, 32767).astype("<i2")
        if wav is not None:
            wav.writeframes(pcm.tobytes())
        if args.raw:
            sys.stdout.buffer.write(pcm.tobytes())
            sys.stdout.buffer.flush()
        if dac is not None:
            try:
                dac.stdin.write(pcm.tobytes())
                dac.stdin.flush()
            except (BrokenPipeError, OSError):
                pass

    scr = None
    selected = [0]
    if args.tui:
        import curses

        scr = curses.initscr()
        curses.noecho()
        curses.cbreak()
        scr.nodelay(True)
        scr.keypad(True)

    def tui_tick():
        import curses

        scr.erase()
        for i, ln in enumerate(render_sessions(mixer, snr_by_ssrc, selected[0],
                                               scr.getmaxyx()[1] - 1)):
            try:
                scr.addstr(i, 0, ln)
            except curses.error:
                pass
        scr.refresh()
        ch = scr.getch()
        if ch == -1:
            return True
        order = sorted(mixer.sessions)
        if ch in (ord("q"), 27):
            return False
        if ch == curses.KEY_UP:
            selected[0] = max(0, selected[0] - 1)
        elif ch == curses.KEY_DOWN:
            selected[0] = min(max(len(order) - 1, 0), selected[0] + 1)
        elif order and selected[0] < len(order):
            s = mixer.sessions[order[selected[0]]]
            if ch == ord("+"):
                s.gain = min((s.gain or 0.056) * 10 ** 0.05, 10.0)
            elif ch == ord("-"):
                s.gain = s.gain * 10 ** -0.05
            elif ch == ord("m"):
                s.gain = 0.0 if s.gain else 1.0
            elif ch == ord("l"):
                s.pan = max(-1.0, s.pan - 0.1)
            elif ch == ord("r"):
                s.pan = min(1.0, s.pan + 0.1)
        return True

    t0 = time.monotonic()
    t_end = t0 + args.duration if args.duration else None
    blocks_out = 0
    last_tui = 0.0
    socks = [rx, brx] + ([srx] if srx else [])
    try:
        while t_end is None or time.monotonic() < t_end:
            # pull due mixer blocks (live: wall-clock paced; offline: as
            # data arrives, clocked by packet flow)
            if args.live:
                due = int((time.monotonic() - t0) * args.samprate / block)
            else:
                have = max((s._max_written for s in mixer.sessions.values()
                            if s.active), default=0)
                due = max(blocks_out, (have - int(args.latency * args.samprate)) // block)
            while blocks_out < due:
                emit(mixer.next_block())
                blocks_out += 1
            timeout = 0.005 if args.live else 0.1
            r, _, _ = select.select(socks, [], [], timeout)
            for s in r:
                pkt, _ = s.recvfrom(65536)
                if s is not rx:
                    try:
                        ptype, f, _ = decode_status(pkt)
                    except Exception:
                        continue
                    if ptype == PacketType.STATUS and T.OUTPUT_SSRC in f and T.OUTPUT_SAMPRATE in f:
                        fmt_by_ssrc[f[T.OUTPUT_SSRC]] = (
                            int(f[T.OUTPUT_SAMPRATE]),
                            int(f.get(T.OUTPUT_CHANNELS, 1)),
                            Encoding(int(f.get(T.OUTPUT_ENCODING, Encoding.S16BE))),
                        )
                        snr = f.get(T.FM_SNR, f.get(T.PLL_SNR))
                        if snr is not None:
                            snr_by_ssrc[f[T.OUTPUT_SSRC]] = float(snr)
                    continue
                try:
                    hdr, payload = RtpHeader.unpack(pkt)
                except Exception:
                    continue
                if args.ssrc and hdr.ssrc not in args.ssrc:
                    continue
                fmt = fmt_by_ssrc.get(hdr.ssrc) or registry.info_from_pt(hdr.type)
                if fmt is None:
                    continue
                new = hdr.ssrc not in mixer.sessions
                sess = mixer.session(hdr.ssrc, *fmt)
                if new:
                    sess.gain = gains.get(hdr.ssrc, 1.0)
                    sess.pan = pans.get(hdr.ssrc, 0.0)
                    if args.notch:
                        sess.filter = notches.setdefault(hdr.ssrc, _PlNotch(args.samprate))
                    if not args.quiet:
                        print(f"new session ssrc {hdr.ssrc}: {fmt[0]} Hz x{fmt[1]}",
                              file=sys.stderr)
                if args.vote and snr_by_ssrc:
                    # SNR voting across receivers (monitor.h:185-186)
                    best = max(snr_by_ssrc, key=snr_by_ssrc.get)
                    sess.gain = (gains.get(hdr.ssrc, 1.0)
                                 if hdr.ssrc == best else 0.0)
                sess.ingest(hdr, payload, mixer.play_head)
            if scr is not None and time.monotonic() - last_tui > 0.1:
                last_tui = time.monotonic()
                if not tui_tick():
                    break
    except KeyboardInterrupt:
        pass
    finally:
        if scr is not None:
            import curses

            curses.nocbreak()
            scr.keypad(False)
            curses.echo()
            curses.endwin()

    # drain whatever is still buffered
    while any(s.active and s._max_written > mixer.play_head
              for s in mixer.sessions.values()):
        emit(mixer.next_block())
        blocks_out += 1
    if wav is not None:
        wav.close()
    if dac is not None:
        try:
            dac.stdin.close()
        except OSError:
            pass
        dac.wait(timeout=2.0)

    for ssrc, s in sorted(mixer.sessions.items()):
        lvl = 20 * np.log10(max(s.level, 1e-9))
        print(f"ssrc {ssrc}: {s.packets} pkts, {s.drops} drops, {s.late} late, "
              f"{s.resets} resets, level {lvl:.1f} dBFS")
    if not args.quiet:
        print(f"{blocks_out} blocks, {mixer.underruns} underruns", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
