"""pcmrecord-tpu — record, stream, or pipe RTP audio (pcmrecord.c).

Feature parity with the reference recorder (pcmrecord.c:1-40):
  * one file per SSRC: WAV (or --raw headerless) for PCM, a standard
    Ogg Opus container for Opus streams (no re-encode);
  * squelch-aware file splitting: an idle --timeout (default 20 s, i.e.
    the sender's squelch closed) closes the file; the next transmission
    opens a new one. --mintime deletes too-short files on close;
  * --exec 'cmd': run a command per stream and pipe PCM to it, with the
    reference's $-macros ($s ssrc, $r rate, $c channels, $f encoding,
    $h/$k/$m frequency, $d description, $$ literal);
  * --jt / --pad / --max-length and the -8/-4/-w (FT8/FT4/WSPR) presets:
    wall-clock-aligned fixed-length files with K1JT names, silence-padded
    to the boundary — the wd-record/wsprdaemon recording mode;
  * --stdout single-stream cat mode, --subdirs ssrc/yyyy/mm/dd trees,
    stream metadata as file xattrs (attr.c).
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

from ..net.rtp import RtpHeader, RtpState, Encoding, PayloadRegistry, decode_samples
from ..net.status import StatusType as T, PacketType, decode_status
from ..net.multicast import resolve_dest, listen_socket, DEFAULT_RTP_PORT, DEFAULT_STAT_PORT


def _expand_macros(cmd: str, sess: "Session") -> str:
    """pcmrecord.c:12-22 $-macros."""
    enc = {Encoding.S16LE: "s16le", Encoding.S16BE: "s16be",
           Encoding.F32LE: "f32le", Encoding.OPUS: "opus"}.get(sess.encoding, "none")
    out = []
    i = 0
    while i < len(cmd):
        ch = cmd[i]
        if ch == "$" and i + 1 < len(cmd):
            m = cmd[i + 1]
            rep = {"$": "$", "s": str(sess.ssrc), "r": str(sess.samprate),
                   "c": str(sess.channels), "f": enc,
                   "d": sess.description,
                   "h": f"{sess.freq:.0f}", "k": f"{sess.freq/1e3:.3f}",
                   "m": f"{sess.freq/1e6:.6f}"}.get(m)
            if rep is not None:
                out.append(rep)
                i += 2
                continue
        out.append(ch)
        i += 1
    return "".join(out)


class Session:
    def __init__(self, ssrc: int, samprate: int, channels: int, encoding: Encoding,
                 args, freq: float = 0.0, description: str = ""):
        self.ssrc = ssrc
        self.samprate, self.channels, self.encoding = samprate, channels, encoding
        self.args = args
        self.freq = freq
        self.description = description
        self.rtp = RtpState()
        self.opus_raw = encoding in (Encoding.OPUS, Encoding.OPUS_VOIP)
        self.wav = None
        self.ogg = None
        self.fp = None
        self.proc = None
        self.path = None
        self.last_packet = time.monotonic()
        self.opened_wall = 0.0
        self.frames_written = 0
        self.file_start_ts: int | None = None
        # --wd-mode state machine (wd-record.c:887-1060): startup -> armed
        # (data seen in second L-1) -> active (first datagram of second 0
        # starts the file; files are then EXACTLY L*samprate frames,
        # packets split at the boundary frame)
        self.sync_state = "startup"
        if args.exec_cmd:
            cmd = _expand_macros(args.exec_cmd, self)
            self.proc = subprocess.Popen(shlex.split(cmd), stdin=subprocess.PIPE)
            print(f"exec {cmd} for ssrc {ssrc}", file=sys.stderr)

    # ----------------------------------------------------------- file naming
    def _filename(self, wall: float) -> str:
        ext = ".opus" if self.opus_raw else (".raw" if self.args.raw else ".wav")
        if self.args.jt:
            # K1JT names: YYMMDD_HHMMSS (FT8/FT4) / YYMMDD_HHMM (WSPR)
            if (self.args.max_length or 0) >= 60:
                stamp = time.strftime("%y%m%d_%H%M", time.gmtime(wall))
            else:
                stamp = time.strftime("%y%m%d_%H%M%S", time.gmtime(wall))
            name = f"{stamp}_{self.ssrc}{ext}"
        else:
            stamp = time.strftime("%Y%m%dT%H%M%SZ", time.gmtime(wall))
            name = f"{stamp}_ssrc{self.ssrc}{ext}"
        d = self.args.dir
        if self.args.subdirs:
            d = os.path.join(d, str(self.ssrc), *time.strftime("%Y/%m/%d", time.gmtime(wall)).split("/"))
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, name)

    def _open_file(self, epoch: float, now: float | None = None):
        """Open a file named/aligned at `epoch` (a boundary when --pad);
        pad [epoch, now) with silence so the content stays wall-aligned."""
        self.path = self._filename(epoch)
        self.opened_wall = epoch
        self.frames_written = 0
        self.file_start_ts = None
        if self.opus_raw:
            from ..net.ogg import OggOpusWriter

            self.fp = open(self.path, "wb")
            self.ogg = OggOpusWriter(self.fp, channels=self.channels)
        elif self.args.raw:
            self.fp = open(self.path, "wb")
        else:
            self.wav = wave.open(self.path, "wb")
            self.wav.setnchannels(self.channels)
            self.wav.setsampwidth(2)
            self.wav.setframerate(self.samprate)
        if self.args.pad and now is not None and not self.opus_raw:
            # pad from the boundary to 'now' with silence so the file
            # stays wall-clock aligned (pcmrecord.c --pad)
            nsil = int((now - epoch) * self.samprate)
            if nsil > 0:
                self._write_pcm_frames(np.zeros((nsil, self.channels), np.float32))

    def _write_pcm_frames(self, frames: np.ndarray):
        pcm = np.clip(frames * 32767.0, -32768, 32767).astype("<i2")
        if self.wav is not None:
            self.wav.writeframes(pcm.tobytes())
        elif self.fp is not None:
            self.fp.write(pcm.tobytes())
        self.frames_written += frames.shape[0]

    # -------------------------------------------------------------- rotation
    def _epoch(self, wall: float) -> float:
        """File epoch: the preceding --max-length boundary when --pad."""
        L = self.args.max_length
        return int(wall / L) * L if (L and self.args.pad) else wall

    def _maybe_rotate(self, wall: float, marker: bool):
        L = self.args.max_length
        if self.path is None:
            self._open_file(self._epoch(wall), wall)
            return
        rotate = L and wall - self._epoch(self.opened_wall) >= L
        if marker and self.args.split_on_marker and self.frames_written > 0:
            rotate = True  # sender squelch reopened: new transmission
        if rotate:
            self.close_file()
            self._open_file(self._epoch(wall), wall)

    def idle_check(self, now: float):
        """Close the file after --timeout with no packets (the sender's
        squelch closed, pcmrecord.c --timeout default 20 s)."""
        if self.path is not None and now - self.last_packet >= self.args.timeout:
            self.close_file()
            self.sync_state = "startup"  # wd-mode: resync at the next :00

    # ---------------------------------------------------------------- ingest
    def write(self, hdr: RtpHeader, payload: bytes):
        now_wall = time.time()
        self.last_packet = time.monotonic()
        if self.proc is not None:
            if self.opus_raw:
                data = payload
            else:
                audio = decode_samples(payload, self.encoding)
                data = np.clip(audio * 32767.0, -32768, 32767).astype("<i2").tobytes()
            try:
                self.proc.stdin.write(data)
                self.proc.stdin.flush()
            except (BrokenPipeError, OSError):
                pass
            return
        if self.args.stdout:
            if self.opus_raw:
                sys.stdout.buffer.write(payload)
            else:
                audio = decode_samples(payload, self.encoding)
                sys.stdout.buffer.write(
                    np.clip(audio * 32767.0, -32768, 32767).astype("<i2").tobytes())
            return
        if getattr(self.args, "wd_mode", False) and not self.opus_raw:
            self._write_wd(hdr, payload, now_wall)
            return
        self._maybe_rotate(now_wall, hdr.marker)
        if self.opus_raw:
            self.rtp.process(hdr, 0)
            self.ogg.write(payload, flush=self.args.flush)
            self.frames_written += 1  # packet count: gates marker splits
            return
        audio = decode_samples(payload, self.encoding)
        nframes = audio.size // self.channels
        gap = self.rtp.process(hdr, nframes)
        if gap and gap > 0:  # fill drops with silence to keep time aligned
            self._write_pcm_frames(
                np.zeros((min(gap, 10 * self.samprate), self.channels), np.float32))
        self._write_pcm_frames(audio.reshape(nframes, self.channels))

    def _write_wd(self, hdr: RtpHeader, payload: bytes, now_wall: float):
        """wsprdaemon mode (wd-record.c --wd_mode): files synchronized to
        UTC multiples of L and EXACTLY L*samprate frames long — packets
        spanning a boundary are split at the boundary frame; RTP gaps fill
        with silence so the frame count (not wall clock) drives rotation."""
        L = self.args.max_length
        target = int(round(L * self.samprate))
        seconds = now_wall % L
        if self.sync_state == "startup":
            # spin until samples arrive in the last second of the interval
            if seconds >= L - 1.0:
                self.sync_state = "armed"
            return
        if self.sync_state == "armed":
            if seconds >= L - 1.0:
                return  # still in second L-1
            if seconds < 1.0:
                # first datagram of second 0 starts the series; clear any
                # stale RTP baseline so the single process() call below
                # re-baselines from this packet (gap 0, no spurious dupe)
                self.sync_state = "active"
                self._open_file(now_wall - (now_wall % L))
                self.rtp.init = False
            else:
                self.sync_state = "startup"  # missed the boundary: rearm
                return
        audio = decode_samples(payload, self.encoding)
        nframes = audio.size // self.channels
        gap = self.rtp.process(hdr, nframes)
        frames = audio.reshape(nframes, self.channels)
        if gap and gap > 0:
            frames = np.concatenate(
                [np.zeros((min(gap, int(10 * self.samprate)), self.channels),
                          np.float32), frames])
        while frames.shape[0] > 0:
            if self.path is None:
                self._open_file(self.opened_wall + L)
            room = target - self.frames_written
            take = min(room, frames.shape[0])
            self._write_pcm_frames(frames[:take])
            frames = frames[take:]
            if self.frames_written >= target:
                self.close_file()
                # resync if the sample clock drifted > ~2 s from wall time
                # (wd-record.c:321,742 wd_tolerance)
                next_epoch = self.opened_wall + L
                if abs(now_wall - next_epoch) > 2.0:
                    self.sync_state = "startup"
                    return

    # ----------------------------------------------------------------- close
    def close_file(self):
        if self.path is None:
            return
        if self.ogg is not None:
            self.ogg.close()
            self.fp.close()
            self.ogg = None
            self.fp = None
        elif self.wav is not None:
            self.wav.close()
            self.wav = None
        elif self.fp is not None:
            self.fp.close()
            self.fp = None
        dur = self.frames_written / self.samprate if not self.opus_raw else None
        if (self.args.mintime and dur is not None and dur < self.args.mintime):
            os.unlink(self.path)  # too short to keep (pcmrecord.c --mintime)
        else:
            try:  # stream metadata as xattrs (attr.c)
                os.setxattr(self.path, b"user.ka9q.ssrc", str(self.ssrc).encode())
                os.setxattr(self.path, b"user.ka9q.samprate", str(self.samprate).encode())
                os.setxattr(self.path, b"user.ka9q.channels", str(self.channels).encode())
                if self.freq:
                    os.setxattr(self.path, b"user.ka9q.frequency", f"{self.freq:.0f}".encode())
            except OSError:
                pass
            print(f"wrote {self.path}", file=sys.stderr)
        self.path = None

    def close(self):
        self.close_file()
        if self.proc is not None:
            try:
                self.proc.stdin.close()
            except OSError:
                pass
            try:
                self.proc.wait(timeout=15)
            except subprocess.TimeoutExpired:
                self.proc.kill()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="pcmrecord-tpu")
    ap.add_argument("--data", required=True, help="RTP data stream name/addr")
    ap.add_argument("--status", default=None, help="status stream for format autodetect")
    ap.add_argument("--duration", type=float, default=None, help="seconds to record")
    ap.add_argument("--dir", "-d", default=".")
    ap.add_argument("--ssrc", type=int, default=None, help="record only this SSRC")
    ap.add_argument("--stdout", "--catmode", "-c", action="store_true", dest="stdout",
                    help="raw stream to stdout (single ssrc)")
    ap.add_argument("--exec", "-e", dest="exec_cmd", default=None,
                    help="pipe each stream into this command ($s/$r/$c/... macros)")
    ap.add_argument("--raw", "-r", action="store_true", help="no WAV header for PCM")
    ap.add_argument("--timeout", "-t", type=float, default=20.0,
                    help="close file after idle seconds (squelch split)")
    ap.add_argument("--mintime", "-m", type=float, default=0.0,
                    help="delete files shorter than this on close")
    ap.add_argument("--max-length", "-L", "--lengthlimit", type=float, default=None,
                    dest="max_length", help="maximum file duration, seconds")
    ap.add_argument("--rotate", type=float, default=None,
                    help="alias for --max-length (wd-record interval rotation)")
    ap.add_argument("--pad", "-P", action="store_true",
                    help="align files to multiples of length, pad with silence")
    ap.add_argument("--jt", "-j", action="store_true", help="K1JT file names")
    ap.add_argument("--ft8", "-8", action="store_true", help="= --jt --pad --max-length 15")
    ap.add_argument("--ft4", "-4", action="store_true", help="= --jt --pad --max-length 7.5")
    ap.add_argument("--wspr", "-w", action="store_true", help="= --jt --pad --max-length 120")
    ap.add_argument("--wd-mode", "-W", action="store_true", dest="wd_mode",
                    help="wsprdaemon mode (wd-record.c --wd_mode): sync file "
                         "starts to UTC multiples of --max-length (default "
                         "60 s), sample-exact file lengths, implies --jt")
    ap.add_argument("--subdirs", "-s", action="store_true",
                    help="write ssrc/year/month/day/ subdirectories")
    ap.add_argument("--flush", "-f", action="store_true", help="flush Ogg pages per packet")
    ap.add_argument("--no-split-on-marker", dest="split_on_marker", action="store_false",
                    help="don't start a new file on the RTP marker bit")
    args = ap.parse_args(argv)
    if args.ft8:
        args.jt = args.pad = True
        args.max_length = 15.0
    elif args.ft4:
        args.jt = args.pad = True
        args.max_length = 7.5
    elif args.wspr:
        args.jt = args.pad = True
        args.max_length = 120.0
    if args.rotate and not args.max_length:
        args.max_length = args.rotate
    if args.wd_mode:
        args.jt = True
        if not args.max_length:
            args.max_length = 60.0

    rx = listen_socket(resolve_dest(args.data, DEFAULT_RTP_PORT))
    # per-channel beacons also ride the data group's status port
    brx = listen_socket(resolve_dest(args.data, DEFAULT_STAT_PORT))
    srx = listen_socket(resolve_dest(args.status, DEFAULT_STAT_PORT)) if args.status else None
    registry = PayloadRegistry()
    fmt_by_ssrc: dict[int, tuple[int, int, Encoding]] = {}
    meta_by_ssrc: dict[int, tuple[float, str]] = {}
    sessions: dict[int, Session] = {}
    t_end = time.monotonic() + args.duration if args.duration else None

    socks = [rx, brx] + ([srx] if srx else [])
    try:
        while t_end is None or time.monotonic() < t_end:
            left = 0.5 if t_end is None else max(min(t_end - time.monotonic(), 0.5), 0)
            r, _, _ = select.select(socks, [], [], left)
            now = time.monotonic()
            for sess in sessions.values():
                sess.idle_check(now)
            for s in r:
                pkt, _ = s.recvfrom(65536)
                if s is not rx:
                    try:
                        ptype, f, _ = decode_status(pkt)
                    except Exception:
                        continue
                    if ptype == PacketType.STATUS and T.OUTPUT_SSRC in f and T.OUTPUT_SAMPRATE in f:
                        ssrc = f[T.OUTPUT_SSRC]
                        fmt_by_ssrc[ssrc] = (
                            int(f[T.OUTPUT_SAMPRATE]),
                            int(f.get(T.OUTPUT_CHANNELS, 1)),
                            Encoding(int(f.get(T.OUTPUT_ENCODING, Encoding.S16BE))),
                        )
                        meta_by_ssrc[ssrc] = (float(f.get(T.RADIO_FREQUENCY, 0.0)),
                                              str(f.get(T.DESCRIPTION, "")))
                    continue
                try:
                    hdr, payload = RtpHeader.unpack(pkt)
                except Exception:
                    continue
                if args.ssrc is not None and hdr.ssrc != args.ssrc:
                    continue
                if args.stdout and sessions and hdr.ssrc not in sessions:
                    continue  # catmode: first stream only (pcmrecord.c:9)
                sess = sessions.get(hdr.ssrc)
                if sess is None:
                    fmt = fmt_by_ssrc.get(hdr.ssrc) or registry.info_from_pt(hdr.type)
                    if fmt is None:
                        continue  # unknown payload type; wait for status
                    freq, desc = meta_by_ssrc.get(hdr.ssrc, (0.0, ""))
                    sess = sessions[hdr.ssrc] = Session(hdr.ssrc, *fmt, args,
                                                        freq=freq, description=desc)
                    print(f"ssrc {hdr.ssrc}: {fmt[0]} Hz x{fmt[1]} {fmt[2].name}",
                          file=sys.stderr)
                sess.write(hdr, payload)
    except KeyboardInterrupt:
        pass
    for sess in sessions.values():
        sess.close()
    return 0


def main_wd(argv=None) -> int:
    """wd-record-tpu: pcmrecord with wsprdaemon defaults (wd-record.c):
    --wd-mode's UTC-minute-synced, sample-exact 60 s K1JT files unless the
    caller picks another mode."""
    argv = list(sys.argv[1:] if argv is None else argv)
    longs = ("--ft8", "--ft4", "--wspr", "--jt", "--max-length",
             "--lengthlimit", "--rotate", "--wd-mode")
    def mode_flag(a):
        return (a.split("=")[0] in longs or a in ("-8", "-4", "-w", "-j", "-W")
                or a.startswith("-L"))
    if not any(mode_flag(a) for a in argv):
        argv = ["--wd-mode"] + argv
    return main(argv)


if __name__ == "__main__":
    sys.exit(main())
