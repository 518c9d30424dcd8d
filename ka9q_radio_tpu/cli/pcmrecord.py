"""pcmrecord-tpu — record RTP audio streams to WAV files (pcmrecord.c).

One file per SSRC; format autodetected from the payload-type registry's
defaults plus any status beacons seen on the corresponding status group.

    pcmrecord-tpu --data test-pcm.local [--status test.local]
                  [--duration 10] [--dir .] [--ssrc N] [--stdout]
"""
from __future__ import annotations

import argparse
import os
import select
import sys
import time
import wave

import numpy as np

from ..net.rtp import RtpHeader, RtpState, Encoding, PayloadRegistry, decode_samples
from ..net.status import StatusType as T, PacketType, decode_status
from ..net.multicast import resolve_dest, listen_socket, DEFAULT_RTP_PORT, DEFAULT_STAT_PORT


class Session:
    def __init__(self, ssrc: int, samprate: int, channels: int, encoding: Encoding, outdir: str, to_stdout: bool,
                 rotate_s: float | None = None):
        self.ssrc = ssrc
        self.samprate, self.channels, self.encoding = samprate, channels, encoding
        self.outdir = outdir
        self.rotate_s = rotate_s
        self.opened_at = time.monotonic()
        self.rtp = RtpState()
        self.to_stdout = to_stdout
        self.opus = None
        if encoding in (Encoding.OPUS, Encoding.OPUS_VOIP):
            from ..net.opus import OpusDecoder
            self.opus = OpusDecoder(samprate, channels)
        self.wav = None
        if not to_stdout:
            self._open_file()

    def _open_file(self):
        # wd-record-style timestamped names so rotation never collides
        stamp = time.strftime("%Y%m%dT%H%M%SZ", time.gmtime())
        path = os.path.join(self.outdir, f"ssrc{self.ssrc}.wav" if not self.rotate_s
                            else f"{stamp}_ssrc{self.ssrc}.wav")
        self.wav = wave.open(path, "wb")
        self.wav.setnchannels(self.channels)
        self.wav.setsampwidth(2)
        self.wav.setframerate(self.samprate)
        self.path = path
        self.opened_at = time.monotonic()

    def write(self, hdr: RtpHeader, payload: bytes):
        if (self.wav is not None and self.rotate_s
                and time.monotonic() - self.opened_at >= self.rotate_s):
            # wd-record per-interval file rotation
            self.wav.close()
            print(f"wrote {self.path}", file=sys.stderr)
            self._open_file()
        if self.opus is not None:
            audio = self.opus.decode(payload).reshape(-1)
        else:
            audio = decode_samples(payload, self.encoding)
        nframes = audio.size // self.channels
        gap = self.rtp.process(hdr, nframes)
        pcm = np.clip(audio * 32767.0, -32768, 32767).astype("<i2")
        if self.to_stdout:
            sys.stdout.buffer.write(pcm.tobytes())
        else:
            if gap and gap > 0:  # fill drops with silence to keep time aligned
                self.wav.writeframes(b"\0\0" * min(gap, 10 * self.samprate) * self.channels)
            self.wav.writeframes(pcm.tobytes())

    def close(self):
        if self.wav:
            self.wav.close()
            # file metadata as extended attributes (attr.c): lets tools
            # recover stream identity without parsing filenames
            try:
                os.setxattr(self.path, b"user.ka9q.ssrc", str(self.ssrc).encode())
                os.setxattr(self.path, b"user.ka9q.samprate", str(self.samprate).encode())
                os.setxattr(self.path, b"user.ka9q.channels", str(self.channels).encode())
            except OSError:
                pass  # filesystem without xattr support


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="pcmrecord-tpu")
    ap.add_argument("--data", required=True, help="RTP data stream name/addr")
    ap.add_argument("--status", default=None, help="status stream for format autodetect")
    ap.add_argument("--duration", type=float, default=None, help="seconds to record")
    ap.add_argument("--dir", default=".")
    ap.add_argument("--ssrc", type=int, default=None, help="record only this SSRC")
    ap.add_argument("--stdout", action="store_true", help="raw s16le to stdout (single ssrc)")
    ap.add_argument("--rotate", type=float, default=None,
                    help="rotate files every N seconds (wd-record behavior)")
    args = ap.parse_args(argv)

    rx = listen_socket(resolve_dest(args.data, DEFAULT_RTP_PORT))
    srx = listen_socket(resolve_dest(args.status, DEFAULT_STAT_PORT)) if args.status else None
    registry = PayloadRegistry()
    fmt_by_ssrc: dict[int, tuple[int, int, Encoding]] = {}
    sessions: dict[int, Session] = {}
    t_end = time.monotonic() + args.duration if args.duration else None

    socks = [rx] + ([srx] if srx else [])
    try:
        while t_end is None or time.monotonic() < t_end:
            left = None if t_end is None else max(t_end - time.monotonic(), 0)
            r, _, _ = select.select(socks, [], [], left)
            if not r:
                break
            for s in r:
                pkt, _ = s.recvfrom(65536)
                if s is srx:
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
                    continue
                try:
                    hdr, payload = RtpHeader.unpack(pkt)
                except Exception:
                    continue
                if args.ssrc is not None and hdr.ssrc != args.ssrc:
                    continue
                sess = sessions.get(hdr.ssrc)
                if sess is None:
                    fmt = fmt_by_ssrc.get(hdr.ssrc) or registry.info_from_pt(hdr.type)
                    if fmt is None:
                        continue  # unknown payload type; wait for status
                    sess = sessions[hdr.ssrc] = Session(hdr.ssrc, *fmt, args.dir, args.stdout,
                                                        rotate_s=args.rotate)
                    print(f"ssrc {hdr.ssrc}: {fmt[0]} Hz x{fmt[1]} {fmt[2].name}", file=sys.stderr)
                sess.write(hdr, payload)
    except KeyboardInterrupt:
        pass
    for sess in sessions.values():
        sess.close()
        if not args.stdout:
            print(f"wrote {sess.path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
