"""monitor-tpu — multicast audio monitor (reference monitor.c).

Without portaudio in this environment, the monitor mixes every session into
one output stream (WAV file or raw s16le stdout) and reports per-session
statistics (packets, drops, dupes, level) — the observability core of the
reference's ncurses monitor. Per-session gain and an SSRC whitelist mirror
the reference's per-session controls.

    monitor-tpu --data test-pcm.local [--wav out.wav] [--duration 5]
                [--samprate 48000] [--gain ssrc=dB ...] [--quiet]
"""
from __future__ import annotations

import argparse
import select
import sys
import time
import wave

import numpy as np

from ..net.rtp import RtpHeader, RtpState, Encoding, PayloadRegistry, decode_samples
from ..net.status import StatusType as T, PacketType, decode_status
from ..net.multicast import resolve_dest, listen_socket, DEFAULT_RTP_PORT, DEFAULT_STAT_PORT
from ..daemons.ctcss import GoertzelBank


class _PlNotch:
    """Streaming 2-pole notch (iir.c:54-77, r=0.997) retuned to whatever
    PL tone the Goertzel bank finds — the monitor's notch (monitor.h:101)."""

    def __init__(self, fs: float):
        self.fs = fs
        self.bank = GoertzelBank(fs)
        self.coeffs = None
        self.x1 = self.x2 = self.y1 = self.y2 = 0.0

    def process(self, x: np.ndarray) -> np.ndarray:
        r = self.bank.feed(x)
        if r is not None and r[1] >= 12.0:
            w = 2.0 * np.pi * r[0] / self.fs
            self.coeffs = (2.0 * np.cos(w), 0.997)
        if self.coeffs is None:
            return x
        c, rr = self.coeffs
        y = np.empty_like(x)
        x1, x2, y1, y2 = self.x1, self.x2, self.y1, self.y2
        for i, v in enumerate(x):
            out = v - c * x1 + x2 + rr * c * y1 - rr * rr * y2
            x2, x1 = x1, v
            y2, y1 = y1, out
            y[i] = out
        self.x1, self.x2, self.y1, self.y2 = x1, x2, y1, y2
        return y


class Session:
    def __init__(self, ssrc: int, samprate: int, channels: int, encoding: Encoding):
        self.ssrc, self.samprate, self.channels, self.encoding = ssrc, samprate, channels, encoding
        self.rtp = RtpState()
        self.level = 0.0
        self.samples = 0
        self.opus = None
        if encoding in (Encoding.OPUS, Encoding.OPUS_VOIP):
            from ..net.opus import OpusDecoder
            self.opus = OpusDecoder(samprate, channels)

    def ingest(self, hdr: RtpHeader, payload: bytes) -> np.ndarray | None:
        if self.opus is not None:
            audio = self.opus.decode(payload).reshape(-1)
        else:
            audio = decode_samples(payload, self.encoding)
        nframes = audio.size // self.channels
        gap = self.rtp.process(hdr, nframes)
        if gap is not None and gap < 0:
            return None
        if self.opus is not None and gap:
            # packet-loss concealment for the gap (monitor-data.c:525-633)
            plc = self.opus.decode(None, min(int(gap), 5760)).reshape(-1)
            audio = np.concatenate([plc, audio])
            nframes = audio.size // self.channels
        self.samples += nframes
        if audio.size:
            self.level = 0.9 * self.level + 0.1 * float(np.sqrt(np.mean(audio**2)))
        return audio.reshape(nframes, self.channels)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="monitor-tpu")
    ap.add_argument("--data", required=True)
    ap.add_argument("--status", default=None)
    ap.add_argument("--wav", default=None, help="mixdown output file")
    ap.add_argument("--duration", type=float, default=None)
    ap.add_argument("--samprate", type=int, default=48_000, help="mix output rate")
    ap.add_argument("--gain", action="append", default=[], help="ssrc=dB per-session gain")
    ap.add_argument("--ssrc", type=int, action="append", default=None, help="only these SSRCs")
    ap.add_argument("--vote", action="store_true",
                    help="mix only the best-SNR session (monitor.h:185 voting)")
    ap.add_argument("--notch", action="store_true", help="PL tone notch filter")
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args(argv)

    gains = {}
    for g in args.gain:
        k, _, v = g.partition("=")
        gains[int(k)] = 10.0 ** (float(v) / 20.0)

    rx = listen_socket(resolve_dest(args.data, DEFAULT_RTP_PORT))
    srx = listen_socket(resolve_dest(args.status, DEFAULT_STAT_PORT)) if args.status else None
    registry = PayloadRegistry()
    fmt_by_ssrc: dict[int, tuple] = {}
    sessions: dict[int, Session] = {}
    snr_by_ssrc: dict[int, float] = {}
    notches: dict[int, _PlNotch] = {}

    wav = None
    if args.wav:
        wav = wave.open(args.wav, "wb")
        wav.setnchannels(2)
        wav.setsampwidth(2)
        wav.setframerate(args.samprate)

    # mix buffer indexed by output frame; grown as needed
    mix: dict[int, np.ndarray] = {}
    t0 = time.monotonic()
    t_end = t0 + args.duration if args.duration else None
    socks = [rx] + ([srx] if srx else [])
    try:
        while t_end is None or time.monotonic() < t_end:
            left = 0.25 if t_end is None else max(min(t_end - time.monotonic(), 0.25), 0)
            r, _, _ = select.select(socks, [], [], left)
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
                sess = sessions.get(hdr.ssrc)
                if sess is None:
                    fmt = fmt_by_ssrc.get(hdr.ssrc) or registry.info_from_pt(hdr.type)
                    if fmt is None:
                        continue
                    sess = sessions[hdr.ssrc] = Session(hdr.ssrc, *fmt)
                    if not args.quiet:
                        print(f"new session ssrc {hdr.ssrc}: {fmt[0]} Hz x{fmt[1]}", file=sys.stderr)
                audio = sess.ingest(hdr, payload)
                if audio is None or wav is None:
                    continue
                if args.vote and snr_by_ssrc:
                    # SNR voting across receivers (monitor.h:185-186)
                    best = max(snr_by_ssrc, key=snr_by_ssrc.get)
                    if hdr.ssrc != best:
                        continue
                if args.notch:
                    nf = notches.get(hdr.ssrc)
                    if nf is None:
                        nf = notches[hdr.ssrc] = _PlNotch(sess.samprate)
                    mono = audio.mean(axis=1)
                    filtered = nf.process(mono.astype(np.float64)).astype(np.float32)
                    audio = np.repeat(filtered[:, None], audio.shape[1], axis=1)
                g = gains.get(hdr.ssrc, 1.0)
                # resample by sample-and-hold to the mix rate; pan mono to center
                step = sess.samprate / args.samprate
                n_out = int(audio.shape[0] / step)
                idx = np.minimum((np.arange(n_out) * step).astype(int), audio.shape[0] - 1)
                frames = audio[idx]
                if sess.channels == 1:
                    frames = np.repeat(frames, 2, axis=1)
                # place at the session's stream position (RTP-derived) so
                # gaps and late joins stay time-aligned in the mix
                base = int(round((sess.samples - audio.shape[0]) / step))
                buf = mix.get(sess.ssrc)
                need = base + frames.shape[0]
                if buf is None or buf.shape[0] < need:
                    grown = np.zeros((need, 2), np.float32)
                    if buf is not None:
                        grown[: buf.shape[0]] = buf
                    buf = grown
                buf[base:need] += (frames * g).astype(np.float32)
                mix[sess.ssrc] = buf
    except KeyboardInterrupt:
        pass

    if wav is not None:
        if mix:
            n = max(v.shape[0] for v in mix.values())
            out = np.zeros((n, 2), np.float32)
            for v in mix.values():
                out[: v.shape[0]] += v
            wav.writeframes(np.clip(out * 32767, -32768, 32767).astype("<i2").tobytes())
        wav.close()

    for ssrc, s in sorted(sessions.items()):
        lvl = 20 * np.log10(max(s.level, 1e-9))
        print(f"ssrc {ssrc}: {s.rtp.packets} pkts, {s.rtp.drops} drops, "
              f"{s.rtp.dupes} dupes, {s.samples} samples, level {lvl:.1f} dBFS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
