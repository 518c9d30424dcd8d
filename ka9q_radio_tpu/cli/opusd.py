"""opusd-tpu — PCM-to-Opus RTP transcoder daemon (opusd.c).

Listens on a PCM multicast group, re-encodes every session to Opus, and
multicasts to the output group (radiod can also emit Opus directly with
`encoding = opus`; this daemon serves mixed/legacy pipelines).

    opusd-tpu --input pcm.local --output opus.local [--bitrate 32000]
              [--duration N]
"""
from __future__ import annotations

import argparse
import select
import sys
import time

import numpy as np

from ..net.rtp import RtpHeader, Encoding, PayloadRegistry, decode_samples
from ..net.status import StatusType as T, PacketType, decode_status
from ..net.multicast import resolve_dest, output_socket, listen_socket, DEFAULT_RTP_PORT, DEFAULT_STAT_PORT


class _Session:
    def __init__(self, samprate: int, channels: int, encoding: Encoding, bitrate: int):
        from ..net.opus import OpusEncoder

        self.samprate, self.channels, self.encoding = samprate, channels, encoding
        self.enc = OpusEncoder(samprate if samprate in (8000, 12000, 16000, 24000, 48000) else 48000,
                               2, bitrate=bitrate)
        self.buf = np.zeros((0, 2), np.float32)
        self.frame = self.enc.samprate // 50  # 20 ms
        self.seq = 0
        self.ts = 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="opusd-tpu")
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--status", default=None)
    ap.add_argument("--bitrate", type=int, default=32_000)
    ap.add_argument("--duration", type=float, default=None)
    args = ap.parse_args(argv)

    from ..net.opus import available

    if not available():
        print("libopus not available", file=sys.stderr)
        return 1

    rx = listen_socket(resolve_dest(args.input, DEFAULT_RTP_PORT))
    srx = listen_socket(resolve_dest(args.status, DEFAULT_STAT_PORT)) if args.status else None
    tx = output_socket(resolve_dest(args.output, DEFAULT_RTP_PORT))
    registry = PayloadRegistry()
    opus_pt = registry.pt_from_info(48_000, 2, Encoding.OPUS)
    fmt_by_ssrc: dict[int, tuple] = {}
    sessions: dict[int, _Session] = {}
    socks = [rx] + ([srx] if srx else [])
    t_end = time.monotonic() + args.duration if args.duration else None
    try:
        while t_end is None or time.monotonic() < t_end:
            r, _, _ = select.select(socks, [], [], 0.25)
            for s in r:
                pkt, _ = s.recvfrom(65536)
                if s is srx:
                    try:
                        ptype, f, _ = decode_status(pkt)
                        if ptype == PacketType.STATUS and T.OUTPUT_SSRC in f:
                            fmt_by_ssrc[f[T.OUTPUT_SSRC]] = (
                                int(f[T.OUTPUT_SAMPRATE]), int(f.get(T.OUTPUT_CHANNELS, 1)),
                                Encoding(int(f.get(T.OUTPUT_ENCODING, Encoding.S16BE))))
                    except Exception:
                        pass
                    continue
                try:
                    h, payload = RtpHeader.unpack(pkt)
                except Exception:
                    continue
                fmt = fmt_by_ssrc.get(h.ssrc) or registry.info_from_pt(h.type)
                if fmt is None or fmt[2] in (Encoding.OPUS, Encoding.OPUS_VOIP):
                    continue
                sess = sessions.get(h.ssrc)
                if sess is None:
                    sess = sessions[h.ssrc] = _Session(*fmt, args.bitrate)
                try:
                    audio = decode_samples(payload, sess.encoding).reshape(-1, sess.channels)
                except ValueError:
                    continue  # malformed/foreign packet
                stereo = np.repeat(audio, 2, axis=1) if sess.channels == 1 else audio[:, :2]
                sess.buf = np.concatenate([sess.buf, stereo])
                while sess.buf.shape[0] >= sess.frame:
                    frame, sess.buf = sess.buf[: sess.frame], sess.buf[sess.frame :]
                    data = sess.enc.encode(frame)
                    hdr = RtpHeader(type=opus_pt, seq=sess.seq, timestamp=sess.ts, ssrc=h.ssrc)
                    tx.send(hdr.pack() + data)
                    sess.seq = (sess.seq + 1) & 0xFFFF
                    sess.ts = (sess.ts + sess.frame * 48_000 // sess.enc.samprate) & 0xFFFFFFFF
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
