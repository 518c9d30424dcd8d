"""stereod-tpu — standalone FM composite -> stereo decoder (stereod.c).

Superseded by the in-engine WFM demod (which also does RDS), but kept for
pipelines that move the 384 kHz composite over RTP. Buffers composite
blocks and runs the same second-stage overlap-save slaves + stereo matrix
as models/wfm.py.

    stereod-tpu --input comp.local --output stereo-pcm.local [--duration N]
"""
from __future__ import annotations

import argparse
import select
import sys
import time

import numpy as np

from ..net.rtp import RtpHeader, Encoding, PayloadRegistry, decode_samples, encode_samples
from ..net.multicast import resolve_dest, output_socket, listen_socket, DEFAULT_RTP_PORT


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="stereod-tpu")
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--ssrc", type=int, default=None)
    ap.add_argument("--duration", type=float, default=None)
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")  # tiny per-block FFTs: stay local
    import jax.numpy as jnp
    from ..models.wfm import wfm_geometry, wfm_design, _slave_fd

    geo = wfm_geometry()
    resp = {k: jnp.asarray(v) for k, v in wfm_design(geo).items()}

    @jax.jit
    def decode_block(tail, comp):
        buf = jnp.concatenate([tail, comp])[None, :]
        Fc = jnp.fft.rfft(buf, axis=-1).astype(jnp.complex64)
        nb, aL = geo.nb, geo.audio_L
        hm = Fc[:, : nb // 2 + 1] * resp["mono"][None, :]
        mono = jnp.fft.irfft(hm, n=nb, axis=-1)[:, nb - aL :]
        fds = jnp.stack([_slave_fd(Fc, resp["pilot"], geo.pilot_shift, nb, geo.Nc),
                         _slave_fd(Fc, resp["lminusr"], geo.subc_shift, nb, geo.Nc)])
        pilot, lmr = jnp.fft.ifft(fds, axis=-1)[..., nb - aL :]
        pnorm = jnp.maximum(pilot.real**2 + pilot.imag**2, 1e-30)
        sp = (pilot * pilot) / pnorm
        sub = 2.0 * (jnp.conj(sp) * lmr).imag
        left, right = mono + sub, mono - sub
        pilot_power = jnp.mean(pnorm, axis=-1)
        return buf[0, geo.Lc :], jnp.stack([left[0], right[0]], -1), pilot_power[0]

    rx = listen_socket(resolve_dest(args.input, DEFAULT_RTP_PORT))
    tx = output_socket(resolve_dest(args.output, DEFAULT_RTP_PORT))
    registry = PayloadRegistry()
    out_pt = registry.pt_from_info(48_000, 2, Encoding.S16BE)
    buf = np.zeros(0, np.float32)
    tail = jnp.zeros(geo.Mc - 1, jnp.float32)
    seq = ts = 0
    t_end = time.monotonic() + args.duration if args.duration else None
    try:
        while t_end is None or time.monotonic() < t_end:
            r, _, _ = select.select([rx], [], [], 0.2)
            if not r:
                continue
            pkt, _ = rx.recvfrom(65536)
            try:
                h, payload = RtpHeader.unpack(pkt)
            except Exception:
                continue
            if args.ssrc is not None and h.ssrc != args.ssrc:
                continue
            fmt = registry.info_from_pt(h.type)
            enc = fmt[2] if fmt else Encoding.S16BE
            try:
                buf = np.concatenate([buf, decode_samples(payload, enc)])
            except ValueError:
                continue
            while buf.size >= geo.Lc:
                blk, buf = buf[: geo.Lc], buf[geo.Lc :]
                tail, stereo, _pp = decode_block(tail, jnp.asarray(blk))
                audio = np.asarray(stereo) * 0.5
                for off in range(0, audio.shape[0], 350):
                    chunk = audio[off : off + 350]
                    tx.send(RtpHeader(type=out_pt, seq=seq, timestamp=ts, ssrc=h.ssrc).pack()
                            + encode_samples(chunk, Encoding.S16BE))
                    seq = (seq + 1) & 0xFFFF
                    ts = (ts + chunk.shape[0]) & 0xFFFFFFFF
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
