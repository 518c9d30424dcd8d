"""Real-time multicast audio playout — the monitor's data engine.

Behavioral equivalent of the reference monitor's per-session pipeline
(/root/reference/src/monitor-data.c:525-758, monitor.c:642 pa_callback):

  * a playout RING per session, 2.73 s deep (monitor.h:10 BUFFERSIZE),
    written at RTP-timestamp-derived positions so out-of-order packets
    land in the right place with no explicit reorder queue;
  * loss handling: Opus packet-loss concealment for coded streams, zero
    fill (silence) for PCM gaps — late packets that arrive before their
    slot plays still get mixed;
  * per-session CLOCK TRACKING: sender and receiver sample clocks drift;
    a slewed resampling ratio (the libsamplerate analog,
    monitor-data.c:758) nudges the session's playout rate so the queue
    depth holds at the target latency instead of slowly draining into
    underruns or bloating into latency;
  * a mixer "callback" that pulls one block from every ring at the global
    playout clock, applies per-session gain/pan, and hands the mixed
    stereo block to the sink (stdout/raw/WAV) — portaudio's role here.

Resampling is vectorized linear interpolation (numpy), not
sample-and-hold; the PL notch lives in cli/monitor.py on top of this.
"""
from __future__ import annotations

import numpy as np

from .rtp import RtpHeader, Encoding, decode_samples

__all__ = ["PlayoutSession", "Mixer", "RING_SECONDS"]

RING_SECONDS = 2.73  # playout ring depth (monitor.h:10)
TARGET_LATENCY = 0.10  # nominal queue depth the clock tracker holds, s
MAX_SLEW = 500e-6  # clamp resampling-ratio correction to +-500 ppm
SLEW_GAIN = 0.02  # proportional gain: fraction of depth error per second


class PlayoutSession:
    """One SSRC's jitter-buffered, clock-tracked playout ring."""

    def __init__(self, ssrc: int, samprate: int, channels: int,
                 encoding: Encoding, out_rate: int,
                 target_latency: float = TARGET_LATENCY):
        self.ssrc = ssrc
        self.samprate = samprate
        self.channels = max(1, min(2, channels))
        self.encoding = encoding
        self.out_rate = out_rate
        self.target = target_latency
        self.ring_frames = int(RING_SECONDS * out_rate)
        self.ring = np.zeros((self.ring_frames, 2), np.float32)
        self.gain = 1.0
        self.pan = 0.0  # -1 full left .. +1 full right
        self.filter = None  # optional frames->frames hook (PL notch etc.)
        # mapping sender RTP timestamps -> receiver playout frames:
        # out_frame = (rtp_ts - ts0) * ratio + base; established on the
        # first packet, then `ratio` slewed by the clock tracker
        self.ts0: int | None = None
        self.base: int = 0
        self.ratio = out_rate / samprate
        self.nominal = out_rate / samprate
        # stats (monitor.h:89-98)
        self.packets = 0
        self.late = 0  # arrived after its slot already played
        self.early = 0  # too far ahead of the play head (absurd ts jump)
        self.drops = 0  # sequence gaps seen
        self.resets = 0  # timestamp discontinuities resynced
        self.last_seq: int | None = None
        self.level = 0.0
        self.opus = None
        self._late_run = 0  # consecutive late packets (rebase trigger)
        self._max_written = 0  # highest absolute frame written (for depth)
        if encoding in (Encoding.OPUS, Encoding.OPUS_VOIP):
            from .opus import OpusDecoder

            self.opus = OpusDecoder(48_000, 2)
            self.samprate = 48_000  # Opus timestamps always tick at 48k
            self.ratio = self.nominal = out_rate / 48_000.0

    # -- ingest --------------------------------------------------------------
    def _decode(self, payload: bytes, gap_frames: int) -> np.ndarray:
        if self.opus is not None:
            out = []
            if gap_frames > 0:  # Opus PLC fills the hole (monitor-data.c:560)
                # PLC length is in DECODER samples (48k) and must be a
                # multiple of 2.5 ms (120 frames)
                n48 = int(gap_frames / self.ratio) // 120 * 120
                if n48 > 0:
                    out.append(self.opus.decode(None, min(n48, 5760)))
            out.append(self.opus.decode(payload))
            a = np.concatenate([o.reshape(-1, 2) for o in out], axis=0)
            return a
        a = decode_samples(payload, self.encoding).reshape(-1, self.channels)
        if self.channels == 1:
            a = np.repeat(a, 2, axis=1)
        return a

    def ingest(self, hdr: RtpHeader, payload: bytes, play_head: int):
        """Land one RTP packet in the ring. play_head: the mixer's global
        output-frame counter (the 'now' the callback reads at)."""
        self.packets += 1
        gap = 0
        if self.last_seq is not None:
            delta = (hdr.seq - self.last_seq) & 0xFFFF
            if delta == 0:
                return  # duplicate
            if delta > 1 and delta < 0x8000:
                self.drops += delta - 1
                gap = 1  # PLC hint; actual length from the timestamp jump
        self.last_seq = hdr.seq

        if self.ts0 is None:
            self.ts0 = hdr.timestamp
            # start the stream target_latency ahead of the play head
            self.base = play_head + int(self.target * self.out_rate)

        ts_rel = (hdr.timestamp - self.ts0) & 0xFFFFFFFF
        if ts_rel >= 1 << 31:  # wrapped/behind
            ts_rel -= 1 << 32
        want = self.base + ts_rel * self.ratio  # fractional output frame

        # timestamp sanity: a jump beyond the ring means the sender
        # restarted — resync like a fresh stream (monitor-data.c resync)
        if want - play_head > self.ring_frames or play_head - want > self.ring_frames:
            self.resets += 1
            self.ts0 = hdr.timestamp
            self.base = play_head + int(self.target * self.out_rate)
            want = float(self.base)

        gap_frames = 0
        if self.opus is not None and gap:
            expect = self._max_written
            gap_frames = max(0, int(want) - expect)
        audio = self._decode(payload, gap_frames)
        if audio.size == 0:
            return
        self.level = 0.9 * self.level + 0.1 * float(np.sqrt(np.mean(audio**2)))

        # resample to the output rate at the slewed ratio (vectorized
        # linear interpolation; the libsamplerate analog). Each packet is
        # resampled on its own and placed at its timestamp-derived slot,
        # so placement and length stay mutually consistent as the ratio
        # slews (boundary error < 1 output sample).
        n_in = audio.shape[0]
        n_out = max(1, int(round(n_in * self.ratio)))
        pos = np.arange(n_out) / self.ratio
        i0 = np.minimum(pos.astype(np.int64), n_in - 1)
        i1 = np.minimum(i0 + 1, n_in - 1)
        fr = (pos - i0).astype(np.float32)[:, None]
        frames = audio[i0] * (1.0 - fr) + audio[i1] * fr
        if self.filter is not None:
            frames = np.asarray(self.filter(frames), np.float32)

        start = int(np.round(want))
        if start + n_out <= play_head:
            self.late += 1
            self._late_run += 1
            # a PERSISTENTLY late sender (slow/stalled source, monitor
            # started mid-burst) means our base is wrong, not the network:
            # rebase the stream target_latency ahead instead of discarding
            # everything (monitor-data.c late-window resync)
            if self._late_run >= 25:
                self.resets += 1
                self.ts0 = hdr.timestamp
                self.base = play_head + int(self.target * self.out_rate)
                self._late_run = 0
                start = self.base
            else:
                return
        elif start < play_head:  # partially late: keep the tail
            cut = play_head - start
            frames = frames[cut:]
            start = play_head
            self.late += 1
            self._late_run += 1
        else:
            self._late_run = 0
        # write into the ring at absolute frames [start, start+len)
        idx = (start + np.arange(frames.shape[0])) % self.ring_frames
        self.ring[idx] = frames
        self._max_written = max(self._max_written, start + frames.shape[0])

        # clock tracking: hold queue depth at target by slewing the ratio.
        # Too deep (err > 0) -> place/stretch future packets onto FEWER
        # output frames (ratio below nominal) so the play head eats into
        # the backlog; too shallow -> stretch onto more.
        depth = (self._max_written - play_head) / self.out_rate
        err = depth - self.target
        slew = np.clip(-SLEW_GAIN * err, -MAX_SLEW, MAX_SLEW)
        self.ratio = self.nominal * (1.0 + slew)

    # -- playout -------------------------------------------------------------
    def pull(self, play_head: int, n: int) -> np.ndarray | None:
        """Read (and consume) n output frames at the global play head.
        Returns None if this session has nothing buffered there (underrun
        accounting is the mixer's job — silence is silence)."""
        if self.ts0 is None or self._max_written <= play_head:
            return None
        idx = (play_head + np.arange(n)) % self.ring_frames
        out = self.ring[idx].copy()
        self.ring[idx] = 0.0  # consume so stale audio never replays
        lg = self.gain * (1.0 - max(self.pan, 0.0))
        rg = self.gain * (1.0 + min(self.pan, 0.0))
        out[:, 0] *= np.float32(lg)
        out[:, 1] *= np.float32(rg)
        return out

    @property
    def active(self) -> bool:
        return self.ts0 is not None


class Mixer:
    """The portaudio-callback analog: a global output-frame clock; each
    block, every session's ring contributes at the play head."""

    def __init__(self, out_rate: int = 48_000, block_frames: int = 960):
        self.out_rate = out_rate
        self.block = block_frames
        self.play_head = 0
        self.sessions: dict[int, PlayoutSession] = {}
        self.underruns = 0  # blocks where an active session had no data

    def session(self, ssrc: int, samprate: int, channels: int,
                encoding: Encoding) -> PlayoutSession:
        s = self.sessions.get(ssrc)
        if s is None:
            s = self.sessions[ssrc] = PlayoutSession(
                ssrc, samprate, channels, encoding, self.out_rate)
        return s

    def ingest(self, hdr: RtpHeader, payload: bytes, fmt) -> None:
        s = self.session(hdr.ssrc, *fmt)
        s.ingest(hdr, payload, self.play_head)

    def next_block(self) -> np.ndarray:
        """Mix and return one stereo [block, 2] float32 chunk, advancing
        the playout clock."""
        out = np.zeros((self.block, 2), np.float32)
        for s in self.sessions.values():
            if not s.active:
                continue
            # a session that has started but has nothing at the play head
            # is an underrun (late network, clock undershoot)
            if s._max_written <= self.play_head and s.packets > 2:
                self.underruns += 1
                continue
            chunk = s.pull(self.play_head, self.block)
            if chunk is not None:
                out += chunk
        self.play_head += self.block
        return out
