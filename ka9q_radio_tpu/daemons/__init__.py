"""Downstream decoder/transcoder daemons (reference L8, SURVEY.md §2.4).

These consume demodulated audio (RTP multicast or in-process engine
output) and produce decoded data — the host-side constellation around the
TPU channelizer, matching the reference's separate-process daemons:

  afsk/ax25   packetd.c  — Bell-202 AFSK demod + HDLC/AX.25 deframing
  aprs        aprs.c     — APRS position/status decode from AX.25
  morse       morse.c/cwd.c — text -> CW audio generator
  ctcss       ctcss.c    — Goertzel bank over the 55 standard PL tones
  rds         rdsd.c     — FM broadcast RDS (57 kHz BPSK) decoder

DSP here is deliberately host-side numpy: these run at audio rates (tens
of kHz per stream) where the TPU round-trip would dominate; the reference
also runs them as separate audio-rate processes.
"""
