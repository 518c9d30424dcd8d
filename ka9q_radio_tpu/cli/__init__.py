"""Client CLIs — the host-side counterparts of the reference's L7 apps:

  radiod-tpu     the daemon (main.c)
  tune-tpu       one-shot tune/poll client (tune.c)
  powers-tpu     spectrum bin-power poller (powers.c)
  metadump-tpu   TLV packet tracer (metadump.c)
  pcmrecord-tpu  RTP stream recorder -> WAV/raw (pcmrecord.c)
  monitor-tpu    multicast audio monitor: session stats + mixdown (monitor.c)
  control-tpu    interactive channel control (control.c, line-oriented)

All speak the reference's wire protocols, so they interoperate with a stock
radiod as well as with radiod-tpu.
"""
