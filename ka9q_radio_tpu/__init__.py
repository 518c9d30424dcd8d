"""ka9q_radio_tpu — a TPU-native multichannel software-defined-radio framework.

A ground-up JAX/XLA/Pallas design with the capabilities of Phil Karn's
ka9q-radio (reference surveyed in SURVEY.md): one shared forward FFT over a
wideband A/D stream feeds a Borgerding-style overlap-save fast-convolution
filter bank serving thousands of independently tuned receiver channels, each
with frequency-domain selection/filtering/decimation, fine-tune phase
rotation, and a demodulator (linear AM/SSB/CW/IQ with AGC+PLL, NBFM with
CTCSS, WFM stereo, spectrum analysis).

Layout (TPU-first, not a C translation):
  ops/       device DSP kernels: master FFT, filter-bank extraction, NCO/PLL,
             IIR/Goertzel, AGC, noise estimation (JAX + Pallas)
  models/    demodulators as vmapped pure functions over [channels, time]
  runtime/   engine (jitted block step with carried state), channel groups,
             front ends (sig_gen, file, RTP)
  parallel/  device meshes, channel/time sharding, halo exchange, sharded FFT
  net/       RTP / TLV-status / multicast host bridge (wire-compatible with
             ka9q-radio clients)
  config/    INI config + preset tables (ka9q-radio compatible surface)
  cli/       client tools (tune, powers, metadump, pcmrecord, monitor, control)
  utils/     units, parsing, small math helpers
"""

__version__ = "0.1.0"
