"""Synthetic signal-generator front end — the framework's test fixture.

Behavioral equivalent of the reference's sig_gen driver
(/root/reference/src/sig_gen.c): a carrier of settable frequency and
amplitude plus calibrated Gaussian noise of settable spectral density N0,
in real or complex mode, optionally FM- or AM-modulated by a tone.

TPU-native differences: the generator is a pure jittable block function
(carrier phase kept as Q32 integer revolutions so it never loses precision;
noise from JAX's counter-based PRNG, so any block can be generated
independently and the stream is reproducible across shardings), rather than
a wall-clock-paced thread writing into a ring buffer.

Noise calibration (sig_gen.c:150-156): N0 is power per Hz relative to full
scale. A real stream of rate fs carries fs/2 Hz of (one-sided) bandwidth so
the sample variance is N0*fs/2; a complex stream carries fs Hz, variance
N0*fs split evenly between I and Q.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.osc import rev_to_q32, phase_ramp_q32

__all__ = ["SigGenConfig", "siggen_init", "siggen_block", "multi_tone_block"]


@dataclasses.dataclass(frozen=True)
class SigGenConfig:
    """Static generator parameters (config keys: sig_gen.c:36-49)."""

    samprate: float
    real: bool = True
    carrier_hz: float = 10_000_000.0
    amplitude: float = 0.1  # full-scale fraction (config is dBFS)
    noise_n0: float = 0.0  # power/Hz (config is dBFS/Hz); 0 = off
    # optional tone modulation
    fm_deviation_hz: float = 0.0  # peak deviation; 0 = no FM
    am_depth: float = 0.0  # 0..1; 0 = no AM
    tone_hz: float = 1000.0

    @property
    def noise_std(self) -> float:
        if self.noise_n0 <= 0:
            return 0.0
        bw = self.samprate / 2.0 if self.real else self.samprate
        return float(np.sqrt(self.noise_n0 * bw))


def siggen_init(cfg: SigGenConfig, seed: int = 0):
    """Carried generator state: carrier & tone phases (Q32 revs), PRNG key."""
    return {
        "phase": jnp.zeros((1,), jnp.int32),
        "tone_phase": jnp.zeros((1,), jnp.int32),
        "key": jax.random.PRNGKey(seed),
    }


def siggen_block(cfg: SigGenConfig, state, L: int):
    """Generate one block of L samples.

    Returns (new_state, samples) — float32 [L] (real) or complex64 [L].
    """
    key, sub = jax.random.split(state["key"])
    st = {"key": key}

    tone_inc = jnp.full((1,), rev_to_q32(cfg.tone_hz / cfg.samprate), jnp.int32)
    carrier_inc = jnp.full((1,), rev_to_q32(cfg.carrier_hz / cfg.samprate), jnp.int32)

    if cfg.fm_deviation_hz > 0.0:
        # FM: integrate deviation*tone into the carrier phase exactly in Q32
        tone_ramp, st["tone_phase"] = phase_ramp_q32(state["tone_phase"], tone_inc, L)
        dev_rev = cfg.fm_deviation_hz / cfg.samprate  # peak revs/sample
        dphi = (dev_rev * tone_ramp.real[0]).astype(jnp.float32)  # cos tone
        # deviation << fs, so |dphi| << 0.5 rev and the Q32 step fits int32
        dphi_q32 = jnp.round(dphi * np.float32(2.0**32)).astype(jnp.int32)
        phase_q32 = state["phase"][0] + carrier_inc[0] * jnp.arange(1, L + 1, dtype=jnp.int32) + jnp.cumsum(dphi_q32)
        st["phase"] = phase_q32[-1:]
        ph = jnp.concatenate([state["phase"], phase_q32[:-1]])
        rev = ph.astype(jnp.float32) * np.float32(2.0**-32)
        carrier = jnp.exp(1j * (2 * np.pi) * rev).astype(jnp.complex64)[None, :]
    else:
        carrier, st["phase"] = phase_ramp_q32(state["phase"], carrier_inc, L)
        if cfg.am_depth > 0.0:
            tone_ramp, st["tone_phase"] = phase_ramp_q32(state["tone_phase"], tone_inc, L)
            carrier = carrier * (1.0 + cfg.am_depth * tone_ramp.real)
        else:
            st["tone_phase"] = state["tone_phase"]
    sig = cfg.amplitude * carrier[0]

    if cfg.real:
        out = sig.real
        if cfg.noise_std > 0.0:
            out = out + cfg.noise_std * jax.random.normal(sub, (L,), jnp.float32)
        return st, out.astype(jnp.float32)
    else:
        if cfg.noise_std > 0.0:
            n = jax.random.normal(sub, (L, 2), jnp.float32) * np.float32(cfg.noise_std / np.sqrt(2.0))
            sig = sig + (n[:, 0] + 1j * n[:, 1])
        return st, sig.astype(jnp.complex64)


def multi_tone_block(state, freqs_hz, amps, samprate: float, L: int, real: bool = True):
    """Many simultaneous carriers in one block — fixture for multichannel
    tests and benchmarks (N carriers, one per receiver channel).

    state: {"phase": [K] int32 Q32, "key": PRNGKey} ; freqs/amps: [K] host
    arrays. Returns (new_state, samples[L]).
    """
    incs = jnp.asarray([rev_to_q32(f / samprate) for f in np.asarray(freqs_hz)], jnp.int32)
    ramp, new_phase = phase_ramp_q32(state["phase"], incs, L)  # [K, L] complex64
    amps = jnp.asarray(amps, jnp.float32)[:, None]
    sig = jnp.sum(amps * (ramp.real if real else ramp), axis=0)
    dtype = jnp.float32 if real else jnp.complex64
    return {"phase": new_phase, "key": state["key"]}, sig.astype(dtype)
