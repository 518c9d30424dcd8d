"""Oscillators, NCOs, and PLL — phase bookkeeping in revolutions.

TPU-first design: instead of the reference's renormalized complex rotator
(osc.c:17-71), all phase accumulators are 32-bit fixed-point *revolutions*
(Q32): int32 wrap-around arithmetic is exact mod-1 phase arithmetic, so phase
stays continuous over unbounded run time with zero drift and no renorm step.
The reference's own NCO uses the same representation (32-bit phase
accumulator, osc.c:76-127), and its sincospi.c keeps phase in revolutions for
the same reason.

All functions here are pure and jit/vmap/scan-friendly.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "rev_to_q32",
    "q32_to_rev",
    "cis_q32",
    "phase_ramp_q32",
    "pll_params",
    "pll_init",
    "pll_step",
]

_TWO_POW_32 = float(2**32)
_Q32_TO_REV = np.float32(2.0**-32)  # int32 -> revolutions in [-0.5, 0.5)
_TWO_PI = np.float32(2.0 * np.pi)


def rev_to_q32(rev) -> np.int32:
    """Host: revolutions (float, any magnitude) -> Q32 phase word.

    Exact rational arithmetic via Python ints so repeated block updates done
    on device (int32 adds) stay phase-continuous indefinitely.
    """
    q = int(round((float(rev) % 1.0) * _TWO_POW_32)) & 0xFFFFFFFF
    return np.int32(q - 2**32 if q >= 2**31 else q)


def q32_to_rev(q) -> jnp.ndarray:
    """Q32 phase word(s) -> revolutions in [-0.5, 0.5), float32."""
    return jnp.asarray(q, jnp.int32).astype(jnp.float32) * _Q32_TO_REV


def cis_q32(q) -> jnp.ndarray:
    """exp(+j*2*pi*phase) for Q32 phase word(s). complex64."""
    ph = q32_to_rev(q) * _TWO_PI
    return jax.lax.complex(jnp.cos(ph), jnp.sin(ph))


def phase_ramp_q32(acc_q32, inc_q32, n: int):
    """Per-sample NCO phase ramp for a block.

    Args:
      acc_q32: [...] int32 starting phase accumulator(s).
      inc_q32: [...] int32 per-sample phase increment(s).
      n: static block length.

    Returns:
      (ramp, new_acc): ramp complex64 [..., n] with ramp[..., i] =
      exp(j*2*pi*(acc + i*inc)); new_acc int32 = acc + n*inc (mod 2^32).
      Matches the reference's step_osc(), which returns the phasor BEFORE
      advancing it (osc.c:62-71) — sample i carries phase acc + i*inc.
    """
    acc = jnp.asarray(acc_q32, jnp.int32)
    inc = jnp.asarray(inc_q32, jnp.int32)
    steps = jnp.arange(0, n, dtype=jnp.int32)
    # int32 multiply/add wrap-around == exact mod-2^32 phase arithmetic
    q = acc[..., None] + inc[..., None] * steps
    new_acc = acc + inc * jnp.int32(n)
    return cis_q32(q), new_acc


# ---------------------------------------------------------------------------
# Type-2 PLL (reference: osc.c:131-207). Loop constants from bandwidth
# (cycles/sample) and damping; per-sample step is a pure scan function.
# ---------------------------------------------------------------------------


def pll_params(bw, damping=float(1.0 / np.sqrt(2.0))):
    """Loop constants (K1, K2) from bandwidth (cycles/sample) and damping.

    Same mapping as the reference's set_pll_params (osc.c:153-168).
    Accepts scalars or arrays (per-channel vectors).
    """
    bw = jnp.abs(jnp.asarray(bw, jnp.float32))
    damping = jnp.asarray(damping, jnp.float32)
    denom = damping + 1.0 / (4.0 * damping)
    theta = 4.0 * jnp.pi * bw / denom
    D = 1.0 + 2.0 * damping * theta + theta * theta
    k1 = 4.0 * damping * theta / D
    k2 = 4.0 * theta * theta / D
    return k1, k2


def pll_init(shape=()):
    """Fresh PLL state pytree: VCO phase (Q32), integrator u (cycles/sample),
    and wrap counter (int32 revolutions count)."""
    return {
        "vco_phase": jnp.zeros(shape, jnp.int32),
        "u": jnp.zeros(shape, jnp.float32),
        "phi": jnp.zeros(shape, jnp.float32),
        "wraps": jnp.zeros(shape, jnp.int32),
    }


def pll_step(state, phase_err, k1, k2, lower_limit=-0.5, upper_limit=0.5):
    """One PLL sample update. phase_err in revolutions (cycles).

    Returns (new_state, vco_freq_u) where u is the integrated frequency in
    cycles/sample (the reference's run_pll return value, radio.c uses it as
    the frequency-offset readout).
    """
    u_new = state["u"] + k2 * phase_err
    dphi = u_new + k1 * phase_err
    over = dphi > upper_limit
    under = dphi < lower_limit
    # freeze the integrator when pushing past a clamped VCO limit
    u_new = jnp.where(over & (phase_err > 0), state["u"], u_new)
    u_new = jnp.where(under & (phase_err < 0), state["u"], u_new)
    dphi = jnp.clip(dphi, lower_limit, upper_limit)

    phi = state["phi"] + dphi
    wraps = state["wraps"] + jnp.where(phi > 1.0, 1, 0) - jnp.where(phi < -1.0, 1, 0)
    phi = jnp.where(phi > 1.0, phi - 1.0, jnp.where(phi < -1.0, phi + 1.0, phi))

    # Q32 VCO phase step: exact wrap-around accumulation. Clip just inside
    # +/-0.5 rev so the f32->int32 conversion can't overflow at the limits.
    half = np.float32(0.49999997)
    vco_step = (jnp.clip(dphi, -half, half) * np.float32(_TWO_POW_32)).astype(jnp.int32)
    new_state = {
        "vco_phase": state["vco_phase"] + vco_step,
        "u": u_new,
        "phi": phi,
        "wraps": wraps,
    }
    return new_state, u_new
