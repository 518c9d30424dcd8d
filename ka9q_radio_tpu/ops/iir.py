"""IIR filters, smoothers, and Goertzel single-bin DFT — scan-friendly.

TPU-first realization of the reference's iir.c/iir.h:

* First-order recurrences (exponential smoothers, FM de-emphasis, DC
  removal, the complex notch) are linear: y[n] = c*y[n-1] + d[n].  We run
  them with `jax.lax.associative_scan` in O(log T) depth instead of a
  sequential per-sample loop — the per-channel batch rides the VPU lanes.
* General direct-form-II IIR (order <= 6; used for the 300 Hz CTCSS LPF and
  PL notch) runs as a `lax.scan` over samples, vmapped over channels.
* Goertzel (CTCSS tone detection, fm.c:279-325) keeps (s0, s1) state across
  blocks so multi-block integration periods (240 ms) work inside a
  per-block jitted step.

Coefficient designers (notch/lowpass/dc) are host-side numpy float64 and use
the same pole/zero placements as the reference (iir.c:54-104).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "first_order_scan",
    "ema_smooth",
    "iir_notch_coeffs",
    "iir_lp4_coeffs",
    "iir_dc_coeffs",
    "iir_apply",
    "goertzel_coeff",
    "goertzel_init",
    "goertzel_update_block",
    "goertzel_output",
]


# ---------------------------------------------------------------------------
# First-order linear recurrence: y[n] = c[n]*y[n-1] + d[n]
# ---------------------------------------------------------------------------


def first_order_scan(c, d, y0, axis: int = -1):
    """Solve y[n] = c[n]*y[n-1] + d[n] along `axis` with an associative scan.

    c may be scalar (broadcast) or per-sample. Returns y with the same shape
    as d. y0 broadcasts against d with `axis` removed.
    """
    d = jnp.asarray(d)
    c = jnp.broadcast_to(jnp.asarray(c, d.dtype), d.shape)
    # fold the initial condition into the first input
    y0 = jnp.asarray(y0, d.dtype)
    d0 = jax.lax.index_in_dim(d, 0, axis, keepdims=True)
    c0 = jax.lax.index_in_dim(c, 0, axis, keepdims=True)
    d = jax.lax.concatenate(
        [d0 + c0 * jnp.expand_dims(y0, axis), jax.lax.slice_in_dim(d, 1, d.shape[axis], axis=axis)],
        dimension=axis % d.ndim,
    )

    def combine(a, b):
        (ca, da), (cb, db) = a, b
        return ca * cb, da * cb + db

    _, y = jax.lax.associative_scan(combine, (c, d), axis=axis)
    return y


def ema_smooth(x, alpha, y0, axis: int = -1):
    """Exponential smoother y[n] = y[n-1] + alpha*(x[n] - y[n-1])."""
    alpha = jnp.asarray(alpha, jnp.result_type(x))
    return first_order_scan(1.0 - alpha, alpha * jnp.asarray(x), y0, axis=axis)


# ---------------------------------------------------------------------------
# Direct-form-II IIR (order <= 6), host-designed coefficients
# ---------------------------------------------------------------------------


def iir_notch_coeffs(rel_freq: float, r: float = 0.997):
    """2-pole real notch at rel_freq (fraction of sample rate); iir.c:54-77."""
    b = np.array([1.0, -2.0 * np.cos(2 * np.pi * rel_freq), 1.0])
    a = np.array([1.0, b[1] * r, r * r])
    return b, a


def iir_lp4_coeffs(rel_freq: float):
    """4-stage lowpass (Smith DSP guide p.326 form); iir.c:82-93."""
    x = np.exp(-14.445 * rel_freq)
    b = np.array([(1 - x) ** 4, 0.0, 0.0, 0.0, 0.0])
    a = np.array([1.0, -4 * x, 6 * x * x, -4 * x**3, x**4])
    return b, a


def iir_dc_coeffs(c: float = 0.999):
    """First-order DC blocker; iir.c:96-104."""
    b = np.array([(1 + c) / 2, -(1 + c) / 2])
    a = np.array([1.0, -c])
    return b, a


def iir_apply(x, b, a, w0=None, axis: int = -1):
    """Apply a direct-form-II IIR along `axis` (lax.scan; iir.c:107-124).

    Args:
      x: real input [..., T] (axis moved internally).
      b, a: feedforward/feedback coefficient vectors (host numpy or jnp),
        a[0] assumed 1. May be batched with leading dims matching x's
        batch dims for per-channel filters.
      w0: optional initial state [..., order] (default zeros).

    Returns: (y, w_final) — filtered output and final state for carry-over
      across blocks.
    """
    x = jnp.asarray(x)
    x = jnp.moveaxis(x, axis, -1)
    b = jnp.asarray(b, x.dtype)
    a = jnp.asarray(a, x.dtype)
    order = a.shape[-1] - 1
    batch_shape = x.shape[:-1]
    if w0 is None:
        w0 = jnp.zeros(batch_shape + (order,), x.dtype)

    a_fb = a[..., 1:]  # feedback coeffs
    xt = jnp.moveaxis(x, -1, 0)  # [T, ...]

    def step(w, xn):
        # w: [..., order] holds w[n-1]..w[n-order]
        w_new0 = xn - jnp.sum(a_fb * w, axis=-1)
        wfull = jnp.concatenate([w_new0[..., None], w], axis=-1)  # w[n]..w[n-order]
        y = jnp.sum(b * wfull[..., : b.shape[-1]], axis=-1)
        return wfull[..., :order], y

    w_final, yt = jax.lax.scan(step, w0, xt)
    y = jnp.moveaxis(yt, 0, -1)
    return jnp.moveaxis(y, -1, axis), w_final


# ---------------------------------------------------------------------------
# Goertzel single-bin DFT (iir.h:26-48)
# ---------------------------------------------------------------------------


def goertzel_coeff(rel_freq):
    """(coeff, cf) for a Goertzel bin at rel_freq (fraction of sample rate).

    coeff = 2*cos(2*pi*f); cf = exp(-j*2*pi*f). Host or device values.
    """
    f = jnp.asarray(rel_freq, jnp.float32)
    c = jnp.cos(2 * jnp.pi * f)
    s = jnp.sin(2 * jnp.pi * f)
    return 2.0 * c, jax.lax.complex(c, -s)


def goertzel_init(shape=()):
    return {
        "s0": jnp.zeros(shape, jnp.float32),
        "s1": jnp.zeros(shape, jnp.float32),
    }


def goertzel_update_block(state, x, coeff):
    """Run the Goertzel recurrence over a block.

    s0 = x + coeff*s0_prev - s1_prev; s1 = s0_prev  (iir.h:39-44).
    x: [..., T]; coeff broadcastable to x's batch shape. Sequential scan over
    T (the recurrence is 2nd order linear — could be associative-scanned,
    but T is a few hundred samples and this runs once per block).
    """
    xt = jnp.moveaxis(jnp.asarray(x, jnp.float32), -1, 0)
    coeff = jnp.asarray(coeff, jnp.float32)

    def step(carry, xn):
        s0, s1 = carry
        s0_new = xn + coeff * s0 - s1
        return (s0_new, s0), None

    (s0, s1), _ = jax.lax.scan(step, (state["s0"], state["s1"]), xt)
    return {"s0": s0, "s1": s1}


def goertzel_output(state, coeff, cf):
    """Finalize: push one zero sample, return s0 - cf*s1 (iir.c:44-48).

    Gain: N on-frequency unit-peak sinusoid samples -> magnitude N/2.
    Does not mutate state; caller resets via goertzel_init for a new period.
    """
    s0 = coeff * state["s0"] - state["s1"]
    s1 = state["s0"]
    return jax.lax.complex(s0, jnp.zeros_like(s0)) - cf * jax.lax.complex(
        s1, jnp.zeros_like(s1)
    )
