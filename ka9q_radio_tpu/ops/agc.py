"""Block AGC for linear modes (linear.c:199-266, docs/KA9Q-AGC.md).

The reference's AGC makes ONE decision per 20 ms block, then applies a
closed-form per-sample exponential gain ramp — which is exactly a
TPU-friendly shape: no per-sample scan, just a branchless decision vector
and a `gain * ratio**(n/N)` ramp, batched over channels.

Decision order (highest priority first):
  1. 2 ms sub-block peak > +3 dB over headroom  -> clamp gain instantly,
     hang 80 ms
  2. block RMS over headroom                    -> ramp down to target over
     the block, hang `hangtime`
  3. noise amplitude over threshold*headroom    -> ramp down (no hang change)
  4. hang timer active                          -> hold gain
  5. otherwise                                  -> recover at recovery_rate
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["agc_init", "agc_block"]


def agc_init(n: int, gain_db: float = 0.0):
    return {
        "gain": jnp.full((n,), float(10.0 ** (gain_db / 20.0)), jnp.float32),
        "hangcount": jnp.zeros((n,), jnp.int32),
    }


def agc_block(
    state,
    bb,
    bb_power,
    n0,
    *,
    enable,
    headroom,
    hangtime_samples,
    recovery_per_sample,
    threshold,
    bandwidth,
    samprate: int,
    blocktime: float,
):
    """One AGC block decision + the per-sample gain ramp.

    Args:
      state: {gain[C], hangcount[C]}.
      bb: [C, N] complex64 baseband (post fine-tuning / post shift).
      bb_power: [C] mean |bb|^2 of this block.
      n0: [C] smoothed noise density estimate.
      enable: [C] bool — AGC on (off -> constant manual gain).
      headroom: [C] linear target amplitude (dB2voltage of -headroom dB).
      hangtime_samples: [C] int32.
      recovery_per_sample: [C] linear per-sample gain growth factor.
      threshold: [C] linear noise threshold factor.
      bandwidth: [C] |max_IF - min_IF| Hz.
      samprate, blocktime: static.

    Returns (new_state, gain_ramp[C, N]).
    """
    N = bb.shape[-1]
    gain = state["gain"]
    hang = state["hangcount"]

    power = bb.real * bb.real + bb.imag * bb.imag  # [C, N] (no sqrt-then-square)
    # 2 ms sub-block peak RMS amplitude (linear.c:227-245)
    sps = min(max(int(round(N * 0.002 / blocktime)), 1), N)
    nslices = max(N // sps, 1)  # degenerate short blocks: one slice
    sub = power[:, : nslices * sps].reshape(power.shape[0], nslices, sps)
    peak = jnp.sqrt(jnp.max(jnp.mean(sub, axis=-1), axis=-1))  # [C]

    ampl = jnp.sqrt(bb_power)
    bn = jnp.sqrt(bandwidth * jnp.maximum(n0, 0.0))  # noise amplitude

    sqrt2 = jnp.float32(1.4142135)
    eps = jnp.float32(1e-30)

    c_peak = peak * gain > sqrt2 * headroom
    c_strong = ampl * gain > headroom
    c_noise = bn * gain > threshold * headroom
    c_hang = hang > 0

    inv_n = jnp.float32(1.0 / N)
    gc_strong = jnp.power(jnp.maximum(headroom / (ampl * gain + eps), eps), inv_n)
    gc_noise = jnp.power(jnp.maximum(threshold * headroom / (bn * gain + eps), eps), inv_n)

    # priority select of per-sample gain_change and the new hang counter
    gain_change = jnp.where(
        c_peak,
        1.0,
        jnp.where(
            c_strong,
            gc_strong,
            jnp.where(c_noise, gc_noise, jnp.where(c_hang, 1.0, recovery_per_sample)),
        ),
    )
    new_hang = jnp.where(
        c_peak,
        jnp.int32(round(0.08 * samprate)),
        jnp.where(
            c_strong,
            hangtime_samples,
            jnp.where(c_noise | ~c_hang, hang, jnp.maximum(hang - N, 0)),
        ),
    )
    # instant clamp for case 1
    gain0 = jnp.where(c_peak, sqrt2 * headroom / jnp.maximum(peak, eps), gain)

    gain_change = jnp.where(enable, gain_change, 1.0)
    gain0 = jnp.where(enable, gain0, gain)
    new_hang = jnp.where(enable, new_hang, hang)

    n_idx = jnp.arange(N, dtype=jnp.float32)
    ramp = gain0[:, None] * jnp.exp(n_idx[None, :] * jnp.log(gain_change)[:, None])
    new_gain = gain0 * jnp.power(gain_change, jnp.float32(N))
    return {"gain": new_gain.astype(jnp.float32), "hangcount": new_hang}, ramp.astype(jnp.float32)
