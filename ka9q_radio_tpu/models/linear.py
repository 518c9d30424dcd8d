"""Linear demodulator: SSB/CW/AM/SAM/DSB/IQ/envelope (linear.c).

A pure per-block function over a channel group's [C, N] complex baseband:
  1. optional PLL carrier tracking (lax.scan per sample — the only
     sequential part; vmapped across the channel batch so each scan step is
     a [C]-wide VPU op), with squaring for DSB and small-angle approximations
     when locked (linear.c:114-185)
  2. post-detection frequency shift (CW offset) via Q32 NCO ramp
  3. block AGC (ops/agc.py)
  4. detection: mono I / envelope with DC removal / stereo I-Q or I-env
  5. SNR + multi-frame squelch sequencer (linear.c:344-388)

Group-static flags (compile-time): enable_pll, envelope, stereo.
Per-channel runtime params are tensors; state is a pytree carried by the
engine's jitted step.
"""
from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.agc import agc_block, agc_init
from ..ops.osc import pll_params, pll_init, pll_step, phase_ramp_q32, q32_to_rev
from ..ops.iir import first_order_scan

__all__ = ["linear_init", "linear_demod", "LINEAR_DEFAULTS"]

LINEAR_DEFAULTS = dict(
    headroom_db=-10.0,  # target output level dBFS (linear.c:7)
    hangtime=1.1,  # AGC hang seconds (linear.c:8)
    recovery_rate_db=20.0,  # AGC recovery dB/s (linear.c:9)
    threshold_db=-15.0,  # AGC noise threshold dB (linear.c:11)
    pll_damping=float(1.0 / np.sqrt(2.0)),
    pll_locktime=0.5,  # seconds (linear.c:13)
)


def linear_init(n: int, gain_db: float = 0.0) -> dict[str, Any]:
    """Per-channel carried state for a linear group of n channels."""
    return {
        "agc": agc_init(n, gain_db),
        "pll": pll_init((n,)),
        "pll_lock": jnp.zeros((n,), jnp.bool_),
        "pll_lock_count": jnp.zeros((n,), jnp.int32),
        "shift_acc": jnp.zeros((n,), jnp.int32),  # post-detection shift NCO
        "am_dc": jnp.zeros((n,), jnp.float32),  # envelope DC remover
        "squelch_state": jnp.zeros((n,), jnp.int32),
        "squelch_open": jnp.ones((n,), jnp.bool_),
    }


def _run_pll(bb, state, params, samprate: int):
    """Per-sample PLL over the block. Returns (bb_mixed, new state pieces,
    snr, cphase, rotations)."""
    C, N = bb.shape
    square = params["pll_square"]  # [C] bool
    loop_bw = params["pll_loop_bw"] / samprate  # [C] cycles/sample
    bw = jnp.where(state["pll_lock"], loop_bw * 0.1, loop_bw)
    k1, k2 = pll_params(bw, LINEAR_DEFAULTS["pll_damping"])

    locked = state["pll_lock"]

    def step(carry, s_in):
        pll_st, sig, noi = carry
        vco = jnp.exp(1j * (2 * np.pi) * q32_to_rev(pll_st["vco_phase"])).astype(jnp.complex64)
        s = s_in * jnp.conj(vco)
        re, im = s.real, s.imag
        mag = jnp.abs(s)
        # locked small-angle forms vs full atan2 (linear.c:127-150)
        ph_lock = jnp.where(
            square,
            re * im / jnp.where(jnp.abs(re * re - im * im) > 1e-30, re * re - im * im, 1e-30),
            jnp.where(mag > 0, im / jnp.maximum(mag, 1e-30), 0.0),
        )
        s2 = s * s
        ph_unlock = jnp.where(
            square,
            0.5 * jnp.arctan2(s2.imag, s2.real),
            jnp.arctan2(im, re),
        )
        phase = jnp.where(locked, ph_lock, ph_unlock) / (2 * np.pi)
        pll_st, _u = pll_step(pll_st, phase, k1, k2)
        return (pll_st, sig + re * re, noi + im * im), s

    init = (state["pll"], jnp.zeros(C, jnp.float32), jnp.zeros(C, jnp.float32))
    (pll_st, signal, noise), mixed = jax.lax.scan(step, init, jnp.swapaxes(bb, 0, 1))
    mixed = jnp.swapaxes(mixed, 0, 1)

    snr = jnp.where(noise > 0, jnp.maximum(signal / jnp.maximum(noise, 1e-30) - 1.0, 0.0), jnp.inf)

    # lock detector with hysteresis (linear.c:162-180)
    lock_limit = (LINEAR_DEFAULTS["pll_locktime"] * samprate)
    lc = state["pll_lock_count"]
    lc = jnp.where(snr < params["squelch_close"], lc - N, jnp.where(snr > params["squelch_open"], lc + N, lc))
    lc = jnp.clip(lc, -int(lock_limit), int(lock_limit))
    newly_locked = (~state["pll_lock"]) & (lc >= int(lock_limit))
    lock = jnp.where(lc >= int(lock_limit), True, jnp.where(lc <= -int(lock_limit), False, state["pll_lock"]))
    pll_st = dict(pll_st)
    pll_st["wraps"] = jnp.where(newly_locked, 0, pll_st["wraps"])

    cphase = q32_to_rev(pll_st["vco_phase"]) * (2 * np.pi)
    return mixed, pll_st, lock, lc, snr, cphase


def linear_demod(
    state,
    bb,
    bb_power,
    n0,
    params,
    *,
    samprate: int,
    blocktime: float,
    enable_pll: bool = False,
    envelope: bool = False,
    stereo: bool = False,
):
    """Demodulate one block for a linear channel group.

    Args:
      state: from linear_init (carried).
      bb: [C, N] complex64 fine-tuned baseband.
      bb_power: [C] float32 mean |bb|^2 (from downconvert).
      n0: [C] float32 smoothed noise density.
      params: dict of per-channel tensors:
        agc_enable[C] bool, headroom[C] lin, hangtime_samples[C] i32,
        recovery_per_sample[C], threshold[C] lin, bandwidth[C] Hz,
        manual_gain[C], shift_inc_q32[C] i32 (post-detection shift),
        pll_square[C] bool, pll_loop_bw[C] Hz,
        squelch_open[C] power ratio, squelch_close[C], squelch_tail[C] i32,
        snr_squelch_enable[C] bool.
      static flags: enable_pll / envelope / stereo select the compiled path.

    Returns (new_state, audio, info) where audio is [C, N] float32 (mono) or
    [C, N, 2] (stereo), already squelch-muted; info carries status readouts.
    """
    C, N = bb.shape
    st = dict(state)
    info = {}

    if enable_pll:
        bb, pll_st, lock, lc, pll_snr, cphase = _run_pll(bb, state, params, samprate)
        st["pll"], st["pll_lock"], st["pll_lock_count"] = pll_st, lock, lc
        info["pll_snr"] = pll_snr
        info["pll_lock"] = lock
        info["cphase"] = cphase
        info["foffset"] = st["pll"]["u"] * samprate
        info["pll_wraps"] = pll_st["wraps"]  # lock-to-lock phase wraps (osc.c:175-206)
    else:
        pll_snr = jnp.full((C,), jnp.inf, jnp.float32)
        info["pll_lock"] = jnp.zeros((C,), jnp.bool_)

    # post-detection frequency shift (CW offset), Q32 NCO
    ramp, st["shift_acc"] = phase_ramp_q32(state["shift_acc"], params["shift_inc_q32"], N)
    bb = jnp.where((params["shift_inc_q32"] != 0)[:, None], bb * ramp, bb)

    # block AGC
    agc_state, gain_ramp = agc_block(
        state["agc"],
        bb,
        bb_power,
        n0,
        enable=params["agc_enable"],
        headroom=params["headroom"],
        hangtime_samples=params["hangtime_samples"],
        recovery_per_sample=params["recovery_per_sample"],
        threshold=params["threshold"],
        bandwidth=params["bandwidth"],
        samprate=samprate,
        blocktime=blocktime,
    )
    st["agc"] = agc_state
    gain_ramp = jnp.where(params["agc_enable"][:, None], gain_ramp, params["manual_gain"][:, None])

    # detection
    sqrt1_2 = jnp.float32(1.0 / np.sqrt(2.0))
    if envelope:
        env = gain_ramp * sqrt1_2 * jnp.abs(bb)
        # DC (carrier) removal: am_dc[n] = am_dc[n-1] + tau*(s - am_dc[n-1])
        tau = params["dc_tau"][:, None]
        dc = first_order_scan(1.0 - tau * jnp.ones_like(env), tau * env, state["am_dc"], axis=-1)
        dc_removed = env - dc
        st["am_dc"] = dc[:, -1]
        use_dc = (params["dc_tau"] > 0)[:, None]
        mono = jnp.where(use_dc, dc_removed, env)
        audio = (
            jnp.stack([gain_ramp * sqrt1_2 * bb.real, mono], axis=-1)
            if stereo
            else mono
        )
        power_samples = env if not stereo else jnp.stack([gain_ramp * sqrt1_2 * bb.real, env], -1)
    else:
        if stereo:
            audio = jnp.stack([gain_ramp * bb.real, gain_ramp * bb.imag], axis=-1)
            power_samples = audio
        else:
            audio = gain_ramp * bb.real
            power_samples = audio

    if stereo:
        output_power = jnp.mean(jnp.sum(power_samples * power_samples, axis=-1), axis=-1)
    else:
        output_power = 2.0 * jnp.mean(power_samples * power_samples, axis=-1)  # +3dB mono

    # squelch (linear.c:344-388): SNR squelch takes precedence, else PLL
    snr = jnp.where(
        params["snr_squelch_enable"],
        bb_power / jnp.maximum(n0 * params["bandwidth"], 1e-30) - 1.0,
        jnp.where(jnp.bool_(enable_pll), pll_snr, jnp.inf),
    )
    any_squelch = params["snr_squelch_enable"] | jnp.bool_(enable_pll)
    sq_max = params["squelch_tail"] + 4
    sq = state["squelch_state"]
    sq = jnp.where(~any_squelch | (snr >= params["squelch_open"]), sq_max,
                   jnp.where((sq > 0) & (snr < params["squelch_close"]), sq - 1, sq))
    st["squelch_state"] = sq

    sq_open = state["squelch_open"]
    sq_open = jnp.where(any_squelch & (snr < params["squelch_close"]), False,
                        jnp.where(any_squelch & ~sq_open & (snr > params["squelch_open"]), True, sq_open | ~any_squelch))
    st["squelch_open"] = sq_open
    st["am_dc"] = jnp.where(any_squelch & sq_open & ~state["squelch_open"], 0.0, st["am_dc"])

    emit = sq >= 4  # 3..1 emit zeros, 0 fully closed (mute flag), >=4 open
    mute = ~emit | ~sq_open
    audio = jnp.where(mute[:, None, None] if stereo else mute[:, None], 0.0, audio)
    output_power = jnp.where(mute, 0.0, output_power)

    info["output_power"] = output_power
    info["snr"] = snr
    info["squelch_state"] = sq
    info["send"] = sq > 0  # RTP frames still flow during the closing tail
    info["gain"] = st["agc"]["gain"]
    return st, audio, info
