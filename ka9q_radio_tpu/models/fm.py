"""NBFM demodulator with CTCSS tone squelch and de-emphasis (fm.c).

Pure per-block function over a channel group's [C, N] complex baseband:
  1. dual SNR estimators — fast N0-based and constant-envelope amplitude
     variance with the fm_snr() Ricean bias correction (fm.c:108-145,
     misc.c:886-914)
  2. hysteresis squelch with multi-frame closing sequencer (fm.c:146-187)
  3. phase-difference discriminator carg(s * conj(prev))/pi with optional
     threshold extension (deviation clamp + amplitude weighting,
     fm.c:219-243) — fully pointwise, the previous sample carried as state
  4. peak deviation / frequency-offset tracking, DC removal (fm.c:245-278)
  5. CTCSS/PL tone squelch: Goertzel integrated over 240 ms across blocks,
     tone deviation + inter-interval phase jump test (fm.c:279-325)
  6. one-pole de-emphasis via associative scan (fm.c:327-335)
  7. fixed gain from bandwidth (fm.c:340-348)

The per-sample PLL FM variant (fm.c:189-217) is a static group flag using
the shared pll scan; default is the discriminator path.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import i0e, i1e

from ..ops.iir import first_order_scan, goertzel_coeff, goertzel_init, goertzel_update_block, goertzel_output

__all__ = ["fm_init", "fm_demod", "fm_snr_correct", "FM_DEFAULTS"]

FM_DEFAULTS = dict(
    squelch_open=6.3,  # power ratio ~ +8 dB (fm.c:52)
    squelch_close=4.0,  # ~ +6 dB (fm.c:54)
    devmax=5000.0,  # nominal peak deviation Hz (fm.c:56)
    beta=0.5,  # threshold extension factor (fm.c:118)
    pl_integrate_s=0.24,  # CTCSS integration window (fm.c:69)
)


def fm_snr_correct(r):
    """Ricean bias correction for the amplitude-variance SNR estimator.

    Same fixed-point iteration as the reference's fm_snr/xi
    (misc.c:886-914): theta^2 = xi(theta^2)*(1+r) - 2, 10 iterations,
    with i0/i1 evaluated via the exponentially-scaled Bessels.
    Clamps: returns 0 below pi/(4-pi); passthrough above 100 (20 dB).
    """
    r = jnp.asarray(r, jnp.float32)

    def xi(tsq):
        # Fold the e^{-tsq/2} into the squared term: each factor carries
        # e^{-tsq/4} = e^{-x}, which is exactly what the scaled Bessels
        # i0e(x) = i0(x)e^{-x} provide.
        x = 0.25 * tsq
        t = (2.0 + tsq) * i0e(x) + tsq * i1e(x)
        return 2.0 + tsq - (0.125 * np.pi) * t * t

    def body(_, tsq):
        return xi(tsq) * (1.0 + r) - 2.0

    tsq = jax.lax.fori_loop(0, 10, body, jnp.clip(r, 0.0, 100.0))
    low = r <= np.pi / (4.0 - np.pi)
    high = r > 100.0
    return jnp.where(low, 0.0, jnp.where(high, r, jnp.maximum(tsq, 0.0)))


def fm_init(n: int):
    """Per-channel carried state for an NBFM group of n channels."""
    return {
        "phase_memory": jnp.zeros((n,), jnp.complex64),
        "squelch_state": jnp.zeros((n,), jnp.int32),
        "foffset": jnp.zeros((n,), jnp.float32),  # smoothed freq offset, Hz
        "deemph": jnp.zeros((n,), jnp.float32),
        "goertzel": goertzel_init((n,)),
        "pl_count": jnp.zeros((n,), jnp.int32),  # samples integrated so far
        "old_pl_phase": jnp.zeros((n,), jnp.float32),
        "tone_mute": jnp.ones((n,), jnp.bool_),
        "tone_deviation": jnp.zeros((n,), jnp.float32),
    }


def fm_demod(
    state,
    bb,
    bb_power,
    n0,
    params,
    *,
    samprate: int,
    blocktime: float,
    ctcss: bool = False,
    threshold_extension_available: bool = True,
):
    """Demodulate one block for an NBFM channel group.

    Args:
      state: from fm_init (carried).
      bb: [C, N] complex64 fine-tuned baseband.
      bb_power, n0: [C] float32 (from downconvert).
      params: per-channel tensors:
        bandwidth[C] Hz (|max_IF - min_IF|), headroom[C] linear,
        squelch_open[C], squelch_close[C] (power ratios), squelch_tail[C] i32,
        snr_squelch_enable[C] bool (use simple SNR instead of variance),
        threshold_ext[C] bool, deemph_rate[C] (per-sample, 0 = off),
        deemph_gain[C], tone_freq[C] Hz (0 = no CTCSS).
      ctcss: static — compile the tone-squelch path for this group.

    Returns (new_state, audio[C, N] float32, info).
    """
    C, N = bb.shape
    st = dict(state)
    info = {}

    noise = jnp.maximum(n0, 0.0) * params["bandwidth"]
    snr_simple = jnp.where(noise > 0, bb_power / jnp.maximum(noise, 1e-30) - 1.0, jnp.inf)

    # constant-envelope variance SNR (fm.c:126-145)
    amp = jnp.abs(bb)
    avg_amp = jnp.mean(amp, axis=-1)
    var = jnp.sum((amp - avg_amp[:, None]) ** 2, axis=-1)
    snr_var = fm_snr_correct(avg_amp * avg_amp * (N - 1) / jnp.maximum(var, 1e-30))

    use_simple = params["snr_squelch_enable"] | (
        (state["squelch_state"] <= 0) & (snr_simple < params["squelch_close"])
    )
    snr = jnp.where(use_simple, snr_simple, snr_var)
    info["fm_snr"] = snr

    # hysteresis squelch sequencer (fm.c:146-187)
    sq_max = params["squelch_tail"] + 5
    sq = state["squelch_state"]
    sq = jnp.where(
        snr >= params["squelch_open"],
        sq_max,
        jnp.where((sq > 0) & ((snr < params["squelch_close"]) | (sq < sq_max)), sq - 1, sq),
    )
    st["squelch_state"] = sq
    fully_open = sq == sq_max
    # fm.c:146-187: states >= 5 demodulate real audio (including the tail
    # after SNR drops); 4..1 send silent frames; 0 is closed
    emitting = sq >= 5
    closing = (sq >= 1) & (sq <= 4)

    # discriminator: phase difference scaled to [-1, 1] half-revs (fm.c:219-243)
    prev = jnp.concatenate([state["phase_memory"][:, None], bb[:, :-1]], axis=1)
    s = bb * jnp.conj(prev)
    phase = jnp.arctan2(s.imag, s.real) * np.float32(1.0 / np.pi)
    if threshold_extension_available:
        devmax_frac = FM_DEFAULTS["devmax"] / samprate
        clamped = jnp.clip(phase, -devmax_frac, devmax_frac)
        p = bb.real * bb.real + bb.imag * bb.imag
        w = jnp.where(p > 0, p / (p + FM_DEFAULTS["beta"] * noise[:, None]), 0.0)
        # first sample pairs with the PREVIOUS block's last sample, whose
        # weight derives from the carried phase_memory (fm.c:220-226)
        pm = state["phase_memory"]
        p_prev0 = pm.real * pm.real + pm.imag * pm.imag
        w_prev0 = jnp.where(p_prev0 > 0, p_prev0 / (p_prev0 + FM_DEFAULTS["beta"] * noise), 0.0)
        w_prev = jnp.concatenate([w_prev0[:, None], w[:, :-1]], axis=1)
        ext = clamped * w * w_prev
        phase = jnp.where(params["threshold_ext"][:, None], ext, phase)
    baseband = phase
    st["phase_memory"] = jnp.where(closing, 0.0 + 0.0j, bb[:, -1])

    # deviation peaks & frequency offset (fm.c:245-270), only while fully open
    fo_block = jnp.mean(baseband, axis=-1) * (samprate * 0.5)
    alpha = np.float32(min(1.0 * blocktime, 1.0))
    foffset = state["foffset"] + alpha * (fo_block - state["foffset"])
    st["foffset"] = jnp.where(fully_open, foffset, state["foffset"])
    pk_pos = jnp.max(baseband, axis=-1) * (samprate * 0.5) - st["foffset"]
    pk_neg = jnp.min(baseband, axis=-1) * (samprate * 0.5) - st["foffset"]
    info["pdeviation"] = jnp.where(fully_open, jnp.maximum(pk_pos, -pk_neg), 0.0)
    info["foffset"] = st["foffset"]

    # DC removal before tone detection / de-emphasis (fm.c:272-278)
    dc = 2.0 * st["foffset"] / samprate
    baseband = jnp.where((params["deemph_rate"] > 0)[:, None] & fully_open[:, None],
                         baseband - dc[:, None], baseband)

    tone_mute = state["tone_mute"]
    if ctcss:
        # CTCSS Goertzel integrated across blocks; evaluate every 240 ms
        coeff, cf = goertzel_coeff(params["tone_freq"] / samprate)
        g = goertzel_update_block(state["goertzel"], jnp.where(fully_open[:, None], baseband, 0.0), coeff)
        count = jnp.where(fully_open, state["pl_count"] + N, 0)
        pl_n = int(round(FM_DEFAULTS["pl_integrate_s"] * samprate))
        done = count >= pl_n

        out = goertzel_output(g, coeff, cf)
        dev_per_sample = jnp.abs(out) / jnp.maximum(count, 1)
        tone_dev = samprate * dev_per_sample
        p = jnp.arctan2(out.imag, out.real) * np.float32(1.0 / (2 * np.pi))
        old = state["old_pl_phase"] + params["tone_freq"] * count / samprate
        npj = 2.0 * jnp.mod(p - old, 1.0)
        npj = jnp.where(npj > 1.0, npj - 2.0, npj)
        new_mute = (tone_dev < 250.0) | (jnp.abs(npj) > 0.10)

        tone_mute = jnp.where(done & (params["tone_freq"] != 0), new_mute, tone_mute)
        st["tone_deviation"] = jnp.where(done, tone_dev, state["tone_deviation"])
        st["old_pl_phase"] = jnp.where(done, p, state["old_pl_phase"])
        st["goertzel"] = jax.tree.map(
            lambda fresh, cur: jnp.where(done | ~fully_open, fresh, cur), goertzel_init((C,)), g
        )
        st["pl_count"] = jnp.where(done, 0, count)
        st["tone_mute"] = jnp.where(params["tone_freq"] != 0, tone_mute, False)
        info["tone_deviation"] = st["tone_deviation"]
    else:
        st["tone_mute"] = jnp.zeros((C,), jnp.bool_)

    # one-pole de-emphasis (fm.c:327-335): d += rate*(gain*x - d)
    rate = params["deemph_rate"][:, None]
    de_in = rate * params["deemph_gain"][:, None] * baseband
    de = first_order_scan(1.0 - rate * jnp.ones_like(baseband), de_in, state["deemph"], axis=-1)
    st["deemph"] = de[:, -1]
    baseband = jnp.where(params["deemph_rate"][:, None] > 0, de, baseband)

    # fixed gain from bandwidth (fm.c:340-348)
    gain = 2.0 * params["headroom"] * samprate / jnp.maximum(params["bandwidth"], 1.0)
    audio = gain[:, None] * baseband

    mute = ~emitting | st["tone_mute"]
    audio = jnp.where(mute[:, None], 0.0, audio)
    info["output_power"] = jnp.where(mute, 0.0, jnp.mean(audio * audio, axis=-1))
    info["send"] = emitting | closing
    info["squelch_state"] = sq
    return st, audio.astype(jnp.float32), info
