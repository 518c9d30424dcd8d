"""WFM broadcast stereo demodulator (wfm.c).

The reference's structure, rebuilt as a batched pure function over a
[stations, Lc] composite-rate baseband block:

  1. power-SNR squelch with tail (wfm.c:145-165)
  2. FM discriminator: wrapped difference of arg()/pi (wfm.c:166-175)
  3. a SECOND overlap-save stage on the real composite signal: composite_L
     = 384 kHz * blocktime, 50% overlap (M = L+1), real forward FFT
     (wfm.c:75-77) with three frequency-domain slaves decimating to 48 kHz:
       mono   L+R   50 Hz-15 kHz, real output        (wfm.c:83-85)
       pilot  19 kHz +/- 100 Hz, complex, spun to DC (wfm.c:88-91)
       L-R    38 kHz +/- 15 kHz, complex, spun to DC (wfm.c:93-97)
     The pilot/subcarrier spins are exact integer bin shifts (asserted zero
     remainder, wfm.c:101-109) so no fine-tune oscillator is needed.
  4. pilot detection by energy (wfm.c:215-227); pilot squared regenerates
     the 38 kHz subcarrier; L+/-R matrixing; stereo de-emphasis
     (wfm.c:237-258); auto mono fallback (wfm.c:265-276).

Composite and audio rates are forced like the reference (384 k / 48 k,
wfm.c:22-23). Output is always [C, audio_L, 2]; in mono fallback both
channels carry L+R (the host RTP edge switches payload type on the
`stereo` info flag, mirroring the reference's PT switch).
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.filter_design import design_bandpass_response
from ..ops.filterbank import compute_tuning
from ..ops.iir import first_order_scan

__all__ = ["WfmGeometry", "wfm_geometry", "wfm_design", "wfm_init", "wfm_demod", "AUDIO_SAMPRATE", "COMPOSITE_SAMPRATE"]

AUDIO_SAMPRATE = 48_000  # FULL_SAMPRATE (wfm.c:22)
COMPOSITE_SAMPRATE = 8 * AUDIO_SAMPRATE  # 384 kHz (wfm.c:23)


@dataclasses.dataclass(frozen=True)
class WfmGeometry:
    Lc: int  # composite block
    Mc: int  # composite_L + 1 (50% overlap)
    audio_L: int
    pilot_shift: int
    subc_shift: int
    rds_shift: int = 0

    @property
    def Nc(self) -> int:
        return self.Lc + self.Mc - 1

    @property
    def nb(self) -> int:
        """Slave IFFT size (audio-rate bins)."""
        return self.Nc * AUDIO_SAMPRATE // COMPOSITE_SAMPRATE


def wfm_geometry(blocktime: float = 0.02) -> WfmGeometry:
    Lc = int(round(COMPOSITE_SAMPRATE * blocktime))
    Mc = Lc + 1
    Nc = Lc + Mc - 1
    audio_L = int(round(AUDIO_SAMPRATE * blocktime))
    ps, prem, _ = compute_tuning(Nc, COMPOSITE_SAMPRATE, 19_000.0)
    ss, srem, _ = compute_tuning(Nc, COMPOSITE_SAMPRATE, 38_000.0)
    rs, rrem, _ = compute_tuning(Nc, COMPOSITE_SAMPRATE, 57_000.0)
    # like the reference's asserts (wfm.c:101-109): clean rates only
    if prem != 0.0 or srem != 0.0 or rrem != 0.0 or (ps * Lc) % Nc or (ss * Lc) % Nc or (rs * Lc) % Nc:
        raise ValueError("blocktime gives non-integer pilot/subcarrier bins")
    return WfmGeometry(Lc=Lc, Mc=Mc, audio_L=audio_L, pilot_shift=ps, subc_shift=ss, rds_shift=rs)


def wfm_design(geo: WfmGeometry, kaiser_beta: float = 11.0):
    """The composite slave responses (static, shared by all stations).

    Returns dict of np.complex64 arrays: mono [nb//2+1] (half spectrum for
    the real IFFT), pilot [nb], lminusr [nb], rds [nb] (57 kHz +/- 2.4 kHz
    for the rdsd path).
    """
    nb, L = geo.nb, geo.audio_L
    fs = float(AUDIO_SAMPRATE)
    mono = design_bandpass_response(
        nb, L, 50.0 / fs, 15_000.0 / fs, kaiser_beta,
        real_master=True, master_points=geo.Nc, real_output=True,
    )
    pilot = design_bandpass_response(
        nb, L, -100.0 / fs, 100.0 / fs, kaiser_beta,
        real_master=True, master_points=geo.Nc,
    )
    lminusr = design_bandpass_response(
        nb, L, -15_000.0 / fs, 15_000.0 / fs, kaiser_beta,
        real_master=True, master_points=geo.Nc,
    )
    rds = design_bandpass_response(
        nb, L, -2400.0 / fs, 2400.0 / fs, kaiser_beta,
        real_master=True, master_points=geo.Nc,
    )
    # jnp.fft.irfft's 1/nb normalization was pre-compensated for ifft; keep
    # the same convention (both normalize by the transform length).
    return {
        "mono": mono[: nb // 2 + 1].astype(np.complex64),
        "pilot": pilot.astype(np.complex64),
        "lminusr": lminusr.astype(np.complex64),
        "rds": rds.astype(np.complex64),
    }


def wfm_init(C: int, geo: WfmGeometry):
    return {
        "tail": jnp.zeros((C, geo.Mc - 1), jnp.float32),
        "phase_memory": jnp.zeros((C,), jnp.float32),
        "squelch_state": jnp.zeros((C,), jnp.int32),
        "foffset": jnp.zeros((C,), jnp.float32),
        "stereo_deemph": jnp.zeros((C,), jnp.complex64),
        "mono_deemph": jnp.zeros((C,), jnp.float32),
    }


def _slave_fd(Fc, resp, shift: int, nb: int, Nc: int):
    """R->C slave frequency-domain product: gather nb bins at +shift from
    the composite half spectrum (upright positive-frequency slice,
    filter.c:777-859) and multiply by the response. shift is static.

    The IFFT is NOT taken here: the three complex slaves (pilot, L-R, RDS)
    share one batched inverse transform in wfm_demod — identical numerics
    per row, one kernel launch instead of three."""
    m_bins = Nc // 2 + 1
    k = np.arange(nb)
    signed = np.where(k < (nb + 1) // 2, k, k - nb)
    idx = shift + signed
    valid = (idx >= 0) & (idx < m_bins)
    return jnp.where(valid[None, :], Fc[:, np.clip(idx, 0, m_bins - 1)], 0.0) * resp[None, :]


def wfm_demod(state, bb, bb_power, n0, params, geo: WfmGeometry, responses):
    """One block for a WFM station group.

    Args:
      state: from wfm_init.
      bb: [C, Lc] complex64 composite-rate baseband (from downconvert).
      bb_power, n0: [C] float32.
      params: per-station tensors: bandwidth[C] Hz, headroom[C] linear,
        squelch_open[C], squelch_close[C] (power ratios), squelch_tail[C],
        deemph_rate[C] (audio-rate one-pole, 0=off), deemph_gain[C],
        stereo_enable[C] bool.
      responses: dict from wfm_design (device arrays).

    Returns (new_state, audio [C, audio_L, 2] float32, info).
    """
    C, Lc = bb.shape
    st = dict(state)
    info = {}

    # simple power squelch (wfm.c:145-165)
    snr = jnp.maximum(bb_power / jnp.maximum(n0 * params["bandwidth"], 1e-30) - 1.0, 0.0)
    sq_max = params["squelch_tail"] + 1
    sq = state["squelch_state"]
    sq = jnp.where(snr >= params["squelch_open"], sq_max,
                   jnp.where((sq > 0) & (snr >= params["squelch_close"]), sq_max,
                             jnp.maximum(sq - 1, 0)))
    st["squelch_state"] = sq
    open_ = sq > 0
    fully_open = sq == sq_max
    info["fm_snr"] = snr

    # discriminator: wrapped first difference of arg/pi (wfm.c:166-175)
    ph = jnp.arctan2(bb.imag, bb.real) * np.float32(1.0 / np.pi)
    prev = jnp.concatenate([state["phase_memory"][:, None], ph[:, :-1]], axis=1)
    x = ph - prev
    x = jnp.where(x > 1.0, x - 2.0, jnp.where(x < -1.0, x + 2.0, x))
    st["phase_memory"] = jnp.where(open_, ph[:, -1], 0.0)

    # deviation peaks & frequency offset while fully open (wfm.c:176-201)
    fo_block = jnp.mean(x, axis=-1) * np.float32(COMPOSITE_SAMPRATE * 0.5)
    alpha = np.float32(1.0 * (geo.Lc / COMPOSITE_SAMPRATE))
    fo = state["foffset"] + alpha * (fo_block - state["foffset"])
    st["foffset"] = jnp.where(fully_open, fo, state["foffset"])
    pk_pos = jnp.max(x, axis=-1) * (COMPOSITE_SAMPRATE * 0.5) - st["foffset"]
    pk_neg = jnp.min(x, axis=-1) * (COMPOSITE_SAMPRATE * 0.5) - st["foffset"]
    info["pdeviation"] = jnp.where(fully_open, jnp.maximum(pk_pos, -pk_neg), 0.0)
    info["foffset"] = st["foffset"]

    # second overlap-save stage: real composite forward FFT (wfm.c:75-77,203)
    comp = jnp.concatenate([state["tail"], x], axis=1)  # [C, Nc]
    st["tail"] = comp[:, geo.Lc :]
    Fc = jnp.fft.rfft(comp, axis=-1).astype(jnp.complex64)

    nb, aL = geo.nb, geo.audio_L
    # mono (L+R): real-output slave at shift 0 (filter.c:770-776)
    hm = Fc[:, : nb // 2 + 1] * responses["mono"][None, :]
    mono = jnp.fft.irfft(hm, n=nb, axis=-1)[:, nb - aL :].astype(jnp.float32)
    fds = jnp.stack([
        _slave_fd(Fc, responses["pilot"], geo.pilot_shift, nb, geo.Nc),
        _slave_fd(Fc, responses["lminusr"], geo.subc_shift, nb, geo.Nc),
        _slave_fd(Fc, responses["rds"], geo.rds_shift, nb, geo.Nc),
    ])
    pilot, lmr, rds = jnp.fft.ifft(fds, axis=-1)[..., nb - aL :]

    # constant FM gain (wfm.c:209)
    gain = 2.0 * params["headroom"] * COMPOSITE_SAMPRATE / jnp.maximum(params["bandwidth"], 1.0)

    # pilot detection (wfm.c:215-227)
    subc_amp = jnp.mean(pilot.real**2 + pilot.imag**2, axis=-1)
    pilot_present = params["stereo_enable"] & (subc_amp > 1e-6)
    info["pilot_power"] = subc_amp

    # stereo multiplex: square pilot to 38 kHz, quadrature demod L-R
    pnorm = jnp.maximum(pilot.real**2 + pilot.imag**2, 1e-30)
    subc_phasor = (pilot * pilot) / pnorm
    subc_info = 2.0 * (jnp.conj(subc_phasor) * lmr).imag

    # RDS (57 kHz = 3x pilot): derotate by the cubed pilot so the BPSK data
    # lands on the real axis for the host-side rdsd symbol decoder
    p_unit = pilot / jnp.sqrt(pnorm)
    rds_ref = p_unit * p_unit * p_unit
    rds_bb = jnp.conj(rds_ref) * rds
    info["rds_baseband"] = rds_bb.real.astype(jnp.float32)
    info["rds_power"] = jnp.mean(rds.real**2 + rds.imag**2, axis=-1)
    s = (mono + subc_info) + 1j * (mono - subc_info)  # L + iR (wfm.c:243-246)

    rate = params["deemph_rate"][:, None]
    dg = params["deemph_gain"][:, None]
    c = 1.0 - rate * jnp.ones((C, aL), jnp.float32)
    s_de = first_order_scan(c.astype(jnp.complex64), (rate * dg * s).astype(jnp.complex64),
                            state["stereo_deemph"], axis=-1)
    m_de = first_order_scan(c, rate * dg * mono, state["mono_deemph"], axis=-1)
    use_de = params["deemph_rate"][:, None] > 0
    s_out = jnp.where(use_de, s_de, s)
    m_out = jnp.where(use_de, m_de, mono)
    st["stereo_deemph"] = jnp.where(pilot_present, s_de[:, -1], state["stereo_deemph"])
    st["mono_deemph"] = jnp.where(~pilot_present, m_de[:, -1], state["mono_deemph"])

    stereo_audio = jnp.stack([s_out.real, s_out.imag], axis=-1)
    mono_audio = jnp.stack([m_out, m_out], axis=-1)
    audio = jnp.where(pilot_present[:, None, None], stereo_audio, mono_audio)
    audio = audio * gain[:, None, None]
    audio = jnp.where(open_[:, None, None], audio, 0.0).astype(jnp.float32)

    info["stereo"] = pilot_present
    info["squelch_state"] = sq
    info["send"] = open_
    po = jnp.mean(jnp.sum(audio * audio, axis=-1), axis=-1) / 2.0
    info["output_power"] = jnp.where(open_, po, 0.0)
    return st, audio, info
