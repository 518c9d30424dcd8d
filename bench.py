"""Flagship benchmark: BASELINE.md config #4 — a VHF band scan.

400 simultaneous NBFM channels channelized from a 30.72 Msps complex front
end (the reference's "every NBFM channel on a VHF band on a Raspberry Pi 4
+ Airspy R2" workload, README.md:6-9). Metric: sustained front-end input
rate in Msamples/s through the full pipeline (shared master FFT ->
400-channel filter bank -> NBFM demod with squelch/de-emphasis).

vs_baseline: ratio to the 30.72 Msps the reference sustains in real time on
that workload (>1.0 means faster than real time on the baseline config).

Prints ONE json line. Run on the real TPU chip (no platform override).
"""
from __future__ import annotations

import json
import time

import numpy as np


def build_engine(config: str):
    """BASELINE.md benchmark configs (defaults to #4, the headline)."""
    from ka9q_radio_tpu.runtime import ChannelSpec, GroupSpec, Engine

    if config == "nbfm400":  # config 4: Pi4-class VHF band scan
        FS, baseline = 30_720_000, 30.72
        freqs = np.linspace(-0.45 * FS, 0.45 * FS, 400)
        groups = [GroupSpec(name="nbfm", demod="fm", samprate=24_000,
                            channels=tuple(ChannelSpec(freq=float(f), low=-8000.0, high=8000.0) for f in freqs))]
        real = False
    elif config == "rx888":  # config 5: 129.6 Msps real, 1000 HF channels + spectrum
        FS, baseline = 129_600_000, 129.6
        freqs = np.linspace(0.02 * FS, 0.48 * FS, 1000)
        sfreqs = np.linspace(0.05 * FS, 0.45 * FS, 16)
        groups = [
            GroupSpec(name="hf", demod="linear", samprate=12_000, snr_squelch=True,
                      channels=tuple(ChannelSpec(freq=float(f), low=50.0, high=3000.0) for f in freqs)),
            GroupSpec(name="sweep", demod="spectrum", samprate=32_400, bin_bw=1000.0, bin_count=128,
                      channels=tuple(ChannelSpec(freq=float(f)) for f in sfreqs)),
        ]
        real = True
    elif config == "wfm":  # config 3: broadcast stereo stations
        FS, baseline = 7_680_000, 7.68
        freqs = np.linspace(-3_000_000, 3_000_000, 8)
        groups = [GroupSpec(name="wfm", demod="wfm", samprate=384_000,
                            channels=tuple(ChannelSpec(freq=float(f), low=-100_000.0, high=100_000.0) for f in freqs))]
        real = False
    elif config == "linear8":  # config 2: 8 linear channels with AGC
        FS, baseline = 1_024_000, 1.024
        freqs = np.linspace(-400_000, 400_000, 8)
        groups = [GroupSpec(name="lin", demod="linear", samprate=16_000,
                            channels=tuple(ChannelSpec(freq=float(f), low=50.0, high=3000.0) for f in freqs))]
        real = False
    else:
        raise SystemExit(f"unknown config {config}")
    return Engine(samprate=FS, real=real, groups=groups), FS, baseline


def main() -> None:
    import sys
    import jax
    import jax.numpy as jnp

    args = [a for a in sys.argv[1:] if a != "--pallas"]
    use_pallas = "--pallas" in sys.argv
    config = args[0] if args else "nbfm400"
    eng, FS, baseline = build_engine(config)
    if use_pallas:
        from ka9q_radio_tpu.runtime.engine import Engine as _E
        eng = _E(samprate=eng.samprate, real=eng.master.real,
                 groups=eng.specs, blocktime=eng.blocktime, use_pallas=True)

    state = jax.jit(eng.init_state)()
    params = eng.init_params()
    key = jax.random.PRNGKey(0)
    if eng.master.real:
        block = jax.random.normal(key, (eng.L,), jnp.float32) * 1e-3
    else:
        noise = jax.random.normal(key, (eng.L, 2), jnp.float32) * 1e-3
        block = (noise[:, 0] + 1j * noise[:, 1]).astype(jnp.complex64)

    step = jax.jit(eng.step, donate_argnums=0)

    # compile + warmup; the remote-TPU tunnel can throw transient
    # UNIMPLEMENTED backend errors in bouts — retry with backoff
    for attempt in range(6):
        try:
            state, out = step(state, params, block)
            jax.block_until_ready(out)
            break
        except Exception:
            if attempt == 5:
                raise
            time.sleep(15.0)
            state = jax.jit(eng.init_state)()
            params = eng.init_params()
    for _ in range(3):
        state, out = step(state, params, block)
    jax.block_until_ready(out)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, out = step(state, params, block)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    sps = eng.L / dt  # sustained front-end samples/s
    msps = sps / 1e6
    print(
        json.dumps(
            {
                "metric": f"{config}_input_rate",
                "value": round(msps, 3),
                "unit": "Msps",
                "vs_baseline": round(msps / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
