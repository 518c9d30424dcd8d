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


def main() -> None:
    import jax
    import jax.numpy as jnp
    from ka9q_radio_tpu.runtime import ChannelSpec, GroupSpec, Engine

    FS = 30_720_000
    N_CH = 400
    freqs = np.linspace(-0.45 * FS, 0.45 * FS, N_CH)
    eng = Engine(
        samprate=FS,
        real=False,
        groups=[
            GroupSpec(
                name="nbfm",
                demod="fm",
                samprate=24_000,
                channels=tuple(ChannelSpec(freq=float(f), low=-8000.0, high=8000.0) for f in freqs),
            )
        ],
    )

    state = eng.init_state()
    params = eng.init_params()
    key = jax.random.PRNGKey(0)
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
            state = eng.init_state()
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
                "metric": "nbfm400_input_rate",
                "value": round(msps, 3),
                "unit": "Msps",
                "vs_baseline": round(msps / 30.72, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
