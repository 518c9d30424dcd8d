"""Flagship benchmark: BASELINE.md config #5 — RX888 full rate.

129.6 Msps real input (the reference's maximum supported hardware rate,
rof3240000: a 3,240,000-point real FFT per 20 ms block) feeding 1000
simultaneous SSB channels with AGC plus a 16-point spectrum sweep — the
"north star" workload. Metric: sustained front-end input rate in
Msamples/s through the full pipeline.

vs_baseline: ratio to the 129.6 Msps the reference sustains in real time on
a mid-range x86 (>1.0 = faster than real time on its biggest config).
Alternate configs: `bench.py nbfm400|wfm|linear8` (BASELINE 2-4);
`bench.py rx888xB` (B = 2,4,8,...) = B independent RX888-class front ends
on ONE chip (aggregate Msps; the reference needs a host per SDR);
`bench.py hfN` (N = 1000,2000,...) = the channels/chip scaling curve.

Prints ONE json line. Run on the real TPU chip (no platform override).
"""
from __future__ import annotations

import json
import re
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
    elif re.fullmatch(r"rx888x\d+", config):  # B front ends, ONE chip/daemon
        # multi-front-end flagship: B independent 129.6 Msps real streams
        # (the reference needs one host per SDR, README.md:10-12), each
        # with 1000 SSB channels; the sweep rides the first stream.
        # Aggregate front-end rate is the metric; >= B x 129.6 Msps =
        # every stream real-time.
        B = int(config.rsplit("x", 1)[1])
        FS, baseline = 129_600_000, 129.6
        freqs = np.linspace(0.02 * FS, 0.48 * FS, 1000)
        sfreqs = np.linspace(0.05 * FS, 0.45 * FS, 16)
        # ONE batched group spans all B streams (per-channel inputs): the
        # compiled program is O(1) in B — only the tensors widen
        groups = [
            GroupSpec(name="hf", demod="linear", samprate=12_000, snr_squelch=True,
                      channels=tuple(ChannelSpec(freq=float(f), low=50.0, high=3000.0,
                                                 input=b)
                                     for b in range(B) for f in freqs)),
            GroupSpec(name="sweep", demod="spectrum", samprate=32_400, bin_bw=1000.0, bin_count=128,
                      channels=tuple(ChannelSpec(freq=float(f)) for f in sfreqs)),
        ]
        return (Engine(samprate=FS, real=True, groups=groups, n_inputs=B), FS, baseline)
    elif re.fullmatch(r"hf\d+", config):
        # channels/chip scaling curve: N linear channels on one 129.6 Msps
        # stream (hf2000 = the reference's hard per-instance channel cap,
        # radio.h:344)
        nch = int(config[2:])
        FS, baseline = 129_600_000, 129.6
        freqs = np.linspace(0.02 * FS, 0.48 * FS, nch)
        groups = [
            GroupSpec(name="hf", demod="linear", samprate=12_000, snr_squelch=True,
                      channels=tuple(ChannelSpec(freq=float(f), low=50.0, high=3000.0) for f in freqs)),
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

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    use_matmul = "--matmul" in sys.argv
    no_tiled = "--no-tiled" in sys.argv  # ablate the tiled channelizer
    use_mesh = "--mesh" in sys.argv  # distributed master over all local devices
    config = args[0] if args else "rx888"
    eng, FS, baseline = build_engine(config)
    if use_matmul or no_tiled:
        from ka9q_radio_tpu.runtime.engine import Engine as _E
        eng = _E(samprate=eng.samprate, real=eng.master.real,
                 groups=eng.specs, blocktime=eng.blocktime, use_matmul=use_matmul,
                 n_inputs=eng.n_inputs,
                 use_tiled=False)  # compare the plain-matmul/gather lowering
    if use_mesh:
        # the sharded engine on however many chips are local (a mesh of 1
        # measures the distributed master's overhead vs the dense path)
        from ka9q_radio_tpu.runtime.engine import Engine as _E
        from ka9q_radio_tpu.parallel import make_mesh

        mesh = make_mesh()
        eng = _E(samprate=eng.samprate, real=eng.master.real, groups=eng.specs,
                 blocktime=eng.blocktime, n_inputs=eng.n_inputs, mesh=mesh)

    import os

    # shared across self-re-execs (see __main__): a poisoned jax client
    # never recovers in-process, so the last-resort retry is a fresh
    # interpreter with the remaining time budget
    now = time.time()
    deadline = float(os.environ.setdefault(
        "KA9Q_BENCH_DEADLINE",
        str(now + float(os.environ.get("KA9Q_BENCH_RETRY_S", "720")))))
    give_up = time.monotonic() + max(60.0, deadline - now)

    def _init_state(max_fails: int = 4):
        # the tunnel can flake on any first dispatch — a few in-process
        # retries, then raise (a poisoned client needs the __main__ re-exec)
        fails = 0
        while True:
            try:
                st = jax.jit(eng.init_state)()
                jax.block_until_ready(st)
                return st
            except Exception:
                fails += 1
                if fails >= max_fails or time.monotonic() > give_up:
                    raise
                time.sleep(20.0)

    state = _init_state()
    params = eng.init_params()
    if "--sweep-idle" in sys.argv:
        # unpolled spectrum sweeps under the daemon's lazy poll gating
        # (spectrum.c:161-186): armed=0 skips the whole sweep stage at run
        # time via lax.cond — measures what idle sweeps cost (~nothing)
        for gname in list(params):
            if "armed" in params[gname]:
                params[gname] = dict(params[gname])
                params[gname]["armed"] = np.float32(0.0)
    # time K chained blocks per dispatch (lax.scan over DISTINCT random
    # blocks — no loop-invariant input for the compiler to exploit) so
    # host<->device round trips don't pollute the measurement; audio is
    # folded into a checksum so nothing is dead-code-eliminated.
    # Built INSIDE jit: eager device ops (notably complex construction)
    # poison the axon tunnel client.
    K = 8
    bshape = (K, eng.L) if eng.n_inputs == 1 else (K, eng.n_inputs, eng.L)

    @jax.jit
    def _mkblocks():
        key = jax.random.PRNGKey(0)
        if eng.master.real:
            return jax.random.normal(key, bshape, jnp.float32) * 1e-3
        noise = jax.random.normal(key, bshape + (2,), jnp.float32) * 1e-3
        return (noise[..., 0] + 1j * noise[..., 1]).astype(jnp.complex64)

    blocks = _mkblocks()

    # R repetitions of the K-block scan inside ONE dispatch (the carried
    # state differs each pass, so no two iterations are CSE-able): R*K=512
    # blocks per dispatch keeps the device busy tens of ms, amortizing the
    # tunnel's per-dispatch latency across 512 blocks. Each timing span is
    # closed by a d2h fetch of the scalar checksum: over the axon tunnel,
    # block_until_ready can return BEFORE device execution completes (a
    # phantom barrier that once inflated this bench ~10-50x), but a value
    # fetch cannot.
    R = 64

    def run_k(state, params, blocks):
        def body(carry, blk):
            st, acc = carry
            st, out = eng.step(st, params, blk)
            for name, g in out.items():
                if name.startswith("_"):
                    continue
                acc = acc + jnp.sum(g["audio"])
            return (st, acc), None

        def rep(_, carry):
            carry, _ = jax.lax.scan(body, carry, blocks)
            return carry

        state, acc = jax.lax.fori_loop(0, R, rep, (state, jnp.float32(0)))
        return state, acc

    # no donation: a span retry after a failed d2h fetch must be able
    # to reuse the same state buffers
    runk = jax.jit(run_k)

    # The tunnel's UNIMPLEMENTED bouts can outlast any fixed attempt count,
    # so every device interaction retries under one shared TIME budget
    # (default 12 min, KA9Q_BENCH_RETRY_S to override); persistent failures
    # rebuild state/params in case buffers were lost with the bout.
    def timed_span():
        nonlocal state, params
        fails = 0
        while True:
            try:
                t0 = time.perf_counter()
                new_state, acc = runk(state, params, blocks)
                float(acc)  # strict d2h execution barrier
                el = time.perf_counter() - t0
                state = new_state
                return el
            except Exception:
                fails += 1
                # 4 consecutive failures = likely a poisoned client, which
                # in-process retry cannot fix: raise so __main__ re-execs
                if fails >= 4 or time.monotonic() > give_up:
                    raise
                time.sleep(20.0)
                try:
                    state = _init_state()
                    params = eng.init_params()
                except Exception:
                    pass

    timed_span()  # compile
    timed_span()  # warmup (steady-state buffers)

    # best of 4 spans: tunnel jitter only ever ADDS time, so the minimum
    # is the robust estimate of sustained device throughput; the span is
    # closed by a d2h value fetch (see above)
    dt = min(timed_span() for _ in range(4)) / (R * K)

    sps = eng.n_inputs * eng.L / dt  # sustained AGGREGATE front-end samples/s
    msps = sps / 1e6
    print(
        json.dumps(
            {
                "metric": (f"{config}{'_matmul' if use_matmul else ''}"
                           f"{'_mesh' if use_mesh else ''}"
                           f"{'_sweepidle' if '--sweep-idle' in sys.argv else ''}"
                           "_input_rate"),
                "value": round(msps, 3),
                "unit": "Msps",
                "vs_baseline": round(msps / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception:
        # a poisoned jax client (one bad compile/transfer can wedge the
        # axon tunnel state for the process lifetime) only recovers in a
        # fresh interpreter: re-exec with the remaining shared time budget
        import os
        import sys

        deadline = float(os.environ.get("KA9Q_BENCH_DEADLINE", "0"))
        if not deadline or time.time() + 30.0 > deadline:
            raise
        time.sleep(20.0)
        argv = [os.path.abspath(sys.argv[0])] + sys.argv[1:]
        os.execv(sys.executable, [sys.executable] + argv)
