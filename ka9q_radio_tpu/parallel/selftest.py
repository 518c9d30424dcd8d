"""Flagship-geometry sharded-correctness drive (SURVEY §7.6).

Runs the REAL flagship geometry — N = 3,240,000 real master (the
reference's rof3240000 plan, /root/reference/docs/FFTW3.md:57-61) with a
1000-channel SSB group + a 16-channel spectrum sweep — through BOTH the
single-chip engine and the mesh-sharded engine (distributed digit-order
MXU master, psum_scatter gathers), asserting the audio agrees to FFT
roundoff over a multi-block run that includes a mid-stream retune and a
mid-stream channel-table grow (the dynamic-create path: rebuild +
migrate_state + adopt_host_params).

Shared by tests/test_sharded_engine.py (10 blocks, full asserts) and
__graft_entry__.dryrun_multichip (short run) so the driver exercises the
same code path the suite certifies.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["flagship_parity"]


def _flagship_groups(FS: float, n_hf: int, n_sweep: int):
    from ..runtime import ChannelSpec, GroupSpec

    freqs = np.linspace(0.02 * FS, 0.48 * FS, n_hf)
    sfreqs = np.linspace(0.05 * FS, 0.45 * FS, n_sweep)
    return [
        GroupSpec(name="hf", demod="linear", samprate=12_000, snr_squelch=True,
                  channels=tuple(ChannelSpec(freq=float(f), low=50.0, high=3000.0)
                                 for f in freqs)),
        GroupSpec(name="sweep", demod="spectrum", samprate=32_400, bin_bw=1000.0,
                  bin_count=128,
                  channels=tuple(ChannelSpec(freq=float(f)) for f in sfreqs)),
    ]


def flagship_parity(n_devices: int, nblocks: int = 10, n_hf: int = 1000,
                    n_sweep: int = 16, FS: float = 129_600_000.0,
                    rtol: float = 2e-3, atol: float = 1e-4) -> None:
    """Assert sharded == single-chip flagship audio over nblocks blocks,
    with a retune at block 3 and a channel-table grow at block 6.

    Raises AssertionError on any mismatch. Intended for the 8-way virtual
    CPU mesh (tests) and the driver's dryrun.
    """
    from ..runtime import Engine
    from ..runtime.engine import migrate_state
    from . import make_mesh, shard_engine_tree

    mesh = make_mesh(jax.devices()[:n_devices])
    rup = lambda n: -(-n // n_devices) * n_devices
    n_hf, n_sweep = rup(n_hf), rup(n_sweep)
    groups = _flagship_groups(FS, n_hf, n_sweep)

    eng_s = Engine(samprate=FS, real=True, groups=groups)
    eng_m = Engine(samprate=FS, real=True, groups=groups, mesh=mesh)
    L = eng_s.L

    # deterministic scene: noise + two carriers inside hf channels 7 and 500
    rng = np.random.default_rng(42)
    f7 = float(np.linspace(0.02 * FS, 0.48 * FS, n_hf)[7]) + 700.0
    f500 = float(np.linspace(0.02 * FS, 0.48 * FS, n_hf)[min(500, n_hf - 1)]) + 1500.0

    def mkblock(k: int) -> np.ndarray:
        t = (k * L + np.arange(L)) / FS
        x = rng.normal(size=L).astype(np.float32) * 1e-3
        x += (0.05 * np.cos(2 * np.pi * f7 * t) +
              0.05 * np.cos(2 * np.pi * f500 * t)).astype(np.float32)
        return x

    ss = jax.jit(eng_s.init_state)()
    sm = shard_engine_tree(eng_m, mesh, jax.jit(eng_m.init_state)())
    ps, pm = eng_s.init_params(), eng_m.init_params()
    step_s = jax.jit(eng_s.step, donate_argnums=0)
    step_m = jax.jit(eng_m.step, donate_argnums=0)
    caches = None

    for k in range(nblocks):
        if k == 3:
            # mid-stream retune (must not recompile either path)
            caches = (step_s._cache_size(), step_m._cache_size())
            ps = eng_s.retune(ps, "hf", 7, f500 - 1500.0)
            pm = eng_m.retune(pm, "hf", 7, f500 - 1500.0)
        if k == 6:
            if caches is not None:
                # the k=3 retune must not have recompiled either path
                assert step_s._cache_size() == caches[0], "single-chip retune recompiled"
                assert step_m._cache_size() == caches[1], "sharded retune recompiled"
                caches = None
            # mid-stream dynamic create: grow the hf group by one device-
            # multiple of slots (the radiod _rebuild path), carrying state
            import dataclasses

            def grow(eng, mesh_arg):
                specs = []
                for g in eng.specs:
                    if g.name == "hf":
                        specs.append(dataclasses.replace(
                            g, channels=g.channels + (g.channels[-1],) * n_devices))
                    else:
                        specs.append(g)
                return Engine(samprate=FS, real=True, groups=specs, mesh=mesh_arg)

            eng_s2, eng_m2 = grow(eng_s, None), grow(eng_m, mesh)
            init_s = jax.jit(eng_s2.init_state)()
            init_m = shard_engine_tree(eng_m2, mesh, jax.jit(eng_m2.init_state)())
            ss = jax.jit(migrate_state)(ss, init_s)
            sm = jax.jit(migrate_state)(sm, init_m)
            ps = eng_s2.adopt_host_params(eng_s)
            pm = eng_m2.adopt_host_params(eng_m)
            eng_s, eng_m = eng_s2, eng_m2
            step_s = jax.jit(eng_s.step, donate_argnums=0)
            step_m = jax.jit(eng_m.step, donate_argnums=0)
        blk = jnp.asarray(mkblock(k))
        ss, out_s = step_s(ss, ps, blk)
        sm, out_m = step_m(sm, pm, blk)
        if k < 2:
            continue  # master warm-up
        a_s = np.asarray(out_s["hf"]["audio"])
        a_m = np.asarray(out_m["hf"]["audio"])
        scale = max(float(np.max(np.abs(a_s))), 1e-6)
        np.testing.assert_allclose(a_m, a_s, rtol=rtol, atol=atol * scale,
                                   err_msg=f"hf audio, block {k}")
        # the NQ quantile is a discontinuous order statistic: the two
        # masters' bf16x3 rounding can pick adjacent bins near the
        # threshold on a few channels — 2% = 0.09 dB, an order below the
        # 0.4 dB reference-parity budget
        np.testing.assert_allclose(np.asarray(out_m["hf"]["info"]["n0"]),
                                   np.asarray(out_s["hf"]["info"]["n0"]),
                                   rtol=2e-2, err_msg=f"n0, block {k}")
        np.testing.assert_allclose(
            np.asarray(out_m["sweep"]["info"]["bin_data"]),
            np.asarray(out_s["sweep"]["info"]["bin_data"]),
            rtol=2e-2, atol=1e-12, err_msg=f"sweep bins, block {k}")
    if caches is not None:
        assert step_s._cache_size() == caches[0], "single-chip retune recompiled"
        assert step_m._cache_size() == caches[1], "sharded retune recompiled"
