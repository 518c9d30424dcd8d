"""Four-step split master FFT: exactness vs the monolithic transform.

On TPU the monolithic large FFT is ~45x slower than the same transform as
batched small FFTs (see MasterConfig.split); these tests pin the split
path's numerics so the speedup never costs correctness.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ka9q_radio_tpu.ops.filterbank import (
    MasterConfig, master_init, master_fft, master_transform,
    split_fft, plan_split_single, split_fft_mxu, plan_split_mxu,
)
from ka9q_radio_tpu.runtime import ChannelSpec, GroupSpec, Engine


@pytest.mark.parametrize("n1,n2", [(60, 60), (32, 125), (540, 600)])
def test_split_fft_matches_numpy(n1, n2):
    N = n1 * n2
    rng = np.random.default_rng(3)
    z = (rng.standard_normal(N) + 1j * rng.standard_normal(N)).astype(np.complex64)
    got = np.asarray(split_fft(jnp.asarray(z), n1, n2))
    want = np.fft.fft(z.astype(np.complex128))
    scale = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) / scale < 2e-6


def test_split_fft_batched():
    n1, n2 = 36, 50
    rng = np.random.default_rng(5)
    z = (rng.standard_normal((3, n1 * n2)) + 1j * rng.standard_normal((3, n1 * n2))).astype(np.complex64)
    got = np.asarray(split_fft(jnp.asarray(z), n1, n2))
    want = np.fft.fft(z.astype(np.complex128), axis=-1)
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 2e-6


def test_plan_split_single():
    assert plan_split_single(3_240_000) == (1800, 1800)
    assert plan_split_single(1 << 24) is None  # twiddle exactness bound
    assert plan_split_single(7919 * 2) is None  # hopelessly lopsided
    n1, n2 = plan_split_single(1_620_000)
    assert n1 * n2 == 1_620_000 and n1 <= n2


@pytest.mark.parametrize("facs", [(12, 15, 20), (9, 200), (36, 50), (18, 36, 50)])
def test_split_fft_mxu_matches_numpy(facs):
    """The MXU matmul cascade == numpy FFT (complex and real-f32 input;
    the real path exercises the two-real-matmul first stage)."""
    N = int(np.prod(facs))
    rng = np.random.default_rng(7)
    z = (rng.standard_normal(N) + 1j * rng.standard_normal(N)).astype(np.complex64)
    got = np.asarray(jax.jit(lambda w: split_fft_mxu(w, facs))(jnp.asarray(z)))
    want = np.fft.fft(z.astype(np.complex128))
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 2e-6
    x = rng.standard_normal(N).astype(np.float32)
    got_r = np.asarray(jax.jit(lambda w: split_fft_mxu(w, facs))(jnp.asarray(x)))
    want_r = np.fft.fft(x.astype(np.float64))
    assert np.max(np.abs(got_r - want_r)) / np.max(np.abs(want_r)) < 2e-6


def test_split_fft_mxu_out_bins_prefix():
    """out_bins truncation returns the same natural-order prefix (the
    final DFT matrix is column-sliced — same math, so any delta is dot
    blocking roundoff) and still matches numpy at full accuracy."""
    facs = (12, 15, 20)
    N = int(np.prod(facs))
    bins = N // 2 + 1
    rng = np.random.default_rng(23)
    x = rng.standard_normal((3, N)).astype(np.float32)
    full = np.asarray(jax.jit(lambda w: split_fft_mxu(w, facs))(jnp.asarray(x)))
    pre = np.asarray(jax.jit(lambda w: split_fft_mxu(w, facs, bins))(jnp.asarray(x)))
    assert bins <= pre.shape[-1] < N
    scale = np.max(np.abs(full))
    assert np.max(np.abs(full[:, : pre.shape[-1]] - pre)) / scale < 1e-6
    want = np.fft.fft(x.astype(np.float64), axis=-1)[:, : pre.shape[-1]]
    assert np.max(np.abs(pre - want)) / np.max(np.abs(want)) < 2e-6
    # degenerate requests fall back to the full transform
    same = np.asarray(jax.jit(lambda w: split_fft_mxu(w, facs, N))(jnp.asarray(x)))
    np.testing.assert_array_equal(full, same)


def test_plan_split_mxu_real_prefers_large_last_factor():
    """Real-master planning accounts for the halved final stage: the last
    factor is the largest, and its costed width is ~half."""
    facs = plan_split_mxu(3_240_000, real=True)
    assert facs is not None and int(np.prod(facs)) == 3_240_000
    assert facs[-1] == max(facs)


def test_plan_split_mxu():
    facs = plan_split_mxu(3_240_000)
    assert facs is not None and int(np.prod(facs)) == 3_240_000
    assert all(8 <= f <= 512 for f in facs)
    # MXU cost (factors padded to the 128 lane width) beats the naive
    # near-square split's two ~1800-point stages
    assert sum(-(-f // 128) * 128 for f in facs) <= 512
    assert plan_split_mxu(7919) is None  # prime
    two = plan_split_mxu(512 * 512)
    assert two is not None and int(np.prod(two)) == 512 * 512


@pytest.mark.parametrize("real", [True, False])
def test_master_transform_mxu_vs_monolithic(real):
    mono = MasterConfig.from_rate(512_000, real=real, fft="monolithic")
    mx = MasterConfig.from_rate(512_000, real=real, fft="mxu")
    assert mx.mxu is not None and mx.N == mono.N
    rng = np.random.default_rng(13)
    if real:
        x = rng.standard_normal(mx.N).astype(np.float32)
    else:
        x = (rng.standard_normal(mx.N) + 1j * rng.standard_normal(mx.N)).astype(np.complex64)
    a = np.asarray(master_transform(mono, jnp.asarray(x)))
    b = np.asarray(master_transform(mx, jnp.asarray(x)))
    assert a.shape == b.shape
    assert np.max(np.abs(a - b)) / np.max(np.abs(a)) < 2e-6


@pytest.mark.parametrize("real", [True, False])
def test_master_transform_split_vs_monolithic(real):
    # forced split at a small N (auto only kicks in at >= 2^18)
    mono = MasterConfig.from_rate(512_000, real=real, fft="monolithic")
    split = MasterConfig.from_rate(512_000, real=real, fft="split")
    assert split.split is not None and mono.split is None
    assert split.N == mono.N
    rng = np.random.default_rng(11)
    if real:
        x = rng.standard_normal(split.N).astype(np.float32)
    else:
        x = (rng.standard_normal(split.N) + 1j * rng.standard_normal(split.N)).astype(np.complex64)
    a = np.asarray(master_transform(mono, jnp.asarray(x)))
    b = np.asarray(master_transform(split, jnp.asarray(x)))
    assert a.shape == b.shape
    scale = np.max(np.abs(a))
    assert np.max(np.abs(a - b)) / scale < 2e-6


def test_flagship_auto_plans_split():
    cfg = MasterConfig.from_rate(129_600_000, real=True)
    assert cfg.mxu is not None and int(np.prod(cfg.mxu)) == 3_240_000
    assert all(8 <= f <= 512 for f in cfg.mxu)
    assert cfg.N == 3_240_000
    # small rates stay monolithic (bit-stability of the historical path)
    small = MasterConfig.from_rate(1_024_000, real=False)
    assert small.split is None and small.mxu is None


def test_engine_audio_split_vs_monolithic():
    """Same RF scene through fft=split and fft=monolithic engines: the
    demodulated audio must agree to f32 roundoff. (AGC off: its threshold
    decisions can legitimately diverge on sub-roundoff power deltas.)"""
    FS = 2_048_000

    def run(fft):
        eng = Engine(samprate=FS, real=False, fft=fft, groups=[GroupSpec(
            name="g", demod="linear", samprate=16_000, agc=False,
            channels=(ChannelSpec(freq=300_000.0, low=50.0, high=3000.0,
                                  gain_db=20.0),))])
        state = jax.jit(eng.init_state)()
        params = eng.init_params()
        step = jax.jit(eng.step)
        outs = []
        n = eng.L
        for b in range(6):
            t = (b * n + np.arange(n)) / FS
            x = (0.5 * np.exp(2j * np.pi * 300_700.0 * t)).astype(np.complex64)
            state, out = step(state, params, jnp.asarray(x))
            outs.append(np.asarray(out["g"]["audio"][0]))
        return np.concatenate(outs)

    a = run("monolithic")
    b = run("split")
    assert np.max(np.abs(a - b)) < 1e-4 * max(1.0, np.max(np.abs(a)))
    c = run("mxu")
    assert np.max(np.abs(a - c)) < 1e-4 * max(1.0, np.max(np.abs(a)))


def test_fft_precision_plumbing():
    """fft-precision tiers: validated, carried on MasterConfig, inherited
    by wideband spectrum geometry; split_fft_mxu accepts tier names and
    produces the same result on CPU (precision only matters on the MXU)."""
    import dataclasses
    import pytest as _pytest

    cfg = MasterConfig.from_rate(512_000, real=True, fft="mxu", fft_precision="exact")
    assert cfg.fft_precision == "exact"
    assert MasterConfig.from_rate(512_000, real=True).fft_precision == "high"
    with _pytest.raises(ValueError):
        MasterConfig.from_rate(512_000, real=True, fft_precision="double")

    eng = Engine(samprate=16_200_000, real=True, fft_precision="bf16", groups=[
        GroupSpec(name="sweep", demod="spectrum", samprate=32_400,
                  bin_bw=1000.0, bin_count=16,
                  channels=(ChannelSpec(freq=3_000_000.0),))])
    assert eng.master.fft_precision == "bf16"
    assert eng.groups["sweep"].wide_geo.fft_precision == "bf16"

    rng = np.random.default_rng(41)
    z = (rng.standard_normal(3600) + 1j * rng.standard_normal(3600)).astype(np.complex64)
    a = np.asarray(jax.jit(lambda w: split_fft_mxu(w, (12, 15, 20), None, "exact"))(jnp.asarray(z)))
    b = np.asarray(jax.jit(lambda w: split_fft_mxu(w, (12, 15, 20), None, "high"))(jnp.asarray(z)))
    want = np.fft.fft(z.astype(np.complex128))
    scale = np.max(np.abs(want))
    assert np.max(np.abs(a - want)) / scale < 2e-6
    assert np.max(np.abs(b - want)) / scale < 2e-6  # CPU: tiers are equal
