"""Multi-front-end engine (one chip, B wideband streams) + N0 cadence.

The reference needs one radiod+host per SDR (README.md:10-12); here a
single Engine batches B same-geometry inputs over the master's leading
axis and each group binds to one stream (GroupSpec.input).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ka9q_radio_tpu.runtime import ChannelSpec, GroupSpec, Engine

FS = 1_024_000


def _chans(n=4, lo=50.0, hi=3000.0):
    return tuple(ChannelSpec(freq=float(f), low=lo, high=hi)
                 for f in np.linspace(-400e3, 400e3, n))


def _blocks(e, B, nblocks, seed=0):
    key = jax.random.PRNGKey(seed)
    shape = (nblocks, B, e.L) if B > 1 else (nblocks, e.L)
    n = jax.random.normal(key, shape + (2,), jnp.float32) * 1e-3
    return (n[..., 0] + 1j * n[..., 1]).astype(jnp.complex64)


def test_multi_input_matches_single():
    """Each input of a 3-stream engine produces bit-comparable audio to a
    single-input engine fed that stream alone."""
    groups3 = [GroupSpec(name=f"lin{b}", demod="linear", samprate=16_000,
                         channels=_chans(), input=b) for b in range(3)]
    e3 = Engine(samprate=FS, real=False, groups=groups3, n_inputs=3, spurs=[100e3])
    blocks = _blocks(e3, 3, 6)
    s3, p3 = jax.jit(e3.init_state)(), e3.init_params()
    step3 = jax.jit(e3.step)
    for k in range(6):
        s3, out3 = step3(s3, p3, blocks[k])

    for b in range(3):
        e1 = Engine(samprate=FS, real=False, spurs=[100e3],
                    groups=[GroupSpec(name=f"lin{b}", demod="linear",
                                      samprate=16_000, channels=_chans())])
        s1, p1 = jax.jit(e1.init_state)(), e1.init_params()
        step1 = jax.jit(e1.step)
        for k in range(6):
            s1, out1 = step1(s1, p1, blocks[k, b])
        np.testing.assert_allclose(
            np.asarray(out3[f"lin{b}"]["audio"]), np.asarray(out1[f"lin{b}"]["audio"]),
            rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(
            np.asarray(out3[f"lin{b}"]["info"]["n0"]), np.asarray(out1[f"lin{b}"]["info"]["n0"]),
            rtol=1e-5)
    assert np.asarray(out3["_frontend"]["if_power"]).shape == (3,)


def test_multi_input_retune_no_recompile():
    groups = [GroupSpec(name=f"lin{b}", demod="linear", samprate=16_000,
                        channels=_chans(), input=b) for b in range(2)]
    e = Engine(samprate=FS, real=False, groups=groups, n_inputs=2)
    s, p = jax.jit(e.init_state)(), e.init_params()
    step = jax.jit(e.step)
    blk = _blocks(e, 2, 1)[0]
    s, _ = step(s, p, blk)
    n0 = step._cache_size()
    p = e.retune(p, "lin1", 2, 123_456.0)
    s, _ = step(s, p, blk)
    assert step._cache_size() == n0


def test_input_index_validated():
    with pytest.raises(ValueError, match="input 2"):
        Engine(samprate=FS, real=False, n_inputs=2,
               groups=[GroupSpec(name="x", demod="linear", samprate=16_000,
                                 channels=_chans(), input=2)])


def test_per_input_centers():
    """Per-input front-end centers: the same RF dial frequency maps to a
    different IF on each stream."""
    groups = [GroupSpec(name=f"lin{b}", demod="linear", samprate=16_000,
                        channels=(ChannelSpec(freq=7_100_000.0, low=50.0, high=3000.0),),
                        input=b) for b in range(2)]
    e = Engine(samprate=FS, real=False, groups=groups, n_inputs=2,
               center=[7_000_000.0, 7_200_000.0])
    sh0 = e.groups["lin0"].host["shifts"][0]
    sh1 = e.groups["lin1"].host["shifts"][0]
    assert sh0 > 0 > sh1  # +100 kHz IF vs -100 kHz IF


def test_noise_cadence_matches_every_block_steady_state():
    """noise_every=4 (compounded EMA) converges to the same N0 as
    noise_every=1 on stationary noise, within a tight tolerance."""
    def run(noise_every):
        e = Engine(samprate=FS, real=False, noise_every=noise_every,
                   groups=[GroupSpec(name="lin", demod="linear",
                                     samprate=16_000, channels=_chans())])
        s, p = jax.jit(e.init_state)(), e.init_params()
        step = jax.jit(e.step)
        blocks = _blocks(e, 1, 24, seed=3)
        for k in range(24):
            s, out = step(s, p, blocks[k])
        return np.asarray(out["lin"]["info"]["n0"])

    n0_1, n0_4 = run(1), run(4)
    assert np.all(n0_1 > 0) and np.all(n0_4 > 0)
    np.testing.assert_allclose(n0_4, n0_1, rtol=0.25)


def test_noise_cadence_updates_only_on_schedule():
    """Between cadence ticks the carried N0 must not move (after warmup)."""
    e = Engine(samprate=FS, real=False, noise_every=4,
               groups=[GroupSpec(name="lin", demod="linear",
                                 samprate=16_000, channels=_chans())])
    s, p = jax.jit(e.init_state)(), e.init_params()
    step = jax.jit(e.step)
    blocks = _blocks(e, 1, 12, seed=4)
    n0s = []
    for k in range(12):
        s, out = step(s, p, blocks[k])
        n0s.append(np.asarray(out["lin"]["info"]["n0"]))
    # jobnum gate: estimates at pre-step jobnum % 4 == 0 (blocks 0,4,8) and
    # during warmup (jobnum 0,1); elsewhere n0 is carried unchanged
    for k in range(3, 12):
        if (k % 4) != 0:
            np.testing.assert_array_equal(n0s[k], n0s[k - 1])
    assert not np.array_equal(n0s[8], n0s[7])


def test_radiod_multi_front_end(tmp_path):
    """A two-sig_gen daemon: per-input carriers demodulate on their own
    streams, status reports per-input IF power."""
    from ka9q_radio_tpu.config.loader import load_config
    from ka9q_radio_tpu.runtime.radiod import Radiod

    conf = """
[global]
hardware = fe0 fe1
status = 127.0.0.1
data = 127.0.0.1
update = 1

[fe0]
device = sig_gen
samprate = 1m024
complex = yes
carrier = 100k
amplitude = -20
noise = -90

[fe1]
device = sig_gen
samprate = 1m024
complex = yes
carrier = -200k
amplitude = -40
noise = -90

[chan-a]
hardware = fe0
demod = am
samprate = 16k
low = -5k
high = 5k
freq = 100k

[chan-b]
hardware = fe1
demod = am
samprate = 16k
low = -5k
high = 5k
freq = -200k
"""
    cfg = load_config(conf)
    assert cfg.n_inputs == 2
    assert [g.input for g in cfg.groups] == [0, 1]
    rd = Radiod(cfg, use_network=False)
    for _ in range(10):
        out = rd.step_block()
    # each channel sees its own carrier: strong baseband power on both
    pa = float(np.asarray(out["chan-a"]["info"]["baseband_power"])[0])
    pb = float(np.asarray(out["chan-b"]["info"]["baseband_power"])[0])
    assert pa > 1e-4 and pb > 1e-6
    assert pa > pb * 10  # fe0's carrier is 20 dB stronger
    # per-input IF power tracked separately
    assert rd.if_power_in[0] > rd.if_power_in[1] * 10


def test_per_channel_inputs_one_batched_group():
    """ONE group spanning B streams (ChannelSpec.input) matches B
    single-input engines — the compile-O(1) form of the multi-front-end
    engine (gathers fold the per-input offset into their indices)."""
    B = 3
    per = 4
    chans = tuple(ChannelSpec(freq=float(f), low=50.0, high=3000.0, input=b)
                  for b in range(B) for f in np.linspace(-400e3, 400e3, per))
    eng = Engine(samprate=FS, real=False, n_inputs=B, spurs=[100e3],
                 groups=[GroupSpec(name="lin", demod="linear", samprate=16_000,
                                   channels=chans)])
    blocks = _blocks(eng, B, 6)
    s, p = jax.jit(eng.init_state)(), eng.init_params()
    step = jax.jit(eng.step)
    for k in range(6):
        s, out = step(s, p, blocks[k])
    audio = np.asarray(out["lin"]["audio"])  # [B*per, olen]
    n0 = np.asarray(out["lin"]["info"]["n0"])

    for b in range(B):
        e1 = Engine(samprate=FS, real=False, spurs=[100e3],
                    groups=[GroupSpec(name="lin", demod="linear",
                                      samprate=16_000, channels=_chans(per))])
        s1, p1 = jax.jit(e1.init_state)(), e1.init_params()
        step1 = jax.jit(e1.step)
        for k in range(6):
            s1, o1 = step1(s1, p1, blocks[k, b])
        np.testing.assert_allclose(audio[b * per:(b + 1) * per],
                                   np.asarray(o1["lin"]["audio"]),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(n0[b * per:(b + 1) * per],
                                   np.asarray(o1["lin"]["info"]["n0"]), rtol=1e-5)

    # retunes stay pure data with per-channel inputs
    n = step._cache_size()
    p = eng.retune(p, "lin", 5, 123_456.0)
    s, _ = step(s, p, blocks[0])
    assert step._cache_size() == n


def test_per_channel_inputs_real_master_tiled():
    """Per-channel inputs on a REAL master exercise the tiled gather's
    row-offset path (the flagship rx888xB layout)."""
    B = 2
    FSr = 2_048_000
    per = 6
    chans = tuple(ChannelSpec(freq=float(f), low=50.0, high=3000.0, input=b)
                  for b in range(B)
                  for f in np.linspace(0.05 * FSr, 0.45 * FSr, per))
    eng = Engine(samprate=FSr, real=True, n_inputs=B,
                 groups=[GroupSpec(name="hf", demod="linear", samprate=16_000,
                                   channels=chans)])
    assert eng.groups["hf"].tiled
    rng = np.random.default_rng(0)
    t = np.arange(6 * eng.L).reshape(6, eng.L) / FSr
    f0 = 0.05 * FSr + 700.0
    blocks = np.stack([
        rng.normal(size=(6, eng.L)).astype(np.float32) * 1e-3
        + (0.05 * np.cos(2 * np.pi * f0 * t)).astype(np.float32),
        rng.normal(size=(6, eng.L)).astype(np.float32) * 1e-3,
    ], axis=1)  # [6, B, L]
    s, p = jax.jit(eng.init_state)(), eng.init_params()
    step = jax.jit(eng.step)
    for k in range(6):
        s, out = step(s, p, jnp.asarray(blocks[k]))
    bbp = np.asarray(out["hf"]["info"]["baseband_power"])
    # channel 0 (input 0) hears the carrier; its input-1 twin does not
    assert bbp[0] > 100 * bbp[per]


def test_config_per_sublist_hardware():
    """Numbered freq sub-lists bind to different front ends (hardware0..9):
    one section stripes its channels across streams."""
    from ka9q_radio_tpu.config.loader import load_config

    cfg = load_config("""
[global]
hardware = fe0 fe1

[fe0]
device = sig_gen
samprate = 1m024
complex = yes

[fe1]
device = sig_gen
samprate = 1m024
complex = yes

[scan]
demod = linear
samprate = 16k
freq0 = 100k 110k
hardware0 = fe0
freq1 = -200k
hardware1 = fe1
""")
    (g,) = cfg.groups
    assert [c.input for c in g.channels] == [0, 0, 1]
    from ka9q_radio_tpu.runtime import Engine

    eng = Engine(samprate=cfg.samprate, real=cfg.real, groups=cfg.groups,
                 n_inputs=cfg.n_inputs)
    assert list(eng.groups["scan"].inputs) == [0, 0, 1]


def test_radiod_multi_front_end_time_shards():
    """time-shards × multi-[hardware] in the daemon: the fused sig_gen
    generator scans [D, B, L] and step_time demods both streams — same
    per-channel results as the plain multi-FE daemon."""
    from ka9q_radio_tpu.config.loader import load_config
    from ka9q_radio_tpu.runtime.radiod import Radiod

    base = """
[global]
hardware = fe0 fe1
{opts}status = 127.0.0.1
data = 127.0.0.1
update = 1

[fe0]
device = sig_gen
samprate = 1m024
complex = yes
carrier = 100k
amplitude = -20
noise = -90

[fe1]
device = sig_gen
samprate = 1m024
complex = yes
carrier = -200k
amplitude = -40
noise = -90

[chan-a]
hardware = fe0
demod = am
samprate = 16k
low = -5k
high = 5k
freq = 100k

[chan-b]
hardware = fe1
demod = am
samprate = 16k
low = -5k
high = 5k
freq = -200k
"""
    rd_t = Radiod(load_config(base.format(opts="mesh = yes\ntime-shards = yes\n")),
                  use_network=False)
    rd_p = Radiod(load_config(base.format(opts="")), use_network=False)
    D = rd_t._time_shards
    assert D == len(jax.devices()) and rd_t.engine.n_inputs == 2
    out_t = [rd_t.step_block() for _ in range(2)]
    out_p = [rd_p.step_block() for _ in range(2 * D)]
    assert rd_t.blocks == rd_p.blocks == 2 * D
    for ch in ("chan-a", "chan-b"):
        np.testing.assert_allclose(
            np.asarray(out_t[-1][ch]["audio"]), np.asarray(out_p[-1][ch]["audio"]),
            rtol=2e-4, atol=3e-5, err_msg=ch)
    # per-input IF power split survives the composition
    assert rd_t.if_power_in.shape == (2,)
    assert rd_t.if_power_in[0] > rd_t.if_power_in[1] * 10
