"""Engine(time_shards=D): D consecutive blocks per dispatch across the
mesh (SURVEY §2.5 P5), value-identical to D sequential step() calls —
audio, info AND carried state (reference anchor: the mirror ring this
replaces, /root/reference/src/filter.c:245-264)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ka9q_radio_tpu.runtime import ChannelSpec, GroupSpec, Engine
from ka9q_radio_tpu.parallel import make_mesh

FS = 1_024_000
D = 8


def _groups():
    lin = tuple(ChannelSpec(freq=float(f), low=50.0, high=3000.0)
                for f in np.linspace(-400e3, 400e3, 6))
    fm = tuple(ChannelSpec(freq=float(f), low=-8000.0, high=8000.0)
               for f in np.linspace(-300e3, 300e3, 4))
    return [
        GroupSpec(name="usb", demod="linear", samprate=16_000, snr_squelch=True,
                  channels=lin),
        GroupSpec(name="nbfm", demod="fm", samprate=16_000, channels=fm),
        # a filter2 cascade exercises the carried tail2 in the scan
        GroupSpec(name="sharp", demod="linear", samprate=16_000, filter2=1,
                  channels=lin[:2]),
    ]


def _blocks(L, n, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, L, 2)).astype(np.float32) * 1e-2
    # add a couple of carriers so squelch/AGC/PLL state actually moves
    t = (np.arange(n * L).reshape(n, L)) / FS
    x[..., 0] += 0.05 * np.cos(2 * np.pi * 100e3 * t).astype(np.float32)
    x[..., 1] += 0.05 * np.sin(2 * np.pi * 100e3 * t).astype(np.float32)
    return (x[..., 0] + 1j * x[..., 1]).astype(np.complex64)


def test_time_sharded_equals_sequential():
    mesh = make_mesh(jax.devices()[:D])
    eng_t = Engine(samprate=FS, real=False, groups=_groups(), mesh=mesh,
                   time_shards=D, spurs=[100e3])
    eng_s = Engine(samprate=FS, real=False, groups=_groups(), spurs=[100e3])
    assert eng_t.groups["usb"].tiled == eng_s.groups["usb"].tiled

    blocks = _blocks(eng_s.L, 2 * D)
    st = jax.jit(eng_t.init_state)()
    ss = jax.jit(eng_s.init_state)()
    pt, ps = eng_t.init_params(), eng_s.init_params()
    step_t = jax.jit(eng_t.step_time, donate_argnums=0)
    step_s = jax.jit(eng_s.step, donate_argnums=0)

    from jax.sharding import NamedSharding, PartitionSpec as P
    shard = NamedSharding(mesh, P("c", None))

    for batch in range(2):
        bt = jax.device_put(jnp.asarray(blocks[batch * D:(batch + 1) * D]), shard)
        st, out_t = step_t(st, pt, bt)
        outs_s = []
        for d in range(D):
            ss, o = step_s(ss, ps, jnp.asarray(blocks[batch * D + d]))
            outs_s.append(o)
        for g in ("usb", "nbfm", "sharp"):
            a_t = np.asarray(out_t[g]["audio"])  # [D, C, olen]
            for d in range(D):
                np.testing.assert_allclose(
                    a_t[d], np.asarray(outs_s[d][g]["audio"]),
                    rtol=2e-5, atol=2e-6, err_msg=f"{g} block {d} batch {batch}")
            np.testing.assert_allclose(
                np.asarray(out_t[g]["info"]["n0"][-1]),
                np.asarray(outs_s[-1][g]["info"]["n0"]), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out_t["_frontend"]["if_power"])[:, 0],
            np.array([float(np.asarray(o["_frontend"]["if_power"])[0]) for o in outs_s]),
            rtol=1e-5)

    # carried state matches after 2*D blocks (master tail, AGC, squelch,
    # phase accumulators, spur trackers)
    flat_t = jax.tree_util.tree_leaves_with_path(jax.device_get(st))
    flat_s = dict(jax.tree_util.tree_flatten_with_path(jax.device_get(ss))[0])
    mismatches = []
    for kp, leaf in flat_t:
        ref = flat_s[kp]
        if not np.allclose(np.asarray(leaf), np.asarray(ref), rtol=2e-5, atol=2e-6):
            mismatches.append(jax.tree_util.keystr(kp))
    assert not mismatches, mismatches


def test_time_sharded_retune_no_recompile():
    from ka9q_radio_tpu.parallel import shard_engine_tree

    mesh = make_mesh(jax.devices()[:D])
    eng = Engine(samprate=FS, real=False, groups=_groups(), mesh=mesh,
                 time_shards=D)
    st = shard_engine_tree(eng, mesh, jax.jit(eng.init_state)())
    p = eng.init_params()
    step = jax.jit(eng.step_time, donate_argnums=0)
    blk = jnp.asarray(_blocks(eng.L, D))
    st, _ = step(st, p, blk)
    n = step._cache_size()
    p = eng.retune(p, "usb", 1, 222_000.0)
    st, _ = step(st, p, blk)
    assert step._cache_size() == n


def test_radiod_time_shards():
    """A time-sharded daemon ([global] mesh + time-shards) produces the
    same audio as a plain daemon on the same sig_gen scene, D blocks per
    dispatch, and commands stay recompile-free."""
    from ka9q_radio_tpu.config.loader import load_config
    from ka9q_radio_tpu.runtime.radiod import Radiod
    from ka9q_radio_tpu.net.status import StatusType as T, encode_status

    base = """
[global]
hardware = gen
{opts}status = 127.0.0.1
data = 127.0.0.1
update = 1

[gen]
device = sig_gen
samprate = 1m024
complex = yes
carrier = 100k
amplitude = -20
noise = -80

[am]
demod = am
samprate = 16k
low = -5k
high = 5k
freq = 100k
"""
    rd_t = Radiod(load_config(base.format(opts="mesh = yes\ntime-shards = yes\n")),
                  use_network=False)
    rd_p = Radiod(load_config(base.format(opts="")), use_network=False)
    assert rd_t._time_shards == len(jax.devices())
    D = rd_t._time_shards
    out_t = [rd_t.step_block() for _ in range(2)]  # 2 dispatches = 2D blocks
    out_p = [rd_p.step_block() for _ in range(2 * D)]
    assert rd_t.blocks == rd_p.blocks == 2 * D
    # the same sig_gen scene: last emitted block's audio matches
    np.testing.assert_allclose(
        np.asarray(out_t[-1]["am"]["audio"]), np.asarray(out_p[-1]["am"]["audio"]),
        rtol=2e-4, atol=3e-5)
    # a retune command must not recompile the time-sharded step
    n = rd_t.step._cache_size()
    rd_t.handle_packet(encode_status(
        {T.OUTPUT_SSRC: 100, T.RADIO_FREQUENCY: 120_000.0}, cmd=True))
    rd_t.step_block()
    assert rd_t.step._cache_size() == n


def test_time_shards_validation():
    mesh = make_mesh(jax.devices()[:4])
    with pytest.raises(ValueError, match="time_shards"):
        Engine(samprate=FS, real=False, groups=_groups(), mesh=mesh, time_shards=8)
    with pytest.raises(ValueError, match="mesh"):
        Engine(samprate=FS, real=False, groups=_groups(), time_shards=8)


def test_radiod_dispatch_batching_without_mesh():
    """time-shards WITHOUT a mesh: D blocks scan inside one dispatch on a
    single device — same audio as a plain daemon, D blocks per step_block
    (amortizes host<->device RTT for realtime pacing over remote links)."""
    from ka9q_radio_tpu.config.loader import load_config
    from ka9q_radio_tpu.runtime.radiod import Radiod

    base = """
[global]
hardware = gen
{opts}status = 127.0.0.1
data = 127.0.0.1
update = 1

[gen]
device = sig_gen
samprate = 1m024
complex = yes
carrier = 100k
amplitude = -20
noise = -80

[am]
demod = am
samprate = 16k
low = -5k
high = 5k
freq = 100k
"""
    rd_b = Radiod(load_config(base.format(opts="time-shards = 4\n")),
                  use_network=False)
    rd_p = Radiod(load_config(base.format(opts="")), use_network=False)
    assert rd_b._time_shards == 4 and rd_b._mesh is None
    out_b = [rd_b.step_block() for _ in range(3)]   # 12 blocks
    out_p = [rd_p.step_block() for _ in range(12)]
    assert rd_b.blocks == rd_p.blocks == 12
    np.testing.assert_allclose(
        np.asarray(out_b[-1]["am"]["audio"]), np.asarray(out_p[-1]["am"]["audio"]),
        rtol=2e-4, atol=3e-5)
    # commands stay recompile-free through the scan wrapper
    n = rd_b.step._cache_size()
    from ka9q_radio_tpu.net.status import StatusType as T, encode_status

    rd_b.handle_packet(encode_status(
        {T.OUTPUT_SSRC: 100, T.RADIO_FREQUENCY: 120_000.0}, cmd=True))
    rd_b.step_block()
    assert rd_b.step._cache_size() == n


def test_time_sharded_multi_input_equals_sequential():
    """time_shards × n_inputs composes: the halo exchange and the master
    batch over the [B] input axis; step_time([D, B, L]) == D× step([B, L])
    (VERDICT r3 #6 — the mode-composition matrix)."""
    B = 2
    mesh = make_mesh(jax.devices()[:D])

    def _g():
        lin0 = tuple(ChannelSpec(freq=float(f), low=50.0, high=3000.0, input=0)
                     for f in np.linspace(-400e3, 400e3, 3))
        lin1 = tuple(ChannelSpec(freq=float(f), low=50.0, high=3000.0, input=1)
                     for f in np.linspace(-350e3, 350e3, 3))
        return [GroupSpec(name="usb", demod="linear", samprate=16_000,
                          snr_squelch=True, channels=lin0 + lin1)]

    eng_t = Engine(samprate=FS, real=False, groups=_g(), mesh=mesh,
                   time_shards=D, n_inputs=B)
    eng_s = Engine(samprate=FS, real=False, groups=_g(), n_inputs=B)

    blocks = _blocks(eng_s.L, 2 * D, seed=3)          # input 0's stream
    blocks_b = _blocks(eng_s.L, 2 * D, seed=7) * 0.5  # input 1's stream
    both = np.stack([blocks, blocks_b], axis=1)       # [2D, B, L]

    st = jax.jit(eng_t.init_state)()
    ss = jax.jit(eng_s.init_state)()
    pt, ps = eng_t.init_params(), eng_s.init_params()
    step_t = jax.jit(eng_t.step_time, donate_argnums=0)
    step_s = jax.jit(eng_s.step, donate_argnums=0)

    from jax.sharding import NamedSharding, PartitionSpec as P
    shard = NamedSharding(mesh, P("c", None, None))

    for batch in range(2):
        bt = jax.device_put(jnp.asarray(both[batch * D:(batch + 1) * D]), shard)
        st, out_t = step_t(st, pt, bt)
        outs_s = []
        for d in range(D):
            ss, o = step_s(ss, ps, jnp.asarray(both[batch * D + d]))
            outs_s.append(o)
        a_t = np.asarray(out_t["usb"]["audio"])  # [D, C, olen]
        for d in range(D):
            np.testing.assert_allclose(
                a_t[d], np.asarray(outs_s[d]["usb"]["audio"]),
                rtol=2e-5, atol=2e-6, err_msg=f"block {d} batch {batch}")
        # per-input front-end powers line up [D, B]
        np.testing.assert_allclose(
            np.asarray(out_t["_frontend"]["if_power"]),
            np.stack([np.asarray(o["_frontend"]["if_power"]) for o in outs_s]),
            rtol=1e-5)

    # carried master tail identical after 2*D blocks, per input
    np.testing.assert_allclose(
        np.asarray(st["master"]["tail"]), np.asarray(ss["master"]["tail"]),
        rtol=1e-6, atol=1e-7)
