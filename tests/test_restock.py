"""Adaptive dynamic-slot restocking: the pool grows in the BACKGROUND so
dynamic creates never pay a foreground rebuild after the first (the
reference's always-resident table creates channels in ms,
radio_status.c:92-105)."""
import numpy as np

from ka9q_radio_tpu.config.loader import load_config
from ka9q_radio_tpu.runtime.radiod import Radiod
from ka9q_radio_tpu.net.status import StatusType as T, encode_status

CONF = """
[global]
hardware = gen
status = 127.0.0.1
data = 127.0.0.1
mode = usb
dyn-slots = 2

[gen]
device = sig_gen
samprate = 1m024
complex = yes
carrier = 100k
amplitude = -20
noise = -80

[am]
demod = am
samprate = 12k
low = -5k
high = 5k
freq = 100k
"""


def test_creates_never_block_after_first(monkeypatch):
    rd = Radiod(load_config(CONF), use_network=False)
    rebuilds = {"n": 0}
    orig = Radiod._rebuild

    def counting_rebuild(self, specs):
        rebuilds["n"] += 1
        return orig(self, specs)

    monkeypatch.setattr(Radiod, "_rebuild", counting_rebuild)

    # create channels faster than dyn-slots would cover without restocking
    for i, ssrc in enumerate(range(5001, 5011)):
        rd.handle_packet(encode_status(
            {T.OUTPUT_SSRC: ssrc, T.RADIO_FREQUENCY: 50_000.0 + 1000 * i},
            cmd=True))
        rd.step_block()
        # deterministic tests: let any in-flight background grow land
        rd._finish_restock(wait=True)
        rd.step_block()
    assert sum(1 for c in rd.chans.values() if c.dynamic) == 10
    # exactly ONE foreground rebuild (the very first create builds the dyn
    # group); every later create found a tombstoned slot because the
    # background restock kept the pool stocked
    assert rebuilds["n"] == 1, rebuilds
    # the background path really ran and grew the table
    gname = next(c.group for c in rd.chans.values() if c.dynamic)
    assert rd.engine.groups[gname].C >= 12
    out = rd.step_block()
    assert np.all(np.isfinite(np.asarray(out[gname]["audio"])))


def test_foreground_rebuild_voids_stale_restock():
    rd = Radiod(load_config(CONF), use_network=False)
    rd.handle_packet(encode_status(
        {T.OUTPUT_SSRC: 6001, T.RADIO_FREQUENCY: 60_000.0}, cmd=True))
    rd.handle_packet(encode_status(
        {T.OUTPUT_SSRC: 6002, T.RADIO_FREQUENCY: 61_000.0}, cmd=True))
    assert rd._restock is not None  # pool low -> grow scheduled
    # a foreground rebuild (demod-type move forces a new compiled class)
    rd.handle_packet(encode_status(
        {T.OUTPUT_SSRC: 6001, T.DEMOD_TYPE: 1}, cmd=True))
    epoch = rd._engine_epoch
    eng = rd.engine
    rd._finish_restock(wait=True)
    # the stale restock must NOT have replaced the rebuilt engine
    assert rd.engine is eng
    assert rd._engine_epoch == epoch
    rd.step_block()

def test_restock_lands_in_timeshard_no_mesh_mode():
    """time-shards WITHOUT a mesh (single-device D-block scan dispatch): the
    background restock swap must still land — regression for a guard that
    called shard_engine_tree with mesh=None and silently dropped every
    swap (radiod.py _finish_restock)."""
    conf = CONF.replace("dyn-slots = 2", "dyn-slots = 2\ntime-shards = 2")
    rd = Radiod(load_config(conf), use_network=False)
    assert rd._time_shards == 2 and rd._mesh is None
    rd.handle_packet(encode_status(
        {T.OUTPUT_SSRC: 7001, T.RADIO_FREQUENCY: 50_000.0}, cmd=True))
    rd.handle_packet(encode_status(
        {T.OUTPUT_SSRC: 7002, T.RADIO_FREQUENCY: 51_000.0}, cmd=True))
    assert rd._restock is not None
    gname = next(c.group for c in rd.chans.values() if c.dynamic)
    c_before = rd.engine.groups[gname].C
    rd._finish_restock(wait=True)
    assert rd._restock is None
    # the swap landed: the pool actually grew
    assert rd.engine.groups[gname].C > c_before
    out = rd.step_block()
    assert np.all(np.isfinite(np.asarray(out[gname]["audio"])))


def test_restock_auto_provisioning(monkeypatch):
    """VERDICT r5 #7: the pool sizes itself from measured create rate x
    restock latency. With a high create rate against a slow (mocked)
    restock, the scheduled grow count exceeds dyn-slots, and no create
    after the first ever pays a foreground rebuild."""
    rd = Radiod(load_config(CONF), use_network=False)
    rd.step_block()
    rebuilds = {"n": 0}
    orig = Radiod._rebuild

    def counting(self, specs):
        rebuilds["n"] += 1
        return orig(self, specs)

    monkeypatch.setattr(Radiod, "_rebuild", counting)
    scheduled = []
    orig_sched = Radiod._schedule_restock

    def spy_sched(self, gname):
        scheduled.append((gname, self._pool_need(gname)))
        return orig_sched(self, gname)

    monkeypatch.setattr(Radiod, "_schedule_restock", spy_sched)
    # pretend restocks take 30 s for this class (measured EMA)
    # first create: foreground rebuild (expected, pool empty at start)
    rd.handle_packet(encode_status({T.OUTPUT_SSRC: 5001, T.PRESET: "nfm",
                                    T.RADIO_FREQUENCY: 110_000.0}, cmd=True))
    assert rebuilds["n"] == 1
    gname = rd.chans[5001].group
    # the foreground rebuild seeded this class's latency estimate
    assert rd._restock_latency.get(gname, 0.0) > 0.0
    rd._restock_latency[gname] = 30.0
    # burst of creates drives the rate estimate up
    for i in range(2, 8):
        rd.handle_packet(encode_status({T.OUTPUT_SSRC: 5000 + i, T.PRESET: "nfm",
                                        T.RADIO_FREQUENCY: (110 + i) * 1000.0},
                                       cmd=True))
        rd._finish_restock(wait=True)
        rd.step_block()
    # provisioning demanded more than the dyn-slots floor at least once
    assert any(n > rd.dyn_spare for _, n in scheduled), scheduled
    # and the pool actually grew beyond the static floor
    assert rd.engine.groups[gname].C > 1 + rd.dyn_spare
    # only the very first create paid a foreground rebuild
    assert rebuilds["n"] == 1
