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
