"""Live end-to-end drive of the PRODUCTION daemon on the real TPU.

Opt-in (`KA9Q_TPU_LIVE=1 pytest tests/test_tpu_live.py`): the default
suite runs CPU-only, but this test starts `radiod-tpu` as a subprocess
on the ambient (axon TPU) platform and drives it with the stock client
flow over multicast loopback — the same procedure as the reference's
operational verification (SURVEY §4: radiod against sig_gen, checked
via the status protocol and recorded audio).

Axon notes (see CLAUDE.md): each uncached jit remote-compiles in
30-90 s, and during a compile-service outage an uncached program
poisons its process — so this test allows a long startup budget and
skips (rather than fails) if the daemon never lands a block.
"""
import os
import select
import signal
import subprocess
import sys
import time
import wave

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("KA9Q_TPU_LIVE"),
    reason="live-TPU drive is opt-in: set KA9Q_TPU_LIVE=1",
)

UNIQ = os.getpid()
CONF = f"""
[global]
hardware = sig_gen
status = tpulive-{UNIQ}-st.local
data = tpulive-{UNIQ}-pcm.local
update = 10
ttl = 0
fail-deadline = 45
restart = 5
wisdom = /tmp/ka9q_radio_tpu_xla_cache

[sig_gen]
device = sig_gen
samprate = 512k
complex = yes
carrier = 101k
amplitude = -20
noise = -140

[usb]
mode = usb
samprate = 12k
freq = 100k3
"""

# clients must NOT grab the TPU: CPU platform, no axon registration
CLIENT_ENV = {**os.environ, "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"}

# the daemon MUST: strip the CPU forcing tests/conftest.py exported into
# this process's environ (and its 8-host-device XLA flag) so the subprocess
# comes up on the ambient axon platform
DAEMON_ENV = {k: v for k, v in os.environ.items()
              if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}


def test_tpu_daemon_end_to_end(tmp_path):
    conf = tmp_path / "live.conf"
    conf.write_text(CONF)
    log = open(tmp_path / "radiod.log", "wb")
    rd = subprocess.Popen(
        ["radiod-tpu", str(conf), "-v"], stdout=log, stderr=log, env=DAEMON_ENV)
    try:
        # wait for audio to actually flow (compile can take minutes cold)
        from ka9q_radio_tpu.net.multicast import resolve_dest, listen_socket
        rx = listen_socket(resolve_dest(f"tpulive-{UNIQ}-pcm.local", 5004))
        deadline = time.monotonic() + 420
        got = False
        while time.monotonic() < deadline and not got:
            if rd.poll() is not None:
                pytest.fail("radiod-tpu exited during startup — see radiod.log")
            r, _, _ = select.select([rx], [], [], 2.0)
            got = bool(r)
        rx.close()
        if not got:
            pytest.skip("no blocks landed in 7 min — tunnel outage, not a bug")

        # record 8 s and find the 700 Hz beat of the 101 kHz carrier in
        # the 100.3 kHz USB channel
        rec = tmp_path / "rec"
        subprocess.run(
            [sys.executable, "-m", "ka9q_radio_tpu.cli.pcmrecord",
             "--data", f"tpulive-{UNIQ}-pcm.local", "--dir", str(rec),
             "--duration", "8"],
            env=CLIENT_ENV, timeout=60, check=True)
        wavs = sorted(rec.glob("*_ssrc100.wav"))
        assert wavs, "pcmrecord captured nothing"
        w = wave.open(str(wavs[-1]))
        x = np.frombuffer(w.readframes(w.getnframes()), np.int16).astype(np.float64)
        x = x[x.size // 4:]
        assert x.size > 12_000
        spec = np.abs(np.fft.rfft(x * np.hanning(x.size)))
        peak = np.argmax(spec) * 12_000 / x.size
        assert abs(peak - 700.0) < 30.0, peak

        # live retune (+300 Hz) through tune-tpu; the daemon must apply it
        out = subprocess.run(
            [sys.executable, "-m", "ka9q_radio_tpu.cli.tune",
             "--radio", f"tpulive-{UNIQ}-st.local", "--ssrc", "100",
             "-f", "100k6", "--timeout", "30"],
            env=CLIENT_ENV, timeout=90, capture_output=True, text=True)
        assert "100600" in out.stdout, out.stdout
    finally:
        rd.send_signal(signal.SIGINT)
        try:
            rd.wait(timeout=20)
        except subprocess.TimeoutExpired:
            rd.kill()
        log.close()


def test_tpu_realtime_soak(tmp_path):
    """Multi-minute realtime evidence on the real chip (the reference's
    10 s timing self-checks, main.c:151-188): run the paced daemon for
    ~2.5 min after warmup, then assert p99 block latency < the 20 ms
    budget and ZERO dropped blocks. Results land in radiod.log (the
    stats_line with p50/p99) for docs/OPERATIONS.md."""
    import re

    conf = tmp_path / "soak.conf"
    # dispatch batching: over the axon tunnel a per-block dispatch costs a
    # ~30 ms round trip (the earlier soak measured p50 31.6 ms with ZERO
    # device backlog); time-shards scans 16 blocks per dispatch so pacing
    # reflects device throughput. Local-PCIe deployments don't need it.
    conf.write_text(CONF + "\n")
    conf.write_text(CONF.replace("[global]", "[global]\ntime-shards = 16"))
    log_path = tmp_path / "radiod.log"
    log = open(log_path, "wb")
    # 7500 paced blocks = 150 s of stream time after the first compiles
    rd = subprocess.Popen(
        ["radiod-tpu", str(conf), "-v", "--blocks", "7500"],
        stdout=log, stderr=log, env=DAEMON_ENV)
    try:
        rd.wait(timeout=600)
    except subprocess.TimeoutExpired:
        rd.kill()
        pytest.skip("soak did not finish in 10 min — tunnel outage, not a bug")
    finally:
        log.close()
    text = log_path.read_text(errors="replace")
    stats = re.findall(r"(\d+) blocks, (\d+) drops, block time avg ([\d.]+) ms "
                       r"min ([\d.]+) p50 ([\d.]+) p99 ([\d.]+) max ([\d.]+)", text)
    assert stats, f"no stats lines in log:\n{text[-2000:]}"
    blocks, drops, avg, tmin, p50, p99, tmax = stats[-1]
    print(f"soak: {blocks} blocks, {drops} drops, "
          f"p50 {p50} ms, p99 {p99} ms, max {tmax} ms")
    assert int(drops) == 0, f"{drops} dropped blocks in the soak"
    # p99 under the 20 ms real-time budget (percentiles exclude the first
    # compile because the ring only holds post-warmup steady state at
    # 7500 > ring + warmup... the first stats line covers warmup; use the
    # LAST line, whose ring is dominated by steady state)
    assert float(p99) < 20.0, f"p99 {p99} ms breaches the 20 ms block budget"


@pytest.mark.skipif(
    not os.environ.get("KA9Q_TPU_LIVE"),
    reason="live-TPU drive is opt-in: set KA9Q_TPU_LIVE=1",
)
def test_tpu_live_rtp_ingest():
    """LIVE daemon fed REAL RTP samples (round 5): the native reader on
    loopback, front-end rate auto-sized to the measured h2d link
    (tools/bench_ingest daemon --fs 0). Asserts zero ingest starvation
    and positive realtime margin at the chosen rate."""
    import json
    import subprocess
    import sys as _sys

    r = subprocess.run(
        [_sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                       "tools", "bench_ingest.py"),
         "daemon", "--fs", "0", "--secs", "30", "--channels", "100",
         "--shards", "8"],
        capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["starve_frames"] == 0, out
    assert out["block_drops"] == 0, out
    assert out["realtime_margin"] > 0.97, out
