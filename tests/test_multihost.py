"""Multi-host (DCN) story: the sharded engine over a mesh spanning TWO
PROCESSES — jax.distributed with cross-process Gloo collectives, the CPU
stand-in for multi-slice DCN (SURVEY §2.5 "DCN collectives for
multi-slice"). Each process checks its addressable channel shards against
a single-device reference."""
import os
import subprocess
import sys

import pytest


def test_two_process_mesh(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    port = 9600 + os.getpid() % 300
    env = {**os.environ, "PALLAS_AXON_POOL_IPS": ""}
    env.pop("XLA_FLAGS", None)  # worker sets its own 2-device count
    procs = [subprocess.Popen([sys.executable, worker, str(i), "2", str(port)],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              text=True, env=env)
             for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, (out, err[-2000:])
        assert "MULTIHOST-OK" in out, (out, err[-2000:])
