"""mDNS advertise/browse loopback (the avahi.c analog)."""
import os
import time

import pytest

from ka9q_radio_tpu.net.mdns import MdnsAdvertiser, browse, SVC_CTL


def test_mdns_advertise_and_browse():
    adv = MdnsAdvertiser(hostname=f"tputest{os.getpid()}")
    adv.add_service(SVC_CTL, f"radio-{os.getpid()}", 5006,
                    {"status": "test.local", "source": "sig_gen"})
    adv.start()
    try:
        time.sleep(0.3)
        results = browse(SVC_CTL, timeout=2.0)
        mine = [r for r in results if r.get("instance") == f"radio-{os.getpid()}"]
        assert mine, results
        e = mine[0]
        assert e["port"] == 5006
        assert e["txt"].get("status") == "test.local"
        assert e.get("addr")
    finally:
        adv.stop()
