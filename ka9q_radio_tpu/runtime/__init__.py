"""Runtime: front-end sources, the channelizer engine, and block stepping.

This is the TPU-native analog of the reference's radiod core (radio.c
main loop + demod threads): a single jitted `Engine.step` consumes one
input block, runs the shared master FFT, downconverts every channel group
(frequency-domain select/filter/decimate + fine tuning + noise estimate),
and dispatches each group's vmapped demodulator — all in one compiled XLA
program with functionally-carried state instead of threads and mutexes.
"""
from .source import SigGenConfig, siggen_init, siggen_block
from .engine import ChannelSpec, GroupSpec, Engine

__all__ = [
    "SigGenConfig",
    "siggen_init",
    "siggen_block",
    "ChannelSpec",
    "GroupSpec",
    "Engine",
    "Radiod",
]


def __getattr__(name):
    if name == "Radiod":  # lazy: radiod pulls in the net stack
        from .radiod import Radiod
        return Radiod
    raise AttributeError(name)
