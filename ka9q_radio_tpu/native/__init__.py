"""Native (C++) host-runtime components, loaded via ctypes.

The TPU compute path is JAX/XLA; the host edge around it — packetization,
sockets, sample-format conversion — is where a Python loop becomes the
bottleneck at thousands of channels. These components are built lazily
with the system toolchain on first use and cached next to the sources;
every consumer has a pure-Python fallback, so the package works without a
compiler.
"""
from .edge import (RtpEdge, RtpIngest, ingest_blast, native_available,
                   native_has_opus)

__all__ = ["RtpEdge", "RtpIngest", "ingest_blast", "native_available",
           "native_has_opus"]
