"""Host-edge networking: TLV status/command protocol, RTP framing, multicast.

Wire-compatible with ka9q-radio's control plane (docs/ka9q-api.md) and RTP
output streams, so stock clients (monitor, pcmrecord, control, powers,
metadump) can interoperate with the TPU radiod. Pure host-side code — the
device hot path never touches this layer.
"""
from .status import StatusType, PacketType, encode_status, decode_status
from .rtp import RtpHeader, Encoding, PayloadRegistry

__all__ = [
    "StatusType",
    "PacketType",
    "encode_status",
    "decode_status",
    "RtpHeader",
    "Encoding",
    "PayloadRegistry",
]
