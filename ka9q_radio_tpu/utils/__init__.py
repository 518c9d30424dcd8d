from .units import (  # noqa: F401
    dB_to_power,
    dB_to_voltage,
    power_to_dB,
    voltage_to_dB,
)
from .parse import parse_frequency  # noqa: F401
