"""Pallas TPU fast-path kernels.

These are optional accelerators behind the pure-JAX ops (which remain the
reference semantics and the fallback on unsupported shapes/platforms).
"""
from .warp_unit import (
    pallas_available,
    sample_displacement_unit_pallas,
    set_pallas_warp,
    pallas_warp_enabled,
)

__all__ = [
    "pallas_available",
    "sample_displacement_unit_pallas",
    "set_pallas_warp",
    "pallas_warp_enabled",
]
