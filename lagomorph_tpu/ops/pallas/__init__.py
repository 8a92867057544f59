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
from .epdiff_unit import (
    ad_star_unit_pallas,
    compose_disp_vel_pallas,
    set_fused_adstar,
)

__all__ = [
    "pallas_available",
    "sample_displacement_unit_pallas",
    "set_pallas_warp",
    "pallas_warp_enabled",
    "ad_star_unit_pallas",
    "compose_disp_vel_pallas",
    "set_fused_adstar",
]
