"""Deformation-field utilities: identity grids, warping, composition.

API mirror of the reference's lagomorph/deform.py, TPU-native.
All tensors are NC(D)HW: batch, channel, then spatial dims; a displacement
field has ``dim`` channels.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .ops.interp import interp, interp_auto, splat, interp_hessian_diagonal_image
from .ops.sampling import identity_grid

__all__ = [
    "identity",
    "identity_grid",
    "interp",
    "interp_auto",
    "splat",
    "interp_hessian_diagonal_image",
    "compose",
    "compose_disp_vel",
    "compose_vel_disp",
]


def identity(defshape, dtype=np.float32):
    """Identity coordinate field for a deformation shape in NC(D)HW order.

    Reference: lagomorph/deform.py:10-21.  Returns ``(N, dim, *spatial)``.
    """
    dim = len(defshape) - 2
    spatial = tuple(defshape[2:])
    grid = identity_grid(spatial, dtype=jnp.dtype(dtype))
    return jnp.broadcast_to(grid[None], (defshape[0], dim) + spatial)


def compose(u, v, ds=1.0, dt=1.0, mode=None):
    """Return ``ds*u(x) + dt*v(x + ds*u(x))`` (reference deform.py:53-55).

    Uses the automatic unit-displacement fast path: in EPDiff integration
    the inner warp's displacement is one Euler sub-step (|ds*u| < 1 voxel
    for any stable step size), where the warp is a dense stencil instead of
    a gather.  ``mode`` statically forces a tier (see
    :func:`lagomorph_tpu.ops.interp.interp_auto`).

    On TPU with 3D f32 fields and ``dt == 1``, the unit regime runs the
    fused composition kernel (axpy + weights + warp in one VMEM pass)."""
    from .ops.interp import get_warp_mode
    from .ops.pallas import epdiff_unit as _eu
    from .ops.pallas import epdiff2d as _e2

    # global set_warp_mode() escape hatch: forced general/bounded modes skip
    # the fused dispatch entirely (interp_auto below honors the global too)
    effective = mode if mode is not None else get_warp_mode()
    fused = None
    if (
        isinstance(ds, (int, float))
        and isinstance(dt, (int, float))
        and dt == 1.0
        and effective in ("auto", "unit")
    ):
        if _eu.compose_supported(v.shape, u.shape, u.dtype):
            fused = _eu.compose_disp_vel_pallas
        elif _e2.supported(v.shape, u.shape, u.dtype):
            fused = _e2.compose2d_pallas
    if fused is not None:
        if effective == "unit":
            return fused(v, u, float(ds))
        import jax
        import jax.numpy as jnp

        d = ds * u
        unit = jnp.logical_and(jnp.all(d >= -1.0), jnp.all(d < 1.0))

        def fallback(v_, u_):
            return ds * u_ + interp_auto(v_, u_, dt=ds)

        return jax.lax.cond(
            unit,
            lambda v_, u_: fused(v_, u_, float(ds)),
            jax.checkpoint(fallback),
            v,
            u,
        )
    return ds * u + dt * interp_auto(v, u, dt=ds, mode=mode)


def compose_disp_vel(u, v, dt=1.0, mode=None):
    """Displacement-then-velocity composition: ``dt*v(x) + u(x + dt*v(x))``
    (reference deform.py:58-62)."""
    return compose(v, u, ds=dt, dt=1.0, mode=mode)


def compose_vel_disp(v, u, dt=1.0, mode=None):
    """Velocity-then-displacement composition: ``u(x) + dt*v(x + u(x))``
    (reference deform.py:65-70)."""
    return compose(u, v, ds=1.0, dt=dt, mode=mode)
