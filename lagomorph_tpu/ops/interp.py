"""Free-form deformation interpolation ops.

TPU-native equivalents of the reference's ``interp`` CUDA kernels
(reference: lagomorph/extension/cuda/interp.cu:15-313): sample an image (or
vector field) ``I`` through a displacement field ``u``:

    out_{n,c}(x) = I_{n,c}(x + dt * u_n(x))

with CLAMP boundary and broadcasting of a size-1 image batch over a larger
displacement batch.  Gradients come from JAX autodiff of the exact forward
discretization; the resulting VJPs are mathematically identical to the
reference's hand-written backward kernels (atomic splat for d_I, analytic
lerp gradient x dt for d_u — interp.cu:132-313).
"""
from __future__ import annotations

import itertools
from functools import partial

import jax.numpy as jnp

import jax

from .sampling import (
    _sdb_bwd,
    _sdb_fwd,
    identity_grid,
    sample_displacement_bounded,
    sample_displacement_unit,
    sample_linear,
    splat_linear,
)


def interp(I: jnp.ndarray, u: jnp.ndarray, dt: float = 1.0,
           background: str = "clamp", background_value: float = 0.0) -> jnp.ndarray:
    """Deform image/vector field ``I`` by displacement ``u``.

    Args:
      I: ``(NI, C, *spatial)``; ``NI in {1, N}`` (1 broadcasts over batch).
      u: ``(N, dim, *spatial)`` displacement field in voxel units.
      dt: time-step scaling applied to ``u``.
      background: boundary strategy — ``"clamp"`` (default, the reference
        Python API's only choice), ``"wrap"``, ``"zero"``, or ``"val"``
        with ``background_value`` (the full BackgroundStrategy tier of the
        reference's extrap.h:40-57).

    Returns:
      ``(N, C, *spatial)`` with ``out(x) = I(x + dt*u(x))``.
    """
    dim = u.shape[1]
    spatial = u.shape[2:]
    grid = identity_grid(spatial, dtype=u.dtype)
    coords = grid[None] + dt * u
    return sample_linear(I, coords, background=background,
                         background_value=background_value)


# Global warp-path mode:
#   "auto"    — runtime lax.cond tier selection (default; always exact)
#   "unit"    — force the 27-tap stencil (caller guarantees |d| < 1)
#   "bounded" — force the radius-R offset sweep (caller guarantees |d| <= R)
#   "general" — force the gather path
# Static modes avoid the cond; useful when the caller knows the regime and
# wants the leanest compiled program (e.g. inside long optimization scans).
_WARP_MODE = "auto"


def set_warp_mode(mode: str):
    """Set the global warp-path mode (see ``_WARP_MODE`` above).

    Read at *trace* time: already-jitted functions keep the mode they were
    traced with because jit caches do not key on this flag.  Set the mode
    before building/jitting step functions (or retrace them) for a change
    to take effect.
    """
    global _WARP_MODE
    if mode not in ("auto", "unit", "bounded", "general"):
        raise ValueError(mode)
    prev = _WARP_MODE
    _WARP_MODE = mode
    return prev


def get_warp_mode() -> str:
    """The current global warp-path mode (live value; see
    :func:`set_warp_mode`).  Fused-kernel dispatch sites read this so the
    escape hatch also disables the Pallas/cond fast paths."""
    return _WARP_MODE


def interp_auto(
    I: jnp.ndarray, u: jnp.ndarray, dt: float = 1.0, radius: int = 2,
    mode: str | None = None,
) -> jnp.ndarray:
    """:func:`interp` with automatic tiered fast paths.

    Tier 1: every component of ``dt*u`` in [-1, 1) — always true for the
    sub-step compositions of a stable EPDiff integration — the warp is a
    fully-fused weighted sum of 3^dim clamped shifts.
    Tier 2: components bounded by ``radius`` — a dense offset-sweep
    (:func:`sample_displacement_bounded`) whose custom VJP is scatter-free.
    Tier 3: the general gather.

    The tiers are runtime ``lax.cond`` switches on the displacement bound,
    so one compiled program covers all regimes with identical results.

    ``mode``: per-call static tier override ("unit"/"bounded"/"general"),
    taking precedence over the global :func:`set_warp_mode` setting; the
    caller guarantees the displacement regime.
    """
    d = dt * u if dt != 1.0 else u
    N = u.shape[0]
    Ib = I
    if I.shape[0] == 1 and N > 1:
        Ib = jnp.broadcast_to(I, (N,) + I.shape[1:])

    # tier-1 implementation: fused Pallas kernel when the shape/dtype
    # qualifies, else the XLA 27-tap stencil
    from .pallas import warp_unit as _wu

    if _wu.fastpath_supported(Ib.shape, d.shape, d.dtype):
        unit_impl = _wu.sample_displacement_unit_pallas
    else:
        unit_impl = sample_displacement_unit

    mode = mode if mode is not None else _WARP_MODE
    if mode not in ("auto", "unit", "bounded", "general"):
        raise ValueError(mode)
    if mode == "unit":
        return unit_impl(Ib, d)
    if mode == "bounded":
        return sample_displacement_bounded(Ib, d, radius)
    if mode == "general":
        return interp(Ib, d, 1.0)
    return _interp_auto_tiered(I, d, int(radius))


def _tier_flags(d, radius):
    unit = jnp.logical_and(jnp.all(d >= -1.0), jnp.all(d < 1.0))
    bounded = jnp.logical_and(
        jnp.all(d >= -float(radius)), jnp.all(d < float(radius + 1))
    )
    return unit, bounded


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _interp_auto_tiered(I, d, radius):
    """Runtime-tiered warp with a TOP-LEVEL custom VJP.

    The tier dispatch (two ``lax.cond``s) lives inside both the forward and
    the backward, so the residuals saved across the cond are just ``(I, d)``
    — one shared pair for every branch.  Differentiating *through* the conds
    instead (the round-2 formulation) made each branch save its own
    residuals, and the VJP-of-cond machinery then allocated and zero-filled
    the union of all branches' residual buffers every call: measured
    ~3.1 ms/step of the 128³b4 atlas step (step_decomp, round 3), gone with
    this formulation.  Values and gradients are identical — every tier
    equals the general path in its validity regime (tests/test_interp.py),
    and each tier's VJP is exact."""
    return _interp_auto_fwd(I, d, radius)[0]


def _interp_auto_fwd(I, d, radius):
    from .pallas.warp_unit import _sdu_fwd

    def tier23():
        return jax.lax.cond(
            _tier_flags(d, radius)[1],
            lambda: _sdb_fwd(I, d, radius)[0],
            lambda: interp(I, d, 1.0),
        )

    out = jax.lax.cond(
        _tier_flags(d, radius)[0],
        lambda: _sdu_fwd(I, d)[0],
        tier23,
    )
    return out, (I, d)


def _interp_auto_bwd(radius, res, g):
    from .pallas.warp_unit import _sdu_bwd

    I, d = res
    unit, bounded = _tier_flags(d, radius)

    def general_bwd():
        _, pull = jax.vjp(lambda I_, d_: interp(I_, d_, 1.0), I, d)
        return pull(g)

    def tier23_bwd():
        return jax.lax.cond(
            bounded,
            lambda: _sdb_bwd(radius, (I, d), g),
            general_bwd,
        )

    return jax.lax.cond(
        unit,
        lambda: _sdu_bwd((I, d), g),
        tier23_bwd,
    )


_interp_auto_tiered.defvjp(_interp_auto_fwd, _interp_auto_bwd)


def splat(values: jnp.ndarray, u: jnp.ndarray, dt: float = 1.0) -> jnp.ndarray:
    """Adjoint of :func:`interp` in the image slot: scatter ``values``
    through the displacement field.  (The reference exposes this only as the
    backward of interp — interp.cu:162-178; having it public enables e.g.
    the ``Ad`` big adjoint action.)"""
    spatial = u.shape[2:]
    grid = identity_grid(spatial, dtype=u.dtype)
    coords = grid[None] + dt * u
    return splat_linear(values, coords, spatial)


def interp_hessian_diagonal_image(I: jnp.ndarray, u: jnp.ndarray, dt: float = 1.0) -> jnp.ndarray:
    """Diagonal of the Hessian w.r.t. ``I`` of a sum-of-squares loss through
    ``interp``: for each output point, the squared interpolation weights are
    scatter-added at its (clamped) corner voxels.

    Reference: interp.cu:315-381 / interp.h:459-544.  The reference kernel is
    2D-only and accumulates every batch/channel into the first image's buffer
    (interp.cu:342 writes through the base pointer — a known defect noted in
    SURVEY.md §2.1); here the op is dimension-generic and returns the
    correctly batched result ``(N, C, *spatial)``.
    """
    dim = u.shape[1]
    spatial = u.shape[2:]
    N = u.shape[0]
    C = I.shape[1]
    grid = identity_grid(spatial, dtype=u.dtype)
    coords = grid[None] + dt * u  # (N, dim, *spatial)

    # splat w^2 per corner: like splat_linear but with squared weights.
    floor = jnp.floor(coords)
    frac = coords - floor
    floor = floor.astype(jnp.int32)

    strides = []
    s = 1
    for n in reversed(spatial):
        strides.append(s)
        s *= n
    strides = strides[::-1]
    nvox = s

    out = jnp.zeros((N, nvox), dtype=I.dtype)
    for corner in itertools.product((0, 1), repeat=dim):
        lin = jnp.zeros((N,) + tuple(spatial), dtype=jnp.int32)
        w = None
        for d in range(dim):
            idx = jnp.clip(floor[:, d] + corner[d], 0, spatial[d] - 1)
            lin = lin + idx * strides[d]
            wd = frac[:, d] if corner[d] else 1.0 - frac[:, d]
            w = wd if w is None else w * wd
        w2 = (w * w).reshape(N, -1)
        # per-batch scatter: offset linear indices by batch
        batch_off = (jnp.arange(N, dtype=jnp.int32) * nvox)[:, None]
        out = out.reshape(-1).at[(lin.reshape(N, -1) + batch_off).reshape(-1)].add(w2.reshape(-1)).reshape(N, nvox)
    H = out.reshape((N, 1) + tuple(spatial))
    return jnp.broadcast_to(H, (N, C) + tuple(spatial)).astype(I.dtype)
