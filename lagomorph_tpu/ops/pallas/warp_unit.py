"""Fused Pallas TPU kernel for the unit-displacement (tier-1) warp.

The tier-1 warp is a 27-tap data-dependent stencil:

    out(p) = sum_{o in {-1,0,1}^3}  w_o(disp(p)) * I[clamp(p + o)]

The XLA formulation (ops/sampling.py::sample_displacement_unit) materializes
a padded copy and streams 27 weighted slices through HBM; this kernel keeps
an x-slab of the padded volume in VMEM and fuses all taps and weights in one
pass — one read of I and disp, one write of out.

Forward only (used through a custom_vjp whose backward reuses the XLA
formulation); gated by shape/dtype checks with automatic fallback.
"""
from __future__ import annotations

import itertools
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except ImportError:  # pragma: no cover
    _HAVE_PALLAS = False

_OFFSETS = list(itertools.product((-1, 0, 1), repeat=3))

_ENABLED = True


def set_pallas_warp(enabled: bool):
    """Globally enable/disable the Pallas tier-1 warp fast path."""
    global _ENABLED
    prev = _ENABLED
    _ENABLED = bool(enabled)
    return prev


def pallas_warp_enabled() -> bool:
    if not (_ENABLED and _HAVE_PALLAS):
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def pallas_available() -> bool:
    return _HAVE_PALLAS


def _pick_block(X: int) -> int:
    for bx in (8, 16, 4, 2):
        if X % bx == 0:
            return bx
    return 0


def supported(I_shape, disp_shape, dtype) -> bool:
    """Shapes this kernel handles: 3D, f32, X divisible by a block size,
    and a 128-aligned flattened (Y*Z) lane extent (DMA tiling rule)."""
    if not pallas_warp_enabled():
        return False
    if dtype != jnp.float32:
        return False
    if len(disp_shape) != 5 or disp_shape[1] != 3:
        return False
    X, Y, Z = disp_shape[2:]
    if _pick_block(X) == 0:
        return False
    if (Y * Z) % 128 != 0:
        return False
    C = I_shape[1]
    bx = _pick_block(X)
    vmem = (C * (bx + 16) + 3 * bx + 4 * C * bx) * Y * Z * 4
    return vmem < 12 * 1024 * 1024


def _fwd_kernel(BX, Y, Z, C, Ipad_ref, disp_ref, out_ref, scratch, sem):
    """Fused 27-tap warp on one (n, x-block), with (Y, Z) flattened into a
    single 128-aligned lane axis.

    X taps come from the x-halo of the DMA'd slab (X is an untiled dim, so
    ±1 slices are legal).  Y taps are lane rolls by Z, Z taps lane rolls by
    1, each with a clamp edge-fix: at the clamped edge the tap value equals
    the unshifted value, so ``tap = where(edge, A, roll(A, -o))``.
    """
    xb = pl.program_id(1)
    n = pl.program_id(0)
    # aligned slab: padded rows [xb*BX, xb*BX + BX + 16); the output block
    # maps to slab-local rows [8, 8+BX)
    cp = pltpu.make_async_copy(
        Ipad_ref.at[n, :, pl.ds(xb * BX, BX + 16), :], scratch, sem
    )
    cp.start()
    d = disp_ref[0]  # (3, BX, Y*Z)
    f = jnp.floor(d)
    t = d - f
    is_m1 = (f == -1.0).astype(d.dtype)
    is_0 = (f == 0.0).astype(d.dtype)
    w = {
        -1: is_m1 * (1.0 - t),
        0: is_m1 * t + is_0 * (1.0 - t),
        1: is_0 * t,
    }
    cp.wait()

    YZ = Y * Z
    shape = (C, BX, YZ)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    y_idx = lane // Z
    z_idx = lane - y_idx * Z

    def roll_clamp(A, o, step, idx, n_axis):
        """Lane roll by o*step with clamp fix on the logical axis of size
        n_axis whose index along lanes is ``idx``."""
        if o == 0:
            return A
        rolled = pltpu.roll(A, (-o * step) % YZ, 2)
        edge = idx == (n_axis - 1 if o == 1 else 0)
        return jnp.where(edge, A, rolled)

    acc = jnp.zeros(shape, dtype=d.dtype)
    slab = scratch[...]
    for ox in (-1, 0, 1):
        # x-tap: sublane roll of the slab then an 8-aligned static slice
        # (the wrapped rows land outside the sliced window)
        rolled = pltpu.roll(slab, (-ox) % (BX + 16), 1) if ox != 0 else slab
        base = rolled[:, 8 : 8 + BX, :]
        wx = w[ox][0]
        for oy in (-1, 0, 1):
            xy = roll_clamp(base, oy, Z, y_idx, Y)
            wxy = wx * w[oy][1]
            for oz in (-1, 0, 1):
                tap = roll_clamp(xy, oz, 1, z_idx, Z)
                acc = acc + (wxy * w[oz][2])[None] * tap
    out_ref[0] = acc


def _warp_unit_fwd_pallas(Ipad, disp):
    """Ipad: (N, C, X+16, Y, Z) x-edge-padded; disp: (N, 3, X, Y, Z)."""
    N, C = Ipad.shape[:2]
    X, Y, Z = disp.shape[2:]
    BX = _pick_block(X)
    grid = (N, X // BX)
    kernel = partial(_fwd_kernel, BX, Y, Z, C)
    Ipad_f = Ipad.reshape(N, C, X + 16, Y * Z)
    disp_f = disp.reshape(N, 3, X, Y * Z)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, C, X, Y * Z), Ipad.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (1, 3, BX, Y * Z),
                lambda n, xb: (n, 0, xb, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, C, BX, Y * Z),
            lambda n, xb: (n, 0, xb, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((C, BX + 16, Y * Z), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(Ipad_f, disp_f)
    return out.reshape(N, C, X, Y, Z)


@jax.custom_vjp
def sample_displacement_unit_pallas(I, disp):
    """Pallas-accelerated tier-1 warp, numerically identical to
    :func:`lagomorph_tpu.ops.sampling.sample_displacement_unit`.

    I: (N or 1, C, X, Y, Z) float32; disp: (N, 3, X, Y, Z) with every
    component in [-1, 1)."""
    out, _ = _sdu_fwd(I, disp)
    return out


def _sdu_fwd(I, disp):
    N = disp.shape[0]
    Ib = jnp.broadcast_to(I, (N,) + I.shape[1:]) if I.shape[0] == 1 and N > 1 else I
    # pad X by 8 on each side so every DMA slab is sublane-aligned; Y/Z
    # taps are lane rolls with edge fixes
    Ipad = jnp.pad(Ib, [(0, 0), (0, 0), (8, 8), (0, 0), (0, 0)], mode="edge")
    out = _warp_unit_fwd_pallas(Ipad, disp)
    return out, (I, disp)


def _sdu_bwd(res, g):
    # backward via the XLA formulation's VJP (dense pad-transposes); shares
    # the exact discretization so gradients are identical
    from ..sampling import sample_displacement_unit

    I, disp = res
    _, vjp = jax.vjp(sample_displacement_unit, I, disp)
    return vjp(g)


sample_displacement_unit_pallas.defvjp(_sdu_fwd, _sdu_bwd)
