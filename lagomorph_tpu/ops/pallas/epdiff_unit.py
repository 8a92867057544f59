"""Fused Pallas kernel for the EPDiff momentum-transport step (``Ad^*``).

The hot loop of geodesic shooting computes, per integration step
(reference lddmm.py:39-44, adjrep.py:86-97):

    m_c(x) = sum_a (D_a phiinv_c(x) + delta_ca) * m0_a(x + phiinv(x))

i.e. a unit-displacement warp of ``m0`` (27-tap stencil, |phiinv| < 1)
contracted with the central-difference Jacobian of ``phiinv`` plus identity.
The unfused pipeline (ops/pallas/warp_unit.py kernel + XLA jtv) makes three
HBM round-trips over the fields; this kernel computes the whole contraction
in one VMEM pass: read phiinv + m0, write m.

Weights, taps, and difference stencils reproduce the exact discretization of
:func:`lagomorph_tpu.ops.sampling.sample_displacement_unit` and
:func:`lagomorph_tpu.ops.boundary.diff_central` (CLAMP boundary), so the op
is bit-identical to the composed XLA path in its regime.

Two variants (same selection rules as warp_unit):
 * whole-Y — (Y*Z) flattened into one lane axis, for Y*Z <= 8192;
 * y-blocked — lane windows with 1-voxel y halos, for Z % 128 == 0;
plus end-edge padding (warp_unit._pad_amounts) for all other shapes.

Backwards are fully fused one-pass kernels where a geometry applies
(_adstar_bwd_kernel[_yb], _compose_bwd_kernel[_yb]: both gradients computed
together with mw/J recomputed in VMEM — read 3 fields, write 2), falling
back to a composed backward (existing warp-bwd kernels + XLA jtv stencils)
outside those geometries (e.g. whole-Y volumes beyond the scoped-vmem
envelope).
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from . import warp_unit as wu

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except ImportError:  # pragma: no cover
    _HAVE_PALLAS = False


_ENABLED = True


def set_fused_adstar(enabled: bool):
    """Enable/disable the fused Ad* kernel (trace-time flag; retrace after
    changing it, like warp_unit.set_pallas_warp)."""
    global _ENABLED
    prev = _ENABLED
    _ENABLED = bool(enabled)
    return prev


def ad_star_supported(p_shape, m_shape, dtype) -> bool:
    """True when the fused kernel (directly or via end-edge padding) covers
    these shapes: 3D, f32, 3-channel phiinv and m0, equal batches."""
    if not (_ENABLED and _HAVE_PALLAS and wu.pallas_warp_enabled()):
        return False
    if dtype != jnp.float32:
        return False
    if len(p_shape) != 5 or p_shape[1] != 3:
        return False
    if len(m_shape) != 5 or m_shape[1] != 3:
        return False
    if m_shape[0] not in (1, p_shape[0]):
        return False
    if tuple(m_shape[2:]) != tuple(p_shape[2:]):
        return False
    # same geometry gates as the warp kernels (I := m0 with C=3), plus a
    # block assignment that fits the fused forwards' scoped-VMEM budget
    if not wu.fastpath_supported(m_shape, p_shape, dtype):
        return False
    X, Y, Z = p_shape[2:]
    if wu.supported(m_shape, p_shape, dtype):
        return True
    if wu.yblocked_supported(m_shape, p_shape, dtype):
        return _fwd_blocks(X, Y, Z) is not None
    amounts = wu._pad_amounts(X, Y, Z)
    if amounts is None:
        return False
    px, py, pz, whole_y = amounts
    return whole_y or _fwd_blocks(X + px, Y + py, Z + pz) is not None


def _weights(d, axis, o):
    """Per-axis tier-1 stencil weight at offset o from displacement block
    ``d`` of shape (3, ...): identical formula to warp_unit."""
    da = d[axis]
    fa = jnp.floor(da)
    ta = da - fa
    if o == -1:
        return (fa == -1.0).astype(da.dtype) * (1.0 - ta)
    if o == 0:
        return (fa == -1.0).astype(da.dtype) * ta + (fa == 0.0).astype(
            da.dtype
        ) * (1.0 - ta)
    return (fa == 0.0).astype(da.dtype) * ta


def _adjust_axis(W, a, lo, hi):
    """Fold the CLAMP of axis ``a`` into its per-axis weights: at the
    low/high domain edge the o=-1 / o=+1 tap lands on the edge voxel
    itself, so its weight moves into the o=0 tap and the shifted tap's
    weight becomes zero.  With adjusted weights every tap and transpose is
    a pure shift — wrapped-in garbage is multiplied by zero, and no clamp
    select (forward taps) or fold (transposes) is needed.  The identical
    grouping applies to the weight DERIVATIVES (the masks are constant).
    Used in the BACKWARD kernels only: the grouping reassociates the f32
    sum, and the forward keeps the original per-tap association for
    bit-exactness vs the XLA path."""
    return {
        (a, -1): jnp.where(lo, 0.0, W[(a, -1)]),
        (a, 0): W[(a, 0)]
        + jnp.where(lo, W[(a, -1)], 0.0)
        + jnp.where(hi, W[(a, 1)], 0.0),
        (a, 1): jnp.where(hi, 0.0, W[(a, 1)]),
    }


# Double-buffered slab DMA helpers (shared with warp_unit, where they are
# defined): see warp_unit._db_slabs for the pipelining story.
from .warp_unit import (  # noqa: F401,E402
    _db_slabs,
    _grid_linear_step,
    _yb_linear_step,
    set_pipeline_slabs,
)


# On the 8-row x-halo (investigated and closed in round 3): taps reach only
# +-1 but every kernel pads x by (8, 8).  This is FORCED by Mosaic's
# sublane alignment, not sloppiness: in-kernel row slices are free only at
# multiples of 8, so the center block must start at row 0 or 8; starting at
# 0 leaves no pre-halo, hence 8 — and the DMA width must be a multiple of
# 8, hence 8 post-halo too.  A 4-row-halo variant makes every center
# extraction a roll+slice (the weight slices alone run 81x per backward
# call), costing more than the 17-25%% window-compute saving.  Block-size
# tuning (bigger BX amortizing the fixed halo) is the effective lever and
# is encoded in the pickers below from measured sweeps.
# ---------------------------------------------------------------------------
# whole-Y variant: (Y, Z) flattened into one lane axis
# ---------------------------------------------------------------------------


def _adstar_fwd_kernel(BX, Y, Z, ppad_ref, mpad_ref, out_ref, p_slab, m_slab,
                       sems, mw_ref=None):
    YZ = Y * Z
    (n, xb), L, T, unravel = _grid_linear_step(2)

    def window(Lq):
        nq, xbq = unravel(Lq)
        return (nq, slice(None), pl.ds(xbq * BX, BX + 16), slice(None))

    slot = _db_slabs((ppad_ref, mpad_ref), (p_slab, m_slab), sems,
                     window, L, T)
    psl = p_slab[slot]  # (3, BX+16, YZ)
    msl = m_slab[slot]
    d = psl[:, 8 : 8 + BX, :]  # center block = weights source

    shape = (3, BX, YZ)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    y_idx = lane // Z
    z_idx = lane - y_idx * Z

    _em = {}

    def roll_clamp(A, o, step, idx, n_axis):
        """Lane roll by o*step with clamp fix (edge keeps the unshifted
        value) on the logical axis whose per-lane index is ``idx``."""
        if o == 0:
            return A
        rolled = pltpu.roll(A, (-o * step) % YZ, 2)
        k = (step, o > 0)
        if k not in _em:
            _em[k] = idx == (n_axis - 1 if o == 1 else 0)
        return jnp.where(_em[k], A, rolled)

    # fused 27-tap warp of m0 (per-axis weights hoisted: 9 computes, not 27)
    W = {(a, o): _weights(d, a, o) for a in range(3) for o in (-1, 0, 1)}
    mw = jnp.zeros(shape, dtype=d.dtype)
    for ox in (-1, 0, 1):
        rx = pltpu.roll(msl, (-ox) % (BX + 16), 1) if ox != 0 else msl
        base = rx[:, 8 : 8 + BX, :]
        wx = W[(0, ox)]
        for oy in (-1, 0, 1):
            xy = roll_clamp(base, oy, Z, y_idx, Y)
            wxy = wx * W[(1, oy)]
            for oz in (-1, 0, 1):
                tap = roll_clamp(xy, oz, 1, z_idx, Z)
                mw = mw + (wxy * W[(2, oz)]) * tap

    # Jacobian columns of phiinv: clamped central differences.  x uses the
    # edge-padded slab halo (uniform formula); y/z use clamp rolls, which at
    # the edge give a one-sided half-difference exactly like diff_central.
    xp = pltpu.roll(psl, (BX + 15) % (BX + 16), 1)[:, 8 : 8 + BX, :]
    xm = pltpu.roll(psl, 1, 1)[:, 8 : 8 + BX, :]
    Jx = 0.5 * (xp - xm)
    Jy = 0.5 * (roll_clamp(d, 1, Z, y_idx, Y) - roll_clamp(d, -1, Z, y_idx, Y))
    Jz = 0.5 * (roll_clamp(d, 1, 1, z_idx, Z) - roll_clamp(d, -1, 1, z_idx, Z))

    if mw_ref is not None:
        mw_ref[0] = mw
    out_ref[0] = mw + Jx * mw[0][None] + Jy * mw[1][None] + Jz * mw[2][None]


def _adstar_fwd_kernel_mw(BX, Y, Z, ppad_ref, mpad_ref, out_ref, mw_ref,
                          p_slab, m_slab, sems):
    _adstar_fwd_kernel(BX, Y, Z, ppad_ref, mpad_ref, out_ref, p_slab, m_slab,
                       sems, mw_ref=mw_ref)


def _adstar_fwd_wholey(ppad, mpad, X, Y, Z, want_mw=False):
    """ppad/mpad: (N, 3, X+16, Y*Z) x-edge-padded, flattened lanes.  With
    ``want_mw`` also returns the warped momentum (the fused warp's
    intermediate, saved as a VJP residual so the backward need not
    re-enumerate the 27-tap warp)."""
    N = ppad.shape[0]
    BX = wu._pick_block(X, Y * Z)
    ospec = pl.BlockSpec(
        (1, 3, BX, Y * Z),
        lambda n, xb: (n, 0, xb, 0),
        memory_space=pltpu.VMEM,
    )
    oshape = jax.ShapeDtypeStruct((N, 3, X, Y * Z), ppad.dtype)
    out = pl.pallas_call(
        partial(_adstar_fwd_kernel_mw if want_mw else _adstar_fwd_kernel,
                BX, Y, Z),
        out_shape=[oshape, oshape] if want_mw else oshape,
        grid=(N, X // BX),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[ospec, ospec] if want_mw else ospec,
        scratch_shapes=[
            pltpu.VMEM((2, 3, BX + 16, Y * Z), jnp.float32),
            pltpu.VMEM((2, 3, BX + 16, Y * Z), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )(ppad, mpad)
    if want_mw:
        out, mw = out
        return out.reshape(N, 3, X, Y, Z), mw.reshape(N, 3, X, Y, Z)
    return out.reshape(N, 3, X, Y, Z)


# ---------------------------------------------------------------------------
# y-blocked variant: lane windows with 1-voxel y halos (Z % 128 == 0)
# ---------------------------------------------------------------------------


def _adstar_yb_fwd_body(BX, BY, Y, Z, psl, msl, want_mw=False):
    """Shared y-blocked fused Ad* forward body on loaded slabs
    ``psl``/``msl`` of shape (3, BX+16, (BY+2)*Z); returns the (3, BX, BY*Z)
    output block — with ``want_mw``, ``(out, mw)`` where ``mw`` is the
    warped-momentum intermediate (saved as a VJP residual).  Used by both
    the standard (per-call padded) kernel and the padded-resident variant
    (ops/pallas/padres.py)."""
    WL = (BY + 2) * Z
    BL = BY * Z
    d = psl[:, 8 : 8 + BX, Z : Z + BL]  # center block (3, BX, BL)

    shape = (3, BX, BL)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    z_idx = lane % Z

    _em = {}

    def ztap(A, oz):
        if oz == 0:
            return A
        rolled = pltpu.roll(A, (-oz) % BL, 2)
        if oz not in _em:
            _em[oz] = z_idx == (Z - 1 if oz == 1 else 0)
        return jnp.where(_em[oz], A, rolled)

    W = {(a, o): _weights(d, a, o) for a in range(3) for o in (-1, 0, 1)}
    mw = jnp.zeros(shape, dtype=d.dtype)
    for ox in (-1, 0, 1):
        rx = pltpu.roll(msl, (-ox) % (BX + 16), 1) if ox != 0 else msl
        bx_rows = rx[:, 8 : 8 + BX, :]  # (3, BX, WL)
        wx = W[(0, ox)]
        for oy in (-1, 0, 1):
            ry = pltpu.roll(bx_rows, (-oy * Z) % WL, 2) if oy != 0 else bx_rows
            ctr = ry[:, :, Z : Z + BL]
            wxy = wx * W[(1, oy)]
            for oz in (-1, 0, 1):
                tap = ztap(ctr, oz)
                mw = mw + (wxy * W[(2, oz)]) * tap

    # Jacobian columns: x from the edge-padded slab halo, y from the
    # edge-padded window halo, z via clamp rolls
    xp = pltpu.roll(psl, (BX + 15) % (BX + 16), 1)[:, 8 : 8 + BX, Z : Z + BL]
    xm = pltpu.roll(psl, 1, 1)[:, 8 : 8 + BX, Z : Z + BL]
    Jx = 0.5 * (xp - xm)
    yp = pltpu.roll(psl, (WL - Z) % WL, 2)[:, 8 : 8 + BX, Z : Z + BL]
    ym = pltpu.roll(psl, Z, 2)[:, 8 : 8 + BX, Z : Z + BL]
    Jy = 0.5 * (yp - ym)
    Jz = 0.5 * (ztap(d, 1) - ztap(d, -1))

    out = mw + Jx * mw[0][None] + Jy * mw[1][None] + Jz * mw[2][None]
    return (out, mw) if want_mw else out


def _adstar_fwd_kernel_yb(BX, BY, Y, Z, ppad_ref, mpad_ref, out_ref,
                          p_slab, m_slab, sems, mw_ref=None):
    WL = (BY + 2) * Z
    BL = BY * Z
    n, xb, yb, L, T, ids = _yb_linear_step()

    def window(Lq):
        nq, xbq, ybq = ids(Lq)
        return (nq, slice(None), pl.ds(xbq * BX, BX + 16),
                pl.ds(ybq * BL, WL))

    slot = _db_slabs((ppad_ref, mpad_ref), (p_slab, m_slab), sems,
                     window, L, T)
    if mw_ref is None:
        out_ref[0] = _adstar_yb_fwd_body(BX, BY, Y, Z, p_slab[slot],
                                         m_slab[slot])
    else:
        out, mw = _adstar_yb_fwd_body(BX, BY, Y, Z, p_slab[slot],
                                      m_slab[slot], want_mw=True)
        out_ref[0] = out
        mw_ref[0] = mw


def _adstar_fwd_kernel_yb_mw(BX, BY, Y, Z, ppad_ref, mpad_ref, out_ref,
                             mw_ref, p_slab, m_slab, sems):
    _adstar_fwd_kernel_yb(BX, BY, Y, Z, ppad_ref, mpad_ref, out_ref,
                          p_slab, m_slab, sems, mw_ref=mw_ref)


def _fwd_blocks(X: int, Y: int, Z: int):
    """(BX, BY) for the fused y-blocked forwards, bounded so the slabs plus
    Mosaic temporaries fit scoped VMEM (~80 B per slab lane-row
    empirically: BX=16/BY=32 at Z=256 wanted 22.2M vs the 16M limit; +24 B
    for the second slot of the double-buffered slab pair)."""
    for bx in (16, 8):
        if X % bx:
            continue
        for by in (32, 16, 8, 4, 2):
            if Y % by or (by + 2) * Z > 10240:
                continue
            if (bx + 16) * (by + 2) * Z * 104 > 15 * 1024 * 1024:
                continue
            return bx, by
    return None


def _adstar_fwd_yb(ppad, mpad, X, Y, Z, want_mw=False):
    """ppad/mpad: (N, 3, X+16, (Y+2)*Z) x/y-edge-padded, flattened lanes."""
    N = ppad.shape[0]
    BX, BY = _fwd_blocks(X, Y, Z)
    BL = BY * Z
    ospec = pl.BlockSpec(
        (1, 3, BX, BL),
        lambda n, xb, yb: (n, 0, xb, yb),
        memory_space=pltpu.VMEM,
    )
    oshape = jax.ShapeDtypeStruct((N, 3, X, Y * Z), ppad.dtype)
    out = pl.pallas_call(
        partial(_adstar_fwd_kernel_yb_mw if want_mw else _adstar_fwd_kernel_yb,
                BX, BY, Y, Z),
        out_shape=[oshape, oshape] if want_mw else oshape,
        grid=(N, X // BX, Y // BY),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[ospec, ospec] if want_mw else ospec,
        scratch_shapes=[
            pltpu.VMEM((2, 3, BX + 16, (BY + 2) * Z), jnp.float32),
            pltpu.VMEM((2, 3, BX + 16, (BY + 2) * Z), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )(ppad, mpad)
    if want_mw:
        out, mw = out
        return out.reshape(N, 3, X, Y, Z), mw.reshape(N, 3, X, Y, Z)
    return out.reshape(N, 3, X, Y, Z)


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


@jax.custom_vjp
def ad_star_unit_pallas(phiinv, m0):
    """Fused ``Ad^*(phiinv, m0)`` for the unit-displacement regime
    (every component of ``phiinv`` in [-1, 1)); bit-identical to
    ``jtv(phiinv, warp(m0, phiinv), displacement=True)`` on the composed
    XLA/warp path."""
    N = phiinv.shape[0]
    m0b = (
        jnp.broadcast_to(m0, (N,) + m0.shape[1:])
        if m0.shape[0] == 1 and N > 1
        else m0
    )
    # primal (non-differentiating) call: skip the mw residual write
    return _adstar_fwd_dispatch(phiinv, m0b)


def _adstar_fwd_dispatch(phiinv, m0b, want_mw=False):
    """Run the fused forward on (N,3,X,Y,Z) inputs with matching batches,
    choosing whole-Y / y-blocked / padded geometry.  With ``want_mw``
    returns ``(out, mw)`` — the warped momentum residual consumed by the
    fused backward (so it need not re-enumerate the 27-tap warp)."""
    N = phiinv.shape[0]
    X, Y, Z = phiinv.shape[2:]
    shp = m0b.shape
    if wu.supported(shp, phiinv.shape, phiinv.dtype):
        ppad = jnp.pad(phiinv, [(0, 0), (0, 0), (8, 8), (0, 0), (0, 0)], mode="edge")
        mpad = jnp.pad(m0b, [(0, 0), (0, 0), (8, 8), (0, 0), (0, 0)], mode="edge")
        return _adstar_fwd_wholey(
            ppad.reshape(N, 3, X + 16, Y * Z),
            mpad.reshape(N, 3, X + 16, Y * Z),
            X, Y, Z, want_mw=want_mw,
        )
    if wu.yblocked_supported(shp, phiinv.shape, phiinv.dtype):
        widths = [(0, 0), (0, 0), (8, 8), (1, 1), (0, 0)]
        ppad = jnp.pad(phiinv, widths, mode="edge")
        mpad = jnp.pad(m0b, widths, mode="edge")
        return _adstar_fwd_yb(
            ppad.reshape(N, 3, X + 16, (Y + 2) * Z),
            mpad.reshape(N, 3, X + 16, (Y + 2) * Z),
            X, Y, Z, want_mw=want_mw,
        )
    # padded-coverage path (bit-exact; see warp_unit._pad_amounts)
    px, py, pz, _ = wu._pad_amounts(X, Y, Z)
    ppp, mpp = wu._pad_fields([phiinv, m0b], px, py, pz, "edge")
    outp = _adstar_fwd_dispatch(ppp, mpp, want_mw=want_mw)
    if want_mw:
        outp, mwp = outp
        return outp[:, :, :X, :Y, :Z], mwp[:, :, :X, :Y, :Z]
    return outp[:, :, :X, :Y, :Z]


def _adstar_fwd(phiinv, m0):
    N = phiinv.shape[0]
    m0b = (
        jnp.broadcast_to(m0, (N,) + m0.shape[1:])
        if m0.shape[0] == 1 and N > 1
        else m0
    )
    out, mw = _adstar_fwd_dispatch(phiinv, m0b, want_mw=True)
    return out, (phiinv, m0, mw)


def _adstar_bwd(res, g):
    """Composed backward (exact adjoints of the fused forward):

      d_mw   = (J + I)^T g               — jtv transpose (XLA stencils)
      d_m0   = warp-transpose of d_mw    — fused Pallas dI kernel
      d_p    = weight-gradient path       — fused Pallas dD kernel
             + sum_a D_a^T (g * mw_a)     — jtv adjoint (XLA stencils)

    The warped momentum ``mw`` arrives as a forward residual (round 4): the
    backward no longer re-enumerates the 27-tap warp (the largest VPU block
    of the round-3 fused kernel), and the composed fallback skips two warp
    forward executions (the explicit mw call + jax.vjp's fwd re-run)."""
    from ..diff import (
        jacobian_times_vectorfield,
        jacobian_times_vectorfield_adjoint,
    )

    phiinv, m0, mw = res
    N = phiinv.shape[0]
    broadcasting = m0.shape[0] == 1 and N > 1
    m0b = jnp.broadcast_to(m0, (N,) + m0.shape[1:]) if broadcasting else m0

    if _FUSED_BWD:
        fused = _adstar_bwd_fused_dispatch(phiinv, m0b, g, mw)
        if fused is not None:
            d_p, d_m0 = fused
            if broadcasting:
                d_m0 = jnp.sum(d_m0, axis=0, keepdims=True)
            return d_p, d_m0

    d_mw = jacobian_times_vectorfield(
        phiinv, g, displacement=True, transpose=True
    )
    # direct warp backward on the saved residuals (no forward re-execution)
    d_m0, d_p_w = wu._sdu_bwd((m0b, phiinv), d_mw)
    d_p = d_p_w + jacobian_times_vectorfield_adjoint(g, mw)
    if broadcasting:
        d_m0 = jnp.sum(d_m0, axis=0, keepdims=True)
    return d_p, d_m0


ad_star_unit_pallas.defvjp(_adstar_fwd, _adstar_bwd)


# ===========================================================================
# Fused composition step: out = s*v + phiinv(x + s*v(x))
# (deform.compose_disp_vel with dt=s — the second warp of each EPDiff
# substep, reference deform.py:58-62.)  Forward fuses the axpy and the
# weight computation into the warp pass; backward computes BOTH gradients in
# one pass (d_phiinv = warp transpose, d_v = s*(g + weight-gradient path)).
# ===========================================================================


def _dweights(d, axis, o):
    """d/d(disp) of the per-axis weight (same formula as warp_unit dw)."""
    da = d[axis]
    fa = jnp.floor(da)
    if o == -1:
        return -(fa == -1.0).astype(da.dtype)
    if o == 0:
        return (fa == -1.0).astype(da.dtype) - (fa == 0.0).astype(da.dtype)
    return (fa == 0.0).astype(da.dtype)


def _compose_fwd_kernel(BX, Y, Z, s, ppad_ref, v_ref, out_ref, p_slab, sems):
    """whole-Y: out = s*v + 27-tap warp of phiinv with weights from s*v."""
    YZ = Y * Z
    (n, xb), L, T, unravel = _grid_linear_step(2)

    def window(Lq):
        nq, xbq = unravel(Lq)
        return (nq, slice(None), pl.ds(xbq * BX, BX + 16), slice(None))

    slot = _db_slabs((ppad_ref,), (p_slab,), sems, window, L, T)
    v = v_ref[0]  # (3, BX, YZ)
    d = s * v

    shape = (3, BX, YZ)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    y_idx = lane // Z
    z_idx = lane - y_idx * Z

    _em = {}

    def roll_clamp(A, o, step, idx, n_axis):
        if o == 0:
            return A
        rolled = pltpu.roll(A, (-o * step) % YZ, 2)
        k = (step, o > 0)
        if k not in _em:
            _em[k] = idx == (n_axis - 1 if o == 1 else 0)
        return jnp.where(_em[k], A, rolled)

    psl = p_slab[slot]
    W = {(a, o): _weights(d, a, o) for a in range(3) for o in (-1, 0, 1)}
    acc = s * v
    for ox in (-1, 0, 1):
        rx = pltpu.roll(psl, (-ox) % (BX + 16), 1) if ox != 0 else psl
        base = rx[:, 8 : 8 + BX, :]
        wx = W[(0, ox)]
        for oy in (-1, 0, 1):
            xy = roll_clamp(base, oy, Z, y_idx, Y)
            wxy = wx * W[(1, oy)]
            for oz in (-1, 0, 1):
                tap = roll_clamp(xy, oz, 1, z_idx, Z)
                acc = acc + (wxy * W[(2, oz)]) * tap
    out_ref[0] = acc


def _compose_yb_fwd_body(BX, BY, Y, Z, s, psl, v):
    """Shared y-blocked fused composition forward body: ``psl`` is the
    (3, BX+16, (BY+2)*Z) phiinv slab, ``v`` the (3, BX, BY*Z) velocity
    block; returns the (3, BX, BY*Z) output block."""
    WL = (BY + 2) * Z
    BL = BY * Z
    d = s * v

    shape = (3, BX, BL)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    z_idx = lane % Z

    _em = {}

    def ztap(A, oz):
        if oz == 0:
            return A
        rolled = pltpu.roll(A, (-oz) % BL, 2)
        if oz not in _em:
            _em[oz] = z_idx == (Z - 1 if oz == 1 else 0)
        return jnp.where(_em[oz], A, rolled)

    W = {(a, o): _weights(d, a, o) for a in range(3) for o in (-1, 0, 1)}
    acc = s * v
    for ox in (-1, 0, 1):
        rx = pltpu.roll(psl, (-ox) % (BX + 16), 1) if ox != 0 else psl
        bx_rows = rx[:, 8 : 8 + BX, :]
        wx = W[(0, ox)]
        for oy in (-1, 0, 1):
            ry = pltpu.roll(bx_rows, (-oy * Z) % WL, 2) if oy != 0 else bx_rows
            ctr = ry[:, :, Z : Z + BL]
            wxy = wx * W[(1, oy)]
            for oz in (-1, 0, 1):
                tap = ztap(ctr, oz)
                acc = acc + (wxy * W[(2, oz)]) * tap
    return acc


def _compose_fwd_kernel_yb(BX, BY, Y, Z, s, ppad_ref, v_ref, out_ref,
                           p_slab, sems):
    """y-blocked variant of the fused composition forward."""
    WL = (BY + 2) * Z
    BL = BY * Z
    n, xb, yb, L, T, ids = _yb_linear_step()

    def window(Lq):
        nq, xbq, ybq = ids(Lq)
        return (nq, slice(None), pl.ds(xbq * BX, BX + 16),
                pl.ds(ybq * BL, WL))

    slot = _db_slabs((ppad_ref,), (p_slab,), sems, window, L, T)
    out_ref[0] = _compose_yb_fwd_body(BX, BY, Y, Z, s, p_slab[slot], v_ref[0])


def _compose_fwd_dispatch(phiinv, v, s):
    N = phiinv.shape[0]
    X, Y, Z = phiinv.shape[2:]
    shp = phiinv.shape
    if wu.supported(shp, v.shape, v.dtype):
        ppad = jnp.pad(phiinv, [(0, 0), (0, 0), (8, 8), (0, 0), (0, 0)], mode="edge")
        BX = wu._pick_block(X, Y * Z)
        out = pl.pallas_call(
            partial(_compose_fwd_kernel, BX, Y, Z, s),
            out_shape=jax.ShapeDtypeStruct((N, 3, X, Y * Z), phiinv.dtype),
            grid=(N, X // BX),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(
                    (1, 3, BX, Y * Z),
                    lambda n, xb: (n, 0, xb, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 3, BX, Y * Z),
                lambda n, xb: (n, 0, xb, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, 3, BX + 16, Y * Z), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 1)),
            ],
        )(
            ppad.reshape(N, 3, X + 16, Y * Z),
            v.reshape(N, 3, X, Y * Z),
        )
        return out.reshape(N, 3, X, Y, Z)
    if wu.yblocked_supported(shp, v.shape, v.dtype):
        ppad = jnp.pad(
            phiinv, [(0, 0), (0, 0), (8, 8), (1, 1), (0, 0)], mode="edge"
        )
        BX, BY = _fwd_blocks(X, Y, Z)
        BL = BY * Z
        out = pl.pallas_call(
            partial(_compose_fwd_kernel_yb, BX, BY, Y, Z, s),
            out_shape=jax.ShapeDtypeStruct((N, 3, X, Y * Z), phiinv.dtype),
            grid=(N, X // BX, Y // BY),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(
                    (1, 3, BX, BL),
                    lambda n, xb, yb: (n, 0, xb, yb),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 3, BX, BL),
                lambda n, xb, yb: (n, 0, xb, yb),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, 3, BX + 16, (BY + 2) * Z), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 1)),
            ],
        )(
            ppad.reshape(N, 3, X + 16, (Y + 2) * Z),
            v.reshape(N, 3, X, Y * Z),
        )
        return out.reshape(N, 3, X, Y, Z)
    # padded-coverage path
    px, py, pz, _ = wu._pad_amounts(X, Y, Z)
    ppp, vpp = wu._pad_fields([phiinv, v], px, py, pz, "edge")
    return _compose_fwd_dispatch(ppp, vpp, s)[:, :, :X, :Y, :Z]


def compose_supported(p_shape, v_shape, dtype) -> bool:
    """Gate for the fused composition: same geometry rules as Ad*."""
    return ad_star_supported(p_shape, v_shape, dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def compose_disp_vel_pallas(phiinv, v, s):
    """Fused ``s*v(x) + phiinv(x + s*v(x))`` for |s*v| < 1 (one Euler
    sub-step of a stable EPDiff integration); bit-identical to
    ``s*v + warp(phiinv; s*v)`` on the composed path."""
    out, _ = _compose_fwd(phiinv, v, s)
    return out


def _compose_fwd(phiinv, v, s):
    return _compose_fwd_dispatch(phiinv, v, s), (phiinv, v)


def _compose_bwd(s, res, g):
    """d_phiinv = warp-transpose of g at weights(s*v);
    d_v = s*g + s * (weight-gradient path) — fully fused when a kernel
    geometry applies, else via the existing fused warp backward kernels on
    the effective displacement s*v."""
    phiinv, v = res
    if _FUSED_BWD:
        fused = _compose_bwd_fused_dispatch(phiinv, v, s, g)
        if fused is not None:
            return fused
    d_eff = s * v
    _, warp_vjp = jax.vjp(wu.sample_displacement_unit_pallas, phiinv, d_eff)
    d_p, d_deff = warp_vjp(g)
    d_v = s * g + s * d_deff
    return d_p, d_v


compose_disp_vel_pallas.defvjp(_compose_fwd, _compose_bwd)


# ===========================================================================
# Fully fused backward kernels.
#
# Ad* backward: given the cotangent g of m = (Dp + I) (m0 o (id+p)), one
# VMEM pass computes BOTH gradients (math in _adstar_bwd's docstring):
#
#   d_mw  = (J + I)^T g                      (pointwise contraction)
#   d_m0  = warp-transpose of (W * d_mw)     (shift-transposes + clamp folds)
#   d_p   = weight-gradient path (dW * <d_mw, m0-taps>)
#         + divergence path sum_a D_a^T (g * mw_a)
#
# where mw and J are recomputed in VMEM from the slabs (no residuals).
# Traffic: read p, m0, g; write d_p, d_m0 — 5 field volumes vs ~16 for the
# composed backward.  D_a^T is the exact transpose of the clamped central
# difference (ops/boundary.py::diff_central_adjoint):
#   row 0:    -0.5*(q[0] + q[1])
#   interior:  0.5*(q[i-1] - q[i+1])
#   row n-1:   0.5*(q[n-1] + q[n-2])
# implemented as 0.5*(select(i==0, -q, q[i-1]) - select(i==n-1, -q, q[i+1])).
# ===========================================================================


def _adstar_bwd_kernel(BX, Y, Z, X, ppad_ref, mpad_ref, gpad_ref, mwpad_ref,
                       dp_ref, dm_ref, p_slab, m_slab, g_slab, mw_slab, sems):
    """whole-Y fused Ad* backward (one (n, x-block) per grid step).  The
    warped momentum arrives as a forward residual (``mwpad_ref``): the
    27-tap warp re-enumeration that dominated the round-3 kernel's VPU time
    and scoped-vmem live set is gone.  Slab-double-buffered (round 4, under
    the raised vmem limit)."""
    (n, xb), L, T, ids = _grid_linear_step(2)
    YZ = Y * Z
    BXW = BX + 16

    def window(Lq):
        nq, xbq = ids(Lq)
        return (nq, slice(None), pl.ds(xbq * BX, BXW), slice(None))

    slot = _db_slabs(
        (ppad_ref, mpad_ref, gpad_ref, mwpad_ref),
        (p_slab, m_slab, g_slab, mw_slab), sems, window, L, T,
    )

    psl = p_slab[slot]  # (3, BXW, YZ) edge-padded
    msl = m_slab[slot]  # edge-padded
    gsl = g_slab[slot]  # zero-padded
    mwsl = mw_slab[slot]  # zero-padded (domain-edge taps are masked)

    shape_w = (3, BXW, YZ)
    lane_w = jax.lax.broadcasted_iota(jnp.int32, shape_w, 2)
    y_w = lane_w // Z
    z_w = lane_w - y_w * Z
    shape_c = (3, BX, YZ)
    lane_c = jax.lax.broadcasted_iota(jnp.int32, shape_c, 2)
    y_c = lane_c // Z
    z_c = lane_c - y_c * Z
    row_c = jax.lax.broadcasted_iota(jnp.int32, shape_c, 1)
    gx_c = row_c + xb * BX

    _emw = {}

    def roll_clamp_w(A, o, step, idx, n_axis):
        if o == 0:
            return A
        rolled = pltpu.roll(A, (-o * step) % YZ, 2)
        k = (step, o > 0)
        if k not in _emw:
            _emw[k] = idx == (n_axis - 1 if o == 1 else 0)
        return jnp.where(_emw[k], A, rolled)

    # per-axis weights at all window rows, hoisted (9 computes, not 81),
    # with the CLAMP folded in once (_adjust_axis): every tap and transpose
    # below is a pure roll — wrapped-in garbage is multiplied by zero
    # (roll_clamp_w remains only for the Jacobian's clamped differences)
    row_w2 = jax.lax.broadcasted_iota(jnp.int32, (BXW, YZ), 0)
    lane_w2 = jax.lax.broadcasted_iota(jnp.int32, (BXW, YZ), 1)
    gx_w2 = xb * BX + row_w2 - 8
    y_w2 = lane_w2 // Z
    z_w2 = lane_w2 - y_w2 * Z
    Ww = {(a, o): _weights(psl, a, o) for a in range(3) for o in (-1, 0, 1)}
    Ww.update(_adjust_axis(Ww, 0, gx_w2 == 0, gx_w2 == X - 1))
    Ww.update(_adjust_axis(Ww, 1, y_w2 == 0, y_w2 == Y - 1))
    Ww.update(_adjust_axis(Ww, 2, z_w2 == 0, z_w2 == Z - 1))

    # one-sided-difference masks for the divergence path (NOT clamp folds —
    # the transposes below are fold-free thanks to the adjusted weights)
    x_lo, x_hi = gx_c == 0, gx_c == X - 1
    y_lo, y_hi = y_c == 0, y_c == Y - 1
    z_lo, z_hi = z_c == 0, z_c == Z - 1

    # d_p, divergence path: sum_a D_a^T (g * mw_a) per channel, from the
    # RESIDUAL mw (computed immediately so mwsl can be released before the
    # transpose/weight-gradient loop)
    div = jnp.zeros(shape_c, dtype=psl.dtype)
    for a, (step, first, last) in enumerate(
        ((None, x_lo, x_hi), (Z, y_lo, y_hi), (1, z_lo, z_hi))
    ):
        q = gsl * mwsl[a][None]
        qc = q[:, 8 : 8 + BX, :]
        if a == 0:
            qm = pltpu.roll(q, 1, 1)[:, 8 : 8 + BX, :]
            qp = pltpu.roll(q, BXW - 1, 1)[:, 8 : 8 + BX, :]
        else:
            qm = pltpu.roll(qc, step % YZ, 2)
            qp = pltpu.roll(qc, (-step) % YZ, 2)
        div = div + 0.5 * (
            jnp.where(first, -qc, qm) - jnp.where(last, -qc, qp)
        )
    del mwsl

    # Jacobian columns at all window rows (x from the slab halo)
    xp = pltpu.roll(psl, BXW - 1, 1)
    xm = pltpu.roll(psl, 1, 1)
    Jx = 0.5 * (xp - xm)
    Jy = 0.5 * (
        roll_clamp_w(psl, 1, Z, y_w, Y) - roll_clamp_w(psl, -1, Z, y_w, Y)
    )
    Jz = 0.5 * (
        roll_clamp_w(psl, 1, 1, z_w, Z) - roll_clamp_w(psl, -1, 1, z_w, Z)
    )

    # d_mw_a = sum_c g_c J_ca + g_a   (J_ca = D_a p_c)
    d_mw = jnp.stack(
        [
            gsl[0] * Jx[0] + gsl[1] * Jx[1] + gsl[2] * Jx[2] + gsl[0],
            gsl[0] * Jy[0] + gsl[1] * Jy[1] + gsl[2] * Jy[2] + gsl[1],
            gsl[0] * Jz[0] + gsl[1] * Jz[1] + gsl[2] * Jz[2] + gsl[2],
        ],
        axis=0,
    )

    # center weights/dweights, hoisted and clamp-adjusted like the window's
    dctr = psl[:, 8 : 8 + BX, :]
    d_mw_c = d_mw[:, 8 : 8 + BX, :]
    row_c2 = jax.lax.broadcasted_iota(jnp.int32, (BX, YZ), 0)
    lane_c2 = jax.lax.broadcasted_iota(jnp.int32, (BX, YZ), 1)
    gx_c2 = xb * BX + row_c2
    y_c2 = lane_c2 // Z
    z_c2 = lane_c2 - y_c2 * Z
    Wc = {(a, o): _weights(dctr, a, o) for a in range(3) for o in (-1, 0, 1)}
    dWc = {(a, o): _dweights(dctr, a, o) for a in range(3) for o in (-1, 0, 1)}
    for d_, lo, hi in ((0, gx_c2 == 0, gx_c2 == X - 1),
                       (1, y_c2 == 0, y_c2 == Y - 1),
                       (2, z_c2 == 0, z_c2 == Z - 1)):
        Wc.update(_adjust_axis(Wc, d_, lo, hi))
        dWc.update(_adjust_axis(dWc, d_, lo, hi))

    # Merged 27-offset loop: d_m0 (transpose of the weighted warp — x per
    # tap as a pure window roll, y per tap as a pure center roll, z
    # factored over the offset sum) and the d_p weight-gradient path
    # (center taps reuse the same m-slab rolls; (ox, oy) weight factors
    # multiply once per group via the (s_w, s_dw) z-accumulators)
    accz = {oz: jnp.zeros(shape_c, dtype=psl.dtype) for oz in (-1, 0, 1)}
    acc0 = jnp.zeros((BX, YZ), dtype=psl.dtype)
    acc1 = jnp.zeros((BX, YZ), dtype=psl.dtype)
    acc2 = jnp.zeros((BX, YZ), dtype=psl.dtype)
    for ox in (-1, 0, 1):
        wx = Ww[(0, ox)]
        base = (
            pltpu.roll(msl, (-ox) % BXW, 1)[:, 8 : 8 + BX, :]
            if ox != 0
            else msl[:, 8 : 8 + BX, :]
        )
        for oy in (-1, 0, 1):
            wxy = wx * Ww[(1, oy)]
            xy = pltpu.roll(base, (-oy * Z) % YZ, 2) if oy != 0 else base
            a_xy = dWc[(0, ox)] * Wc[(1, oy)]
            b_xy = Wc[(0, ox)] * dWc[(1, oy)]
            c_xy = Wc[(0, ox)] * Wc[(1, oy)]
            s_w = jnp.zeros((BX, YZ), dtype=psl.dtype)
            s_dw = jnp.zeros((BX, YZ), dtype=psl.dtype)
            for oz in (-1, 0, 1):
                # d_m0 piece: x then y transposes as pure rolls
                P = (wxy * Ww[(2, oz)]) * d_mw
                Pr = pltpu.roll(P, ox % BXW, 1) if ox != 0 else P
                A = Pr[:, 8 : 8 + BX, :]
                if oy != 0:
                    A = pltpu.roll(A, (oy * Z) % YZ, 2)
                accz[oz] = accz[oz] + A
                # weight-gradient piece
                tap = pltpu.roll(xy, (-oz) % YZ, 2) if oz != 0 else xy
                gt = (
                    d_mw_c[0] * tap[0]
                    + d_mw_c[1] * tap[1]
                    + d_mw_c[2] * tap[2]
                )
                s_w = s_w + Wc[(2, oz)] * gt
                s_dw = s_dw + dWc[(2, oz)] * gt
            acc0 = acc0 + a_xy * s_w
            acc1 = acc1 + b_xy * s_w
            acc2 = acc2 + c_xy * s_dw

    acc_dm = accz[0]
    for oz in (-1, 1):
        acc_dm = acc_dm + pltpu.roll(accz[oz], oz % YZ, 2)
    dm_ref[0] = acc_dm

    dp_ref[0] = div + jnp.stack([acc0, acc1, acc2], axis=0)


# Pre-roll level of the yb backwards' 27-offset loops (bit-exact
# restructures, see the loop comments): 0 = per-tap rolls, 1 = z taps
# pre-rolled per ox, 2 = + x-transpose rolled into the factors.  Measured
# at 128^3 b4 (scripts/bwd_sweep.py preroll/cpreroll): the heavier Ad*
# kernel wants level 1 (7.22/6.85/7.07 ms for 0/1/2 — level 2's extra
# pre-rolled live arrays hit the VMEM pressure cliff), the leaner compose
# kernel wants level 0 (3.86/4.53/4.41).  Level 3 (select-tree d_p) ties
# level 1 — the kernel is ROLL-bound, not mult-bound — and level 4
# (select tree + box-deferred x-transpose, 18 rolls -> 9) wins outright:
# 7.12 (lvl 1) vs 5.85 ms (lvl 4) same-run.  Env overrides for sweeps.
_BWD_PREROLL_ADSTAR = int(os.environ.get("LAGO_BWD_PREROLL", "4"))
_BWD_PREROLL_COMPOSE = int(os.environ.get("LAGO_BWD_PREROLL_COMPOSE", "0"))
# Measurement-only switch for scripts/bwd_split_probe.py: "dp" skips the
# d_m0 transpose work, "dm" skips the d_p weight-gradient/divergence work.
# NEVER set in production — outputs are wrong by design.
_BWD_PROBE = os.environ.get("LAGO_BWD_PROBE", "")


def _adstar_yb_bwd_body(BX, BY, Y, Z, X, xb, yb, psl, msl, gsl, mwsl,
                        emit_dm):
    """Shared y-blocked fused Ad* backward body.  ``psl`` (edge-padded) has
    the 2-halo window shape (3, BX+16, (BY+4)*Z); ``msl`` (edge-padded),
    ``gsl`` and ``mwsl`` (zero-padded) carry the 1-halo window
    (3, BX+16, (BY+2)*Z).  ``xb``/``yb`` are the block indices (for the
    global-index clamp masks).

    The warped momentum ``mwsl`` is a FORWARD RESIDUAL (round 4): the
    27-tap warp re-enumeration at subwindow extent — the largest VPU block
    of the round-3 kernel — is gone, and the remaining m0 taps shrink to
    center (BL) extent.  Calls ``emit_dm(d_m0_block)`` as soon as d_m0 is
    final and returns the d_p center block (3, BX, BY*Z)."""
    BXW = BX + 16
    SL = (BY + 2) * Z   # subwindow lanes (1-halo)
    BL = BY * Z

    psub = psl[:, :, Z : Z + SL]
    gsub = gsl

    shape_s = (3, BXW, SL)
    lane_s = jax.lax.broadcasted_iota(jnp.int32, shape_s, 2)
    z_s = lane_s % Z
    shape_c = (3, BX, BL)
    lane_cb = jax.lax.broadcasted_iota(jnp.int32, shape_c, 2)
    z_c = lane_cb % Z
    gy_c = yb * BY + lane_cb // Z
    row_c = jax.lax.broadcasted_iota(jnp.int32, shape_c, 1)
    gx_c = row_c + xb * BX

    _ems = {}

    def ztap_s(A, oz):
        if oz == 0:
            return A
        rolled = pltpu.roll(A, (-oz) % SL, 2)
        if oz not in _ems:
            _ems[oz] = z_s == (Z - 1 if oz == 1 else 0)
        return jnp.where(_ems[oz], A, rolled)

    # Jacobian columns on the subwindow
    xp = pltpu.roll(psl, BXW - 1, 1)[:, :, Z : Z + SL]
    xm = pltpu.roll(psl, 1, 1)[:, :, Z : Z + SL]
    Jx = 0.5 * (xp - xm)
    Jy = 0.5 * (psl[:, :, 2 * Z : 2 * Z + SL] - psl[:, :, 0:SL])
    Jz = 0.5 * (ztap_s(psub, 1) - ztap_s(psub, -1))

    # d_mw depends only on J and g; needed at the subwindow for the d_m0
    # transpose (its y/x shifts read center +-1)
    d_mw = jnp.stack(
        [
            gsub[0] * Jx[0] + gsub[1] * Jx[1] + gsub[2] * Jx[2] + gsub[0],
            gsub[0] * Jy[0] + gsub[1] * Jy[1] + gsub[2] * Jy[2] + gsub[1],
            gsub[0] * Jz[0] + gsub[1] * Jz[1] + gsub[2] * Jz[2] + gsub[2],
        ],
        axis=0,
    )
    d_mw_c = d_mw[:, 8 : 8 + BX, Z : Z + BL]
    pcen = psl[:, 8 : 8 + BX, 2 * Z : 2 * Z + BL]

    def dwc(axis, o):
        return _dweights(pcen, axis, o)

    def cslice2(w):  # (BXW, SL) weight -> its center block (BX, BL)
        return w[8 : 8 + BX, Z : Z + BL]

    # hoisted per-axis weights (window + center slices + dweights), with
    # the CLAMP folded in once (_adjust_axis): every tap is a pure
    # roll/slice and every transpose a pure roll/slice — no per-tap selects
    # or per-transpose folds
    row_s = jax.lax.broadcasted_iota(jnp.int32, (BXW, SL), 0)
    lane_s2 = jax.lax.broadcasted_iota(jnp.int32, (BXW, SL), 1)
    gx_s = xb * BX + row_s - 8
    gy_s = yb * BY + lane_s2 // Z - 1
    z_s2 = lane_s2 % Z
    Ws = {(a, o): _weights(psub, a, o) for a in range(3) for o in (-1, 0, 1)}
    Ws.update(_adjust_axis(Ws, 0, gx_s == 0, gx_s == X - 1))
    Ws.update(_adjust_axis(Ws, 1, gy_s == 0, gy_s == Y - 1))
    Ws.update(_adjust_axis(Ws, 2, z_s2 == 0, z_s2 == Z - 1))
    # center masks from FRESH center-shaped iotas: slicing a single-axis
    # (broadcast-layout) mask crashes Mosaic's extract_strided_slice
    row_c2 = jax.lax.broadcasted_iota(jnp.int32, (BX, BL), 0)
    lane_c2 = jax.lax.broadcasted_iota(jnp.int32, (BX, BL), 1)
    gx_c2 = xb * BX + row_c2
    gy_c2 = yb * BY + lane_c2 // Z
    z_c2 = lane_c2 % Z
    if _BWD_PREROLL_ADSTAR < 3:
        # 27-tap weight-gradient path: per-offset weights + derivatives at
        # the center, clamp folded in once
        Wc = {k: cslice2(w) for k, w in Ws.items()}
        dWc = {(a, o): dwc(a, o) for a in range(3) for o in (-1, 0, 1)}
        dWc.update(_adjust_axis(dWc, 0, gx_c2 == 0, gx_c2 == X - 1))
        dWc.update(_adjust_axis(dWc, 1, gy_c2 == 0, gy_c2 == Y - 1))
        dWc.update(_adjust_axis(dWc, 2, z_c2 == 0, z_c2 == Z - 1))

    acc0 = jnp.zeros((BX, BL), dtype=psl.dtype)
    acc1 = jnp.zeros((BX, BL), dtype=psl.dtype)
    acc2 = jnp.zeros((BX, BL), dtype=psl.dtype)
    # d_m0 accumulators: three (3, BX, BL) per-oz accumulators stay live
    # across the whole loop (the z transpose factors over the offset sum)
    accz = {oz: jnp.zeros(shape_c, dtype=psl.dtype) for oz in (-1, 0, 1)}
    # Merged 27-offset loop computing the d_p weight-gradient path and the
    # d_m0 transpose.  With mw external, the m0 taps shrink to CENTER (BL)
    # extent.  Bit-exact pre-roll restructures (_BWD_PREROLL_ADSTAR) hoist the
    # per-tap rolls out of the 27-iteration loop:
    #   >=1: the m0 z taps are pre-rolled once per ox at SL extent (the
    #        wrap-in lands on z-edge lanes where the adjusted (2, oz)
    #        weights are zero, exactly as the per-tap BL roll's did), so
    #        every tap is a pure aligned lane slice;
    #   >=2: the d_m0 x transpose distributes over the P product —
    #        roll(P, ox)[8:8+BX] == P[8-ox : 8-ox+BX] element-for-element —
    #        so each FACTOR is rolled once per (ox, ·) and sliced at the
    #        aligned center rows, dropping the per-tap work to two
    #        center-extent multiplies plus the accz add.
    #   ==3: the d_p weight-gradient path exploits that |phiinv| < 1 means
    #        floor in {-1, 0} per axis — only 8 of the 27 taps are active
    #        per voxel.  The per-tap contractions gq = <d_mw, tap> are
    #        still enumerated (they cost the same either way), but the
    #        weight/derivative machinery collapses: a 3-level floor-mask
    #        SELECT TREE picks each axis's two active gq values, weights
    #        become (1-t, t), and derivative factors become +-1 signs —
    #        no per-offset center weights, weight derivatives, or clamp
    #        adjusts.  Domain clamps come free: at a clamped face the
    #        select keeps the unshifted (edge) value for both active taps,
    #        so the derivative contribution cancels to an exact zero,
    #        reproducing the adjusted-weight fold (reference interp.h
    #        floor-then-clamp corners).  The d_m0 transpose stays on the
    #        27-offset enumeration (a select-tree adjoint was counted and
    #        loses: per-node mask mults outweigh the tap savings).
    #        Results equal the <3 modes to f32 roundoff (the sums
    #        reassociate), not bitwise.
    gq = {}
    for ox in (-1, 0, 1):
        xt = pltpu.roll(msl, (-ox) % BXW, 1) if ox != 0 else msl
        if _BWD_PREROLL_ADSTAR >= 1:
            xt_c = xt[:, 8 : 8 + BX, :]
            xtz = {0: xt_c}
            for oz in (-1, 1):
                xtz[oz] = pltpu.roll(xt_c, (-oz) % SL, 2)
        if _BWD_PREROLL_ADSTAR >= 3:
            # >=4: the kernel is ROLL-bound, not mult-bound (levels 2/3
            # moved hundreds of mult-units for ~0: bwd_sweep r4) — defer
            # the P path's x-transpose to ONE window roll per (ox, oz)
            # via compose-style box accumulators (18 rolls -> 9), paid
            # for with window-extent adds; the Wc/dWc arrays dropped by
            # level 3 make the VMEM room.
            if _BWD_PREROLL_ADSTAR >= 4:
                box = {
                    oz: jnp.zeros((3, BXW, BL), dtype=psl.dtype)
                    for oz in (-1, 0, 1)
                }
            for oy in (-1, 0, 1):
                yoff = (1 + oy) * Z
                off = (1 - oy) * Z
                dmw_t = d_mw[:, :, off : off + BL]
                wxy_t = (
                    Ws[(0, ox)][:, off : off + BL]
                    * Ws[(1, oy)][:, off : off + BL]
                )
                for oz in (-1, 0, 1):
                    if _BWD_PROBE != "dm":
                        tc = xtz[oz][:, :, yoff : yoff + BL]
                        gq[(ox, oy, oz)] = (
                            d_mw_c[0] * tc[0]
                            + d_mw_c[1] * tc[1]
                            + d_mw_c[2] * tc[2]
                        )
                    if _BWD_PROBE == "dp":
                        continue
                    P = (wxy_t * Ws[(2, oz)][:, off : off + BL]) * dmw_t
                    if _BWD_PREROLL_ADSTAR >= 4:
                        box[oz] = box[oz] + P
                    else:
                        Pr = pltpu.roll(P, ox % BXW, 1) if ox != 0 else P
                        accz[oz] = accz[oz] + Pr[:, 8 : 8 + BX, :]
            if _BWD_PREROLL_ADSTAR >= 4:
                for oz in (-1, 0, 1):
                    Bz = box[oz]
                    Pr = pltpu.roll(Bz, ox % BXW, 1) if ox != 0 else Bz
                    accz[oz] = accz[oz] + Pr[:, 8 : 8 + BX, :]
            continue
        if _BWD_PREROLL_ADSTAR >= 2:
            dmw_rc = (pltpu.roll(d_mw, ox % BXW, 1) if ox != 0 else d_mw)[
                :, 8 : 8 + BX, :
            ]
            wsz_rc = {
                oz: (
                    pltpu.roll(Ws[(2, oz)], ox % BXW, 0)
                    if ox != 0
                    else Ws[(2, oz)]
                )[8 : 8 + BX, :]
                for oz in (-1, 0, 1)
            }
        for oy in (-1, 0, 1):
            yoff = (1 + oy) * Z
            if _BWD_PREROLL_ADSTAR < 1:
                ytap = xt[:, 8 : 8 + BX, yoff : yoff + BL]
            a_xy = dWc[(0, ox)] * Wc[(1, oy)]
            b_xy = Wc[(0, ox)] * dWc[(1, oy)]
            c_xy = Wc[(0, ox)] * Wc[(1, oy)]
            s_w = jnp.zeros((BX, BL), dtype=psl.dtype)
            s_dw = jnp.zeros((BX, BL), dtype=psl.dtype)
            # d_m0 transpose: the y-transpose slice of every factor is taken
            # BEFORE the multiply/roll (identical values — pure element
            # selection), so the P product runs on BL lanes instead of SL
            off = (1 - oy) * Z
            if _BWD_PREROLL_ADSTAR >= 2:
                wxy = Ws[(0, ox)] * Ws[(1, oy)]
                wxy_rc = (pltpu.roll(wxy, ox % BXW, 0) if ox != 0 else wxy)[
                    8 : 8 + BX, off : off + BL
                ]
                dmw_t = dmw_rc[:, :, off : off + BL]
            else:
                dmw_t = d_mw[:, :, off : off + BL]
                wxy_t = (
                    Ws[(0, ox)][:, off : off + BL]
                    * Ws[(1, oy)][:, off : off + BL]
                )
            for oz in (-1, 0, 1):
                if _BWD_PREROLL_ADSTAR >= 1:
                    tc = xtz[oz][:, :, yoff : yoff + BL]
                else:
                    tc = (
                        pltpu.roll(ytap, (-oz) % BL, 2) if oz != 0 else ytap
                    )
                gt = (
                    d_mw_c[0] * tc[0]
                    + d_mw_c[1] * tc[1]
                    + d_mw_c[2] * tc[2]
                )
                s_w = s_w + Wc[(2, oz)] * gt
                s_dw = s_dw + dWc[(2, oz)] * gt
                if _BWD_PREROLL_ADSTAR >= 2:
                    w_t = wxy_rc * wsz_rc[oz][:, off : off + BL]
                    accz[oz] = accz[oz] + w_t[None] * dmw_t
                else:
                    # d_m0: x-transpose (pure window roll, post-y-slice) —
                    # fold-free thanks to the adjusted weights
                    P = (wxy_t * Ws[(2, oz)][:, off : off + BL]) * dmw_t
                    Pr = pltpu.roll(P, ox % BXW, 1) if ox != 0 else P
                    accz[oz] = accz[oz] + Pr[:, 8 : 8 + BX, :]
            acc0 = acc0 + a_xy * s_w
            acc1 = acc1 + b_xy * s_w
            acc2 = acc2 + c_xy * s_dw

    if _BWD_PREROLL_ADSTAR >= 3 and _BWD_PROBE != "dm":
        # Select tree over the 27 per-offset contractions: each level picks
        # the axis's two ACTIVE values by the floor mask (evaluated at the
        # OUTPUT voxel — gq is fully shifted, so the masks line up).  x/y
        # clamps ride the edge-padded halos; z clamps keep the unshifted
        # value via the compound masks.
        fx = jnp.floor(pcen[0])
        fy = jnp.floor(pcen[1])
        fz = jnp.floor(pcen[2])
        mx = fx == -1.0
        my = fy == -1.0
        mz = fz == -1.0
        wx = (1.0 - (pcen[0] - fx), pcen[0] - fx)
        wy = (1.0 - (pcen[1] - fy), pcen[1] - fy)
        wz = (1.0 - (pcen[2] - fz), pcen[2] - fz)
        mzl = mz & (z_c2 > 0)
        mzh = mz | (z_c2 == Z - 1)
        for uz in (0, 1):
            qz = {
                (ox, oy): (
                    jnp.where(mzl, gq[(ox, oy, -1)], gq[(ox, oy, 0)])
                    if uz == 0
                    else jnp.where(mzh, gq[(ox, oy, 0)], gq[(ox, oy, 1)])
                )
                for ox in (-1, 0, 1)
                for oy in (-1, 0, 1)
            }
            for uy in (0, 1):
                qy = {
                    ox: (
                        jnp.where(my, qz[(ox, -1)], qz[(ox, 0)])
                        if uy == 0
                        else jnp.where(my, qz[(ox, 0)], qz[(ox, 1)])
                    )
                    for ox in (-1, 0, 1)
                }
                g0 = jnp.where(mx, qy[-1], qy[0])
                g1 = jnp.where(mx, qy[0], qy[1])
                # dW/dd is +-1 per axis in the 2-tap form: the axis-a
                # gradient is the signed tap difference, weighted by the
                # OTHER axes' (1-t, t) factors
                q = wx[0] * g0 + wx[1] * g1
                acc0 = acc0 + (wy[uy] * wz[uz]) * (g1 - g0)
                d1 = wz[uz] * q
                acc1 = acc1 - d1 if uy == 0 else acc1 + d1
                d2 = wy[uy] * q
                acc2 = acc2 - d2 if uz == 0 else acc2 + d2

    acc_dm = accz[0]
    for oz in (-1, 1):
        acc_dm = acc_dm + pltpu.roll(accz[oz], oz % BL, 2)
    emit_dm(acc_dm)
    del acc_dm

    # d_p: divergence path sum_a D_a^T (g * mw_a) from the residual mw
    div = jnp.zeros(shape_c, dtype=psl.dtype)
    for a in range(3) if _BWD_PROBE != "dm" else ():
        q = gsub * mwsl[a][None]  # (3, BXW, SL)
        qc = q[:, 8 : 8 + BX, Z : Z + BL]
        if a == 0:
            qm = pltpu.roll(q, 1, 1)[:, 8 : 8 + BX, Z : Z + BL]
            qp = pltpu.roll(q, BXW - 1, 1)[:, 8 : 8 + BX, Z : Z + BL]
            first = gx_c == 0
            last = gx_c == X - 1
        elif a == 1:
            qm = q[:, 8 : 8 + BX, 0:BL]
            qp = q[:, 8 : 8 + BX, 2 * Z : 2 * Z + BL]
            first = gy_c == 0
            last = gy_c == Y - 1
        else:
            qm = pltpu.roll(qc, 1, 2)
            qp = pltpu.roll(qc, BL - 1, 2)
            first = z_c == 0
            last = z_c == Z - 1
        div = div + 0.5 * (
            jnp.where(first, -qc, qm) - jnp.where(last, -qc, qp)
        )

    return div + jnp.stack([acc0, acc1, acc2], axis=0)


def _adstar_bwd_kernel_yb(BX, BY, Y, Z, X, ppad_ref, mpad_ref, gpad_ref,
                          mwpad_ref, dp_ref, dm_ref, p_slab, m_slab, g_slab,
                          mw_slab, sems):
    """y-blocked fused Ad* backward.  The phiinv window carries a 2-voxel
    y halo (the Jacobian is needed on a 1-halo subwindow whose own diffs
    need one more); m0, g, and the residual mw carry 1-halo windows.
    Static lane slices at multiples of Z stay (8,128)-aligned since
    Z % 128 == 0.

    Slab-double-buffered (round 4): the round-3 variant's doubled slot axis
    overflowed scoped vmem, but with mw external and the level-4 body
    (Wc/dWc dropped) the live set fits, and the split probe showed ~77%%
    of the kernel in DMA-stall + shared prep."""
    BXW = BX + 16
    WL2 = (BY + 4) * Z
    SL = (BY + 2) * Z
    BL = BY * Z
    n, xb, yb, L, T, ids = _yb_linear_step()

    def window(Lq):
        nq, xbq, ybq = ids(Lq)
        base = (nq, slice(None), pl.ds(xbq * BX, BXW))
        return [base + (pl.ds(ybq * BL, WL2),)] + [
            base + (pl.ds(ybq * BL, SL),)
        ] * 3

    slot = _db_slabs(
        (ppad_ref, mpad_ref, gpad_ref, mwpad_ref),
        (p_slab, m_slab, g_slab, mw_slab), sems, window, L, T,
    )

    def emit_dm(dm):
        dm_ref[0] = dm

    dp_ref[0] = _adstar_yb_bwd_body(
        BX, BY, Y, Z, X, xb, yb, p_slab[slot], m_slab[slot], g_slab[slot],
        mw_slab[slot], emit_dm,
    )


_FUSED_BWD = True


def set_fused_adstar_bwd(enabled: bool):
    """A/B switch between the fully fused Ad* backward kernel and the
    composed (warp-bwd + XLA jtv) backward.  Trace-time flag."""
    global _FUSED_BWD
    prev = _FUSED_BWD
    _FUSED_BWD = bool(enabled)
    return prev


def _pick_bx_bwd(X: int) -> int:
    """x-block for the y-blocked backwards.  Round-4 sweep on the
    double-buffered mw-residual kernels (scripts/bwd_sweep.py, same-run):
    128^3 b4 Ad* wants BX=16 (16/8 -> 4.49 ms vs 32/8 -> 5.19) and so does
    the compose bwd (16/32 -> 3.17 vs 32/8 -> 4.62); 256^3 b1 flips to
    BX=32 (32/16 -> 10.00 vs 16/16 -> 11.25) — the 8-row DMA-alignment
    x-halo amortizes better once the per-lane slab is 2x wider."""
    order = (32, 16, 8) if X >= 256 else (16, 32, 8)
    for bx in order:
        if X % bx == 0:
            return bx
    return 0


def _pick_by_bwd(Y: int, Z: int, BX: int = 16) -> int:
    """y-block for the y-blocked Ad* backward.  Budget: (BX+16)*(BY+4)*Z
    window lanes <= 250k under the raised 64M scoped-vmem limit (BX=32/
    BY=16 at Z=256 = 245,760 compiles and is the measured 256^3 optimum).
    At Z=128 BY=8 beats BY=16 (4.49 vs 5.43 ms, bwd_sweep round 4) — more
    grid steps, but the leaner live set pipelines better."""
    order = (16, 8, 4, 2) if Z >= 256 else (8, 16, 4, 2)
    for by in order:
        if Y % by == 0 and (BX + 16) * (by + 4) * Z <= 250_000:
            return by
    return 0


def _adstar_bwd_fused_dispatch(p, m0b, g, mw):
    """Run the fused backward (``mw`` = the forward's warped-momentum
    residual); returns (d_p, d_m0) or None when no kernel geometry applies
    (caller falls back to the composed backward)."""
    N = p.shape[0]
    X, Y, Z = p.shape[2:]
    shp = m0b.shape
    xw = [(0, 0), (0, 0), (8, 8), (0, 0), (0, 0)]
    if wu.supported(shp, p.shape, p.dtype):
        BX = wu._pick_block(X, Y * Z)
        # Scoped-vmem envelope: the round-3 merged kernel wanted 26M at
        # 64^3 (vs the 16M limit) with the in-kernel mw enumeration; with
        # mw external the live set is leaner — 64^3 (98,304 window lanes)
        # compiles, validates, and beats the composed fallback 5.10 vs
        # 6.70 ms fwd+bwd at b4 (scripts/wholey64_probe.py, round 4).
        if (BX + 16) * Y * Z > 100_000:
            return None
        ppad = jnp.pad(p, xw, mode="edge").reshape(N, 3, X + 16, Y * Z)
        mpad = jnp.pad(m0b, xw, mode="edge").reshape(N, 3, X + 16, Y * Z)
        gpad = jnp.pad(g, xw).reshape(N, 3, X + 16, Y * Z)
        mwpad = jnp.pad(mw, xw).reshape(N, 3, X + 16, Y * Z)
        dp, dm = pl.pallas_call(
            partial(_adstar_bwd_kernel, BX, Y, Z, X),
            out_shape=[
                jax.ShapeDtypeStruct((N, 3, X, Y * Z), p.dtype),
                jax.ShapeDtypeStruct((N, 3, X, Y * Z), p.dtype),
            ],
            grid=(N, X // BX),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
            out_specs=[
                pl.BlockSpec(
                    (1, 3, BX, Y * Z),
                    lambda n, xb: (n, 0, xb, 0),
                    memory_space=pltpu.VMEM,
                )
            ] * 2,
            scratch_shapes=[
                pltpu.VMEM((2, 3, BX + 16, Y * Z), jnp.float32),
                pltpu.VMEM((2, 3, BX + 16, Y * Z), jnp.float32),
                pltpu.VMEM((2, 3, BX + 16, Y * Z), jnp.float32),
                pltpu.VMEM((2, 3, BX + 16, Y * Z), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 4)),
            ],
            # the 16M default scoped-vmem limit is artificial (v5e has
            # 128M physical; fft_unit runs at 96M) — raising it is what
            # lets the whole-Y 64^3 backward and larger y-blocks compile
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
        )(ppad, mpad, gpad, mwpad)
        return dp.reshape(p.shape), dm.reshape(p.shape)
    if wu.yblocked_supported(shp, p.shape, p.dtype) and _pick_by_bwd(
        Y, Z, _pick_bx_bwd(X)
    ):
        BX = _pick_bx_bwd(X)
        BY = _pick_by_bwd(Y, Z, BX)
        BL = BY * Z
        w2 = [(0, 0), (0, 0), (8, 8), (2, 2), (0, 0)]
        w1 = [(0, 0), (0, 0), (8, 8), (1, 1), (0, 0)]
        ppad = jnp.pad(p, w2, mode="edge").reshape(N, 3, X + 16, (Y + 4) * Z)
        mpad = jnp.pad(m0b, w1, mode="edge").reshape(N, 3, X + 16, (Y + 2) * Z)
        gpad = jnp.pad(g, w1).reshape(N, 3, X + 16, (Y + 2) * Z)
        mwpad = jnp.pad(mw, w1).reshape(N, 3, X + 16, (Y + 2) * Z)
        dp, dm = pl.pallas_call(
            partial(_adstar_bwd_kernel_yb, BX, BY, Y, Z, X),
            out_shape=[
                jax.ShapeDtypeStruct((N, 3, X, Y * Z), p.dtype),
                jax.ShapeDtypeStruct((N, 3, X, Y * Z), p.dtype),
            ],
            grid=(N, X // BX, Y // BY),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
            out_specs=[
                pl.BlockSpec(
                    (1, 3, BX, BL),
                    lambda n, xb, yb: (n, 0, xb, yb),
                    memory_space=pltpu.VMEM,
                )
            ] * 2,
            scratch_shapes=[
                pltpu.VMEM((2, 3, BX + 16, (BY + 4) * Z), jnp.float32),
                pltpu.VMEM((2, 3, BX + 16, (BY + 2) * Z), jnp.float32),
                pltpu.VMEM((2, 3, BX + 16, (BY + 2) * Z), jnp.float32),
                pltpu.VMEM((2, 3, BX + 16, (BY + 2) * Z), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 4)),
            ],
            # the 16M default scoped-vmem limit is artificial (v5e has
            # 128M physical; fft_unit runs at 96M) — raising it is what
            # lets the whole-Y 64^3 backward and larger y-blocks compile
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
        )(ppad, mpad, gpad, mwpad)
        return dp.reshape(p.shape), dm.reshape(p.shape)
    amounts = wu._pad_amounts(X, Y, Z)
    if amounts is None:
        return None
    px, py, pz, _ = amounts
    ppp, mpp = wu._pad_fields([p, m0b], px, py, pz, "edge")
    gpp, mwpp = wu._pad_fields([g, mw], px, py, pz, "constant")
    res = _adstar_bwd_fused_dispatch(ppp, mpp, gpp, mwpp)
    if res is None:
        return None
    dpp, dmp = res
    return wu._fold_unpad(dpp, X, Y, Z), wu._fold_unpad(dmp, X, Y, Z)


# ===========================================================================
# Fused composition backward: one VMEM pass for BOTH gradients of
# out = s*v + phiinv(x + s*v(x)):
#   d_phiinv = warp-transpose of (W(s*v) * g)      (dI pattern)
#   d_v      = s*g + s * dW(s*v)-path              (dD pattern + axpy)
# Traffic: read phiinv, v, g; write d_phiinv, d_v — 5 field volumes.
# ===========================================================================


def _compose_bwd_kernel(BX, Y, Z, X, s, ppad_ref, vpad_ref, gpad_ref,
                        dp_ref, dv_ref, p_slab, v_slab, g_slab, sems):
    """whole-Y fused composition backward.  Slab-double-buffered (round 4,
    under the raised vmem limit)."""
    (n, xb), L, T, ids = _grid_linear_step(2)
    YZ = Y * Z
    BXW = BX + 16

    def window(Lq):
        nq, xbq = ids(Lq)
        return (nq, slice(None), pl.ds(xbq * BX, BXW), slice(None))

    slot = _db_slabs(
        (ppad_ref, vpad_ref, gpad_ref),
        (p_slab, v_slab, g_slab), sems, window, L, T,
    )

    psl = p_slab[slot]       # edge-padded
    dsl = s * v_slab[slot]   # effective displacement at all window rows
    gsl = g_slab[slot]       # zero-padded

    shape_w = (3, BXW, YZ)
    lane_w = jax.lax.broadcasted_iota(jnp.int32, shape_w, 2)
    y_w = lane_w // Z
    z_w = lane_w - y_w * Z
    shape_c = (3, BX, YZ)
    lane_c = jax.lax.broadcasted_iota(jnp.int32, shape_c, 2)
    y_c = lane_c // Z
    z_c = lane_c - y_c * Z
    row_c = jax.lax.broadcasted_iota(jnp.int32, shape_c, 1)
    gx_c = row_c + xb * BX

    _em = {}

    def roll_clamp(A, o, step, idx, n_axis):
        if o == 0:
            return A
        rolled = pltpu.roll(A, (-o * step) % YZ, 2)
        k = (step, o > 0)
        if k not in _em:
            _em[k] = idx == (n_axis - 1 if o == 1 else 0)
        return jnp.where(_em[k], A, rolled)

    # per-axis weights with the CLAMP folded in once (_adjust_axis): every
    # tap/transpose below is a pure roll — wrapped-in garbage is multiplied
    # by zero and no fold/select masks are needed (see the y-blocked kernel)
    row_w2 = jax.lax.broadcasted_iota(jnp.int32, (BXW, YZ), 0)
    lane_w2 = jax.lax.broadcasted_iota(jnp.int32, (BXW, YZ), 1)
    gx_w2 = xb * BX + row_w2 - 8
    y_w2 = lane_w2 // Z
    z_w2 = lane_w2 - y_w2 * Z
    W = {(a, o): _weights(dsl, a, o) for a in range(3) for o in (-1, 0, 1)}
    W.update(_adjust_axis(W, 0, gx_w2 == 0, gx_w2 == X - 1))
    W.update(_adjust_axis(W, 1, y_w2 == 0, y_w2 == Y - 1))
    W.update(_adjust_axis(W, 2, z_w2 == 0, z_w2 == Z - 1))

    # d_phiinv: warp transpose of W * g (same algebra as the Ad* backward's
    # d_m0 block), with the per-axis transposes factored over the offset
    # sum: x at 27, y at 9, z at 3 — all pure rolls
    accs_xy = {}
    for ox in (-1, 0, 1):
        wx = W[(0, ox)]
        for oy in (-1, 0, 1):
            wxy = wx * W[(1, oy)]
            for oz in (-1, 0, 1):
                P = (wxy * W[(2, oz)]) * gsl
                Pr = pltpu.roll(P, ox % BXW, 1) if ox != 0 else P
                A = Pr[:, 8 : 8 + BX, :]
                key = (oy, oz)
                accs_xy[key] = A if key not in accs_xy else accs_xy[key] + A

    acc_dp = jnp.zeros(shape_c, dtype=psl.dtype)
    for oz in (-1, 0, 1):
        acc_z = jnp.zeros(shape_c, dtype=psl.dtype)
        for oy in (-1, 0, 1):
            A = accs_xy[(oy, oz)]
            if oy != 0:
                A = pltpu.roll(A, (oy * Z) % YZ, 2)
            acc_z = acc_z + A
        if oz != 0:
            acc_z = pltpu.roll(acc_z, oz % YZ, 2)
        acc_dp = acc_dp + acc_z
    dp_ref[0] = acc_dp

    # d_v: s*g + s * weight-gradient path at center rows (weights/dweights
    # hoisted + clamp-adjusted; triple products factored at the oy level)
    dctr = dsl[:, 8 : 8 + BX, :]
    g_c = gsl[:, 8 : 8 + BX, :]

    def cslw(w):  # (BXW, YZ) -> center rows (BX, YZ)
        return w[8 : 8 + BX, :]

    Wc = {k: cslw(w) for k, w in W.items()}
    dWc = {(a, o): _dweights(dctr, a, o) for a in range(3) for o in (-1, 0, 1)}
    # center masks from FRESH center-shaped iotas: slicing a single-axis
    # (broadcast-layout) mask crashes Mosaic's extract_strided_slice
    row_c2 = jax.lax.broadcasted_iota(jnp.int32, (BX, YZ), 0)
    lane_c2 = jax.lax.broadcasted_iota(jnp.int32, (BX, YZ), 1)
    gx_c2 = xb * BX + row_c2
    y_c2 = lane_c2 // Z
    z_c2 = lane_c2 - y_c2 * Z
    dWc.update(_adjust_axis(dWc, 0, gx_c2 == 0, gx_c2 == X - 1))
    dWc.update(_adjust_axis(dWc, 1, y_c2 == 0, y_c2 == Y - 1))
    dWc.update(_adjust_axis(dWc, 2, z_c2 == 0, z_c2 == Z - 1))

    acc0 = jnp.zeros((BX, YZ), dtype=psl.dtype)
    acc1 = jnp.zeros((BX, YZ), dtype=psl.dtype)
    acc2 = jnp.zeros((BX, YZ), dtype=psl.dtype)
    for ox in (-1, 0, 1):
        base = (
            pltpu.roll(psl, (-ox) % BXW, 1)[:, 8 : 8 + BX, :]
            if ox != 0
            else psl[:, 8 : 8 + BX, :]
        )
        for oy in (-1, 0, 1):
            xy = pltpu.roll(base, (-oy * Z) % YZ, 2) if oy != 0 else base
            a_xy = dWc[(0, ox)] * Wc[(1, oy)]
            b_xy = Wc[(0, ox)] * dWc[(1, oy)]
            c_xy = Wc[(0, ox)] * Wc[(1, oy)]
            # (ox, oy) weight factors are constant across oz: accumulate the
            # z-axis products per tap, multiply once per group
            s_w = jnp.zeros((BX, YZ), dtype=psl.dtype)
            s_dw = jnp.zeros((BX, YZ), dtype=psl.dtype)
            for oz in (-1, 0, 1):
                tap = pltpu.roll(xy, (-oz) % YZ, 2) if oz != 0 else xy
                gt = g_c[0] * tap[0] + g_c[1] * tap[1] + g_c[2] * tap[2]
                s_w = s_w + Wc[(2, oz)] * gt
                s_dw = s_dw + dWc[(2, oz)] * gt
            acc0 = acc0 + a_xy * s_w
            acc1 = acc1 + b_xy * s_w
            acc2 = acc2 + c_xy * s_dw

    dv_ref[0] = s * g_c + s * jnp.stack([acc0, acc1, acc2], axis=0)


def _compose_yb_bwd_body(BX, BY, Y, Z, X, s, xb, yb, psl, vsl, gsl):
    """Shared y-blocked fused composition backward body on loaded slabs of
    shape (3, BX+16, (BY+2)*Z) — ``psl``/``vsl`` edge-padded, ``gsl``
    zero-padded.  Returns ``(d_phiinv, d_v)`` center blocks (3, BX, BY*Z)."""
    BXW = BX + 16
    WL = (BY + 2) * Z
    BL = BY * Z
    dsl = s * vsl

    shape_c = (3, BX, BL)
    lane_cb = jax.lax.broadcasted_iota(jnp.int32, shape_c, 2)
    z_c = lane_cb % Z
    gy_c = yb * BY + lane_cb // Z
    row_c = jax.lax.broadcasted_iota(jnp.int32, shape_c, 1)
    gx_c = row_c + xb * BX

    # per-axis weights with the CLAMP folded in once (_adjust_axis) — every
    # tap is a pure roll/slice and every transpose a pure roll/slice; no
    # per-tap selects or per-transpose folds (see the Ad* backward)
    row_w2 = jax.lax.broadcasted_iota(jnp.int32, (BXW, WL), 0)
    lane_w2 = jax.lax.broadcasted_iota(jnp.int32, (BXW, WL), 1)
    gx_w2 = xb * BX + row_w2 - 8
    gy_w2 = yb * BY + lane_w2 // Z - 1
    z_w2 = lane_w2 % Z
    W = {(a, o): _weights(dsl, a, o) for a in range(3) for o in (-1, 0, 1)}
    W.update(_adjust_axis(W, 0, gx_w2 == 0, gx_w2 == X - 1))
    W.update(_adjust_axis(W, 1, gy_w2 == 0, gy_w2 == Y - 1))
    W.update(_adjust_axis(W, 2, z_w2 == 0, z_w2 == Z - 1))

    def csl(w):  # (BXW, WL) -> center (BX, BL)
        return w[8 : 8 + BX, Z : Z + BL]

    dctr = dsl[:, 8 : 8 + BX, Z : Z + BL]
    g_c = gsl[:, 8 : 8 + BX, Z : Z + BL]
    # center masks from FRESH center-shaped iotas: slicing a single-axis
    # (broadcast-layout) mask crashes Mosaic's extract_strided_slice
    row_c2 = jax.lax.broadcasted_iota(jnp.int32, (BX, BL), 0)
    lane_c2 = jax.lax.broadcasted_iota(jnp.int32, (BX, BL), 1)
    gx_c2 = xb * BX + row_c2
    gy_c2 = yb * BY + lane_c2 // Z
    z_c2 = lane_c2 % Z
    if _BWD_PREROLL_COMPOSE < 3:
        Wc = {k: csl(w) for k, w in W.items()}
        dWc = {
            (a, o): _dweights(dctr, a, o)
            for a in range(3)
            for o in (-1, 0, 1)
        }
        dWc.update(_adjust_axis(dWc, 0, gx_c2 == 0, gx_c2 == X - 1))
        dWc.update(_adjust_axis(dWc, 1, gy_c2 == 0, gy_c2 == Y - 1))
        dWc.update(_adjust_axis(dWc, 2, z_c2 == 0, z_c2 == Z - 1))

    # Merged 27-offset loop computing d_phiinv (warp-transpose of W*g) and
    # the d_v weight-gradient path — weights shared per offset.  As in the
    # Ad* backward: the y transpose is an aligned static slice per tap, the
    # x transpose is DEFERRED to one window roll per (ox, oz), the z
    # transpose factors over the whole offset sum, and the (ox, oy) weight
    # factors of the d_v path multiply once per group via the (s_w, s_dw)
    # z-accumulators.
    acc0 = jnp.zeros((BX, BL), dtype=psl.dtype)
    acc1 = jnp.zeros((BX, BL), dtype=psl.dtype)
    acc2 = jnp.zeros((BX, BL), dtype=psl.dtype)
    accz = {oz: jnp.zeros(shape_c, dtype=psl.dtype) for oz in (-1, 0, 1)}
    gq = {}
    for ox in (-1, 0, 1):
        xt = pltpu.roll(psl, (-ox) % BXW, 1) if ox != 0 else psl
        wx = W[(0, ox)]
        if _BWD_PREROLL_COMPOSE >= 3:
            # d_phiinv transpose (box path) + the per-offset contractions
            # for the d_v select tree (see the Ad* backward's ==3 comment)
            xt_c = xt[:, 8 : 8 + BX, :]
            xtz3 = {0: xt_c}
            for oz in (-1, 1):
                xtz3[oz] = pltpu.roll(xt_c, (-oz) % WL, 2)
            box = {
                oz: jnp.zeros((3, BXW, BL), dtype=psl.dtype)
                for oz in (-1, 0, 1)
            }
            for oy in (-1, 0, 1):
                yoff = (1 + oy) * Z
                off = (1 - oy) * Z
                wxy_t = wx[:, off : off + BL] * W[(1, oy)][:, off : off + BL]
                g_t = gsl[:, :, off : off + BL]
                for oz in (-1, 0, 1):
                    Wz_t = W[(2, oz)][:, off : off + BL]
                    box[oz] = box[oz] + (wxy_t * Wz_t) * g_t
                    tap = xtz3[oz][:, :, yoff : yoff + BL]
                    gq[(ox, oy, oz)] = (
                        g_c[0] * tap[0]
                        + g_c[1] * tap[1]
                        + g_c[2] * tap[2]
                    )
            for oz in (-1, 0, 1):
                Bz = box[oz]
                Pr = pltpu.roll(Bz, ox % BXW, 1) if ox != 0 else Bz
                accz[oz] = accz[oz] + Pr[:, 8 : 8 + BX, :]
            continue
        if _BWD_PREROLL_COMPOSE >= 1:
            # phiinv z taps pre-rolled once per ox at WL extent (wrap-ins
            # land on z-edge lanes where the adjusted (2, oz) weights are
            # zero), so every tap is a pure aligned lane slice
            xt_c = xt[:, 8 : 8 + BX, :]
            xtz = {0: xt_c}
            for oz in (-1, 1):
                xtz[oz] = pltpu.roll(xt_c, (-oz) % WL, 2)
        if _BWD_PREROLL_COMPOSE >= 2:
            # d_phiinv x transpose rolled into the factors (see the Ad*
            # backward); per-(ox, oz) CENTER-extent partial sums keep the
            # oy-sum-then-accz-add association of the deferred-roll path,
            # so the restructure stays bit-identical
            g_rc = (pltpu.roll(gsl, ox % BXW, 1) if ox != 0 else gsl)[
                :, 8 : 8 + BX, :
            ]
            wz_rc = {
                oz: (
                    pltpu.roll(W[(2, oz)], ox % BXW, 0)
                    if ox != 0
                    else W[(2, oz)]
                )[8 : 8 + BX, :]
                for oz in (-1, 0, 1)
            }
            sxy = {
                oz: jnp.zeros(shape_c, dtype=psl.dtype) for oz in (-1, 0, 1)
            }
        else:
            box = {
                oz: jnp.zeros((3, BXW, BL), dtype=psl.dtype)
                for oz in (-1, 0, 1)
            }
        for oy in (-1, 0, 1):
            yoff = (1 + oy) * Z
            if _BWD_PREROLL_COMPOSE < 1:
                ytap = xt[:, 8 : 8 + BX, yoff : yoff + BL]
            a_xy = dWc[(0, ox)] * Wc[(1, oy)]
            b_xy = Wc[(0, ox)] * dWc[(1, oy)]
            c_xy = Wc[(0, ox)] * Wc[(1, oy)]
            s_w = jnp.zeros((BX, BL), dtype=psl.dtype)
            s_dw = jnp.zeros((BX, BL), dtype=psl.dtype)
            # d_phiinv transpose: w3 is consumed ONLY by the P path here (no
            # warp accumulation in this kernel), so every factor is y-slice-
            # transposed BEFORE the multiplies — the whole product chain
            # runs on BL lanes instead of WL (identical values)
            off = (1 - oy) * Z
            if _BWD_PREROLL_COMPOSE >= 2:
                wxy = wx * W[(1, oy)]
                wxy_rc = (pltpu.roll(wxy, ox % BXW, 0) if ox != 0 else wxy)[
                    8 : 8 + BX, off : off + BL
                ]
                g_t = g_rc[:, :, off : off + BL]
            else:
                wxy_t = wx[:, off : off + BL] * W[(1, oy)][:, off : off + BL]
                g_t = gsl[:, :, off : off + BL]
            for oz in (-1, 0, 1):
                if _BWD_PREROLL_COMPOSE >= 2:
                    w_t = wxy_rc * wz_rc[oz][:, off : off + BL]
                    sxy[oz] = sxy[oz] + w_t[None] * g_t
                else:
                    Wz_t = W[(2, oz)][:, off : off + BL]
                    box[oz] = box[oz] + (wxy_t * Wz_t) * g_t
                if _BWD_PREROLL_COMPOSE >= 1:
                    tap = xtz[oz][:, :, yoff : yoff + BL]
                else:
                    tap = (
                        pltpu.roll(ytap, (-oz) % BL, 2) if oz != 0 else ytap
                    )
                gt = g_c[0] * tap[0] + g_c[1] * tap[1] + g_c[2] * tap[2]
                s_w = s_w + Wc[(2, oz)] * gt
                s_dw = s_dw + dWc[(2, oz)] * gt
            acc0 = acc0 + a_xy * s_w
            acc1 = acc1 + b_xy * s_w
            acc2 = acc2 + c_xy * s_dw
        if _BWD_PREROLL_COMPOSE >= 2:
            for oz in (-1, 0, 1):
                accz[oz] = accz[oz] + sxy[oz]
        else:
            # deferred x-transpose: one window roll per (ox, oz)
            for oz in (-1, 0, 1):
                Bz = box[oz]
                Pr = pltpu.roll(Bz, ox % BXW, 1) if ox != 0 else Bz
                accz[oz] = accz[oz] + Pr[:, 8 : 8 + BX, :]

    if _BWD_PREROLL_COMPOSE >= 3:
        # d_v select tree over the per-offset contractions (the Ad*
        # backward's ==3 comment explains the formulation); masks and
        # (1-t, t) weights from the composed displacement at the center
        fx = jnp.floor(dctr[0])
        fy = jnp.floor(dctr[1])
        fz = jnp.floor(dctr[2])
        mx = fx == -1.0
        my = fy == -1.0
        mz = fz == -1.0
        wx = (1.0 - (dctr[0] - fx), dctr[0] - fx)
        wy = (1.0 - (dctr[1] - fy), dctr[1] - fy)
        wz = (1.0 - (dctr[2] - fz), dctr[2] - fz)
        mzl = mz & (z_c2 > 0)
        mzh = mz | (z_c2 == Z - 1)
        for uz in (0, 1):
            qz = {
                (ox, oy): (
                    jnp.where(mzl, gq[(ox, oy, -1)], gq[(ox, oy, 0)])
                    if uz == 0
                    else jnp.where(mzh, gq[(ox, oy, 0)], gq[(ox, oy, 1)])
                )
                for ox in (-1, 0, 1)
                for oy in (-1, 0, 1)
            }
            for uy in (0, 1):
                qy = {
                    ox: (
                        jnp.where(my, qz[(ox, -1)], qz[(ox, 0)])
                        if uy == 0
                        else jnp.where(my, qz[(ox, 0)], qz[(ox, 1)])
                    )
                    for ox in (-1, 0, 1)
                }
                g0 = jnp.where(mx, qy[-1], qy[0])
                g1 = jnp.where(mx, qy[0], qy[1])
                q = wx[0] * g0 + wx[1] * g1
                acc0 = acc0 + (wy[uy] * wz[uz]) * (g1 - g0)
                d1 = wz[uz] * q
                acc1 = acc1 - d1 if uy == 0 else acc1 + d1
                d2 = wy[uy] * q
                acc2 = acc2 - d2 if uz == 0 else acc2 + d2

    acc_dp = accz[0]
    for oz in (-1, 1):
        acc_dp = acc_dp + pltpu.roll(accz[oz], oz % BL, 2)

    return acc_dp, s * g_c + s * jnp.stack([acc0, acc1, acc2], axis=0)


def _compose_bwd_kernel_yb(BX, BY, Y, Z, X, s, ppad_ref, vpad_ref, gpad_ref,
                           dp_ref, dv_ref, p_slab, v_slab, g_slab, sems):
    """y-blocked fused composition backward (1-voxel y halo suffices: the
    transpose reads W*g at center±1 only, and W needs no further taps)."""
    BXW = BX + 16
    WL = (BY + 2) * Z
    BL = BY * Z
    n, xb, yb, L, T, ids = _yb_linear_step()

    def window(Lq):
        nq, xbq, ybq = ids(Lq)
        return (nq, slice(None), pl.ds(xbq * BX, BXW),
                pl.ds(ybq * BL, WL))

    slot = _db_slabs((ppad_ref, vpad_ref, gpad_ref),
                     (p_slab, v_slab, g_slab), sems, window, L, T)
    dp, dv = _compose_yb_bwd_body(
        BX, BY, Y, Z, X, s, xb, yb, p_slab[slot], v_slab[slot], g_slab[slot]
    )
    dp_ref[0] = dp
    dv_ref[0] = dv


def _pick_by_cbwd(Y: int, Z: int, BX: int = 16) -> int:
    """y-block for the fused compose backward (1-voxel y halo).  Budget:
    ``(BX+16)*(BY+2)*Z <= 250k`` window lanes under the raised 64M
    scoped-vmem limit.  Round-4 sweep at 128^3 b4 (double-buffered
    kernels, same run): BX=16/BY=32 -> 3.17 ms vs BX=32/BY=8 -> 4.62 —
    the tall y-block amortizes the x-halo reads across 4x the output
    rows and the compose bwd's lighter live set tolerates it (the Ad*
    bwd does not; see _pick_by_bwd)."""
    for by in (32, 16, 8, 4, 2):
        if Y % by == 0 and (BX + 16) * (by + 2) * Z <= 250_000:
            return by
    return 0


def _compose_bwd_fused_dispatch(phiinv, v, s, g):
    """Fused compose backward; None when no kernel geometry applies."""
    N = phiinv.shape[0]
    X, Y, Z = phiinv.shape[2:]
    shp = phiinv.shape
    xw = [(0, 0), (0, 0), (8, 8), (0, 0), (0, 0)]
    if wu.supported(shp, v.shape, v.dtype):
        BX = wu._pick_block(X, Y * Z)
        if 3 * 3 * (BX + 16) * Y * Z * 4 > 7 * 1024 * 1024:
            return None
        ppad = jnp.pad(phiinv, xw, mode="edge").reshape(N, 3, X + 16, Y * Z)
        vpad = jnp.pad(v, xw, mode="edge").reshape(N, 3, X + 16, Y * Z)
        gpad = jnp.pad(g, xw).reshape(N, 3, X + 16, Y * Z)
        dp, dv = pl.pallas_call(
            partial(_compose_bwd_kernel, BX, Y, Z, X, s),
            out_shape=[
                jax.ShapeDtypeStruct((N, 3, X, Y * Z), phiinv.dtype),
                jax.ShapeDtypeStruct((N, 3, X, Y * Z), phiinv.dtype),
            ],
            grid=(N, X // BX),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3,
            out_specs=[
                pl.BlockSpec(
                    (1, 3, BX, Y * Z),
                    lambda n, xb: (n, 0, xb, 0),
                    memory_space=pltpu.VMEM,
                )
            ] * 2,
            scratch_shapes=[
                pltpu.VMEM((2, 3, BX + 16, Y * Z), jnp.float32),
                pltpu.VMEM((2, 3, BX + 16, Y * Z), jnp.float32),
                pltpu.VMEM((2, 3, BX + 16, Y * Z), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 3)),
            ],
            # the 16M default scoped-vmem limit is artificial (v5e has
            # 128M physical; fft_unit runs at 96M) — raising it is what
            # lets the whole-Y 64^3 backward and larger y-blocks compile
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
        )(ppad, vpad, gpad)
        return dp.reshape(phiinv.shape), dv.reshape(phiinv.shape)
    if wu.yblocked_supported(shp, v.shape, v.dtype) and _pick_by_cbwd(
        Y, Z, _pick_bx_bwd(X)
    ):
        BX = _pick_bx_bwd(X)
        BY = _pick_by_cbwd(Y, Z, BX)
        BL = BY * Z
        w1 = [(0, 0), (0, 0), (8, 8), (1, 1), (0, 0)]
        ppad = jnp.pad(phiinv, w1, mode="edge").reshape(N, 3, X + 16, (Y + 2) * Z)
        vpad = jnp.pad(v, w1, mode="edge").reshape(N, 3, X + 16, (Y + 2) * Z)
        gpad = jnp.pad(g, w1).reshape(N, 3, X + 16, (Y + 2) * Z)
        dp, dv = pl.pallas_call(
            partial(_compose_bwd_kernel_yb, BX, BY, Y, Z, X, s),
            out_shape=[
                jax.ShapeDtypeStruct((N, 3, X, Y * Z), phiinv.dtype),
                jax.ShapeDtypeStruct((N, 3, X, Y * Z), phiinv.dtype),
            ],
            grid=(N, X // BX, Y // BY),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3,
            out_specs=[
                pl.BlockSpec(
                    (1, 3, BX, BL),
                    lambda n, xb, yb: (n, 0, xb, yb),
                    memory_space=pltpu.VMEM,
                )
            ] * 2,
            scratch_shapes=[
                pltpu.VMEM((2, 3, BX + 16, (BY + 2) * Z), jnp.float32),
                pltpu.VMEM((2, 3, BX + 16, (BY + 2) * Z), jnp.float32),
                pltpu.VMEM((2, 3, BX + 16, (BY + 2) * Z), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 3)),
            ],
            # the 16M default scoped-vmem limit is artificial (v5e has
            # 128M physical; fft_unit runs at 96M) — raising it is what
            # lets the whole-Y 64^3 backward and larger y-blocks compile
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
        )(ppad, vpad, gpad)
        return dp.reshape(phiinv.shape), dv.reshape(phiinv.shape)
    amounts = wu._pad_amounts(X, Y, Z)
    if amounts is None:
        return None
    px, py, pz, _ = amounts
    ppp, vpp = wu._pad_fields([phiinv, v], px, py, pz, "edge")
    (gpp,) = wu._pad_fields([g], px, py, pz, "constant")
    res = _compose_bwd_fused_dispatch(ppp, vpp, s, gpp)
    if res is None:
        return None
    dpp, dvp = res
    return wu._fold_unpad(dpp, X, Y, Z), wu._fold_unpad(dvp, X, Y, Z)
