"""Fused 2D Pallas kernels for the EPDiff hot loop (Ad* and compose).

2D degeneration of :mod:`epdiff_unit`'s whole-Y geometry: fields are
``(B, 2, H, W)`` with H on the sublane axis (x-blocked with the 8-row
DMA-alignment halo) and W on the lane axis (W % 128 == 0).  The 27-tap /
3-column structures collapse to 9 taps / 2 Jacobian columns; weights, taps,
and difference stencils reproduce the exact 2D discretization of
``sample_displacement_unit`` + ``diff_central`` (CLAMP boundary), so the
ops are bit-identical to the composed XLA path in the unit regime
(reference: the same interp.cu/diff.cu kernels the 3D versions mirror).

Backwards are fully fused one-pass kernels computing both gradients with
mw/J recomputed in VMEM (read 3 fields, write 2), same algebra as the 3D
``_adstar_bwd_kernel`` / ``_compose_bwd_kernel`` with the y-axis removed.
"""
from __future__ import annotations

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


def set_fused_2d(enabled: bool):
    """Enable/disable the fused 2D kernels (trace-time flag)."""
    global _ENABLED
    prev = _ENABLED
    _ENABLED = bool(enabled)
    return prev


def _pick_bx(H: int) -> int:
    for bx in (32, 16, 8):
        if H % bx == 0:
            return bx
    return 0


def supported(p_shape, m_shape, dtype) -> bool:
    """Gate: 2D f32 2-channel fields, H x-blockable, W lane-aligned, and a
    VMEM budget far under scoped limits at practical 2D sizes."""
    if not (_ENABLED and _HAVE_PALLAS and wu.pallas_warp_enabled()):
        return False
    if dtype != jnp.float32:
        return False
    if len(p_shape) != 4 or p_shape[1] != 2:
        return False
    if len(m_shape) != 4 or m_shape[1] != 2:
        return False
    if m_shape[0] not in (1, p_shape[0]):
        return False
    if tuple(m_shape[2:]) != tuple(p_shape[2:]):
        return False
    H, W = p_shape[2:]
    if _pick_bx(H) == 0 or W % 128 != 0:
        return False
    BX = _pick_bx(H)
    # 3 slabs + ~8x temporaries, 2 channels
    return 9 * 2 * (BX + 16) * W * 4 < 5 * 1024 * 1024


def _w2(d, axis, o):
    """Per-axis tier-1 stencil weight (same formula as epdiff_unit)."""
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


def _dw2(d, axis, o):
    da = d[axis]
    fa = jnp.floor(da)
    if o == -1:
        return -(fa == -1.0).astype(da.dtype)
    if o == 0:
        return (fa == -1.0).astype(da.dtype) - (fa == 0.0).astype(da.dtype)
    return (fa == 0.0).astype(da.dtype)


def _lane_idx(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 2)


def _ztap(A, oz, W_lanes, z_idx, W):
    """Lane roll by oz with CLAMP edge fix on the W axis."""
    if oz == 0:
        return A
    rolled = pltpu.roll(A, (-oz) % W_lanes, 2)
    edge = z_idx == (W - 1 if oz == 1 else 0)
    return jnp.where(edge, A, rolled)


# ---------------------------------------------------------------------------
# Ad* 2D: m_c = sum_a (D_a p_c + delta_ca) * m0_a(x + p(x))
# ---------------------------------------------------------------------------


def _h2d_window(BX):
    """window(Lq) for the 2D kernels' (N, H//BX) grid (x slab windows)."""
    (n, xb), L, T, unravel = wu._grid_linear_step(2)

    def window(Lq):
        nq, xbq = unravel(Lq)
        return (nq, slice(None), pl.ds(xbq * BX, BX + 16), slice(None))

    return n, xb, L, T, window


def _adstar2d_fwd_kernel(BX, W, ppad_ref, mpad_ref, out_ref, p_slab, m_slab,
                         sems):
    n, xb, L, T, window = _h2d_window(BX)
    slot = wu._db_slabs((ppad_ref, mpad_ref), (p_slab, m_slab), sems,
                        window, L, T)
    psl = p_slab[slot]  # (2, BX+16, W)
    msl = m_slab[slot]
    d = psl[:, 8 : 8 + BX, :]

    shape = (2, BX, W)
    z_idx = _lane_idx(shape)

    Wd = {(a, o): _w2(d, a, o) for a in range(2) for o in (-1, 0, 1)}
    mw = jnp.zeros(shape, dtype=d.dtype)
    for ox in (-1, 0, 1):
        rx = pltpu.roll(msl, (-ox) % (BX + 16), 1) if ox != 0 else msl
        base = rx[:, 8 : 8 + BX, :]
        wx = Wd[(0, ox)]
        for oz in (-1, 0, 1):
            tap = _ztap(base, oz, W, z_idx, W)
            mw = mw + (wx * Wd[(1, oz)]) * tap

    xp = pltpu.roll(psl, (BX + 15) % (BX + 16), 1)[:, 8 : 8 + BX, :]
    xm = pltpu.roll(psl, 1, 1)[:, 8 : 8 + BX, :]
    Jx = 0.5 * (xp - xm)
    Jz = 0.5 * (
        _ztap(d, 1, W, z_idx, W) - _ztap(d, -1, W, z_idx, W)
    )

    out_ref[0] = mw + Jx * mw[0][None] + Jz * mw[1][None]


def _adstar2d_bwd_kernel(BX, W, H, ppad_ref, mpad_ref, gpad_ref,
                         dp_ref, dm_ref, p_slab, m_slab, g_slab, sems):
    BXW = BX + 16
    n, xb, L, T, window = _h2d_window(BX)
    slot = wu._db_slabs((ppad_ref, mpad_ref, gpad_ref),
                        (p_slab, m_slab, g_slab), sems, window, L, T)
    psl = p_slab[slot]  # (2, BXW, W) edge-padded
    msl = m_slab[slot]
    gsl = g_slab[slot]  # zero-padded

    shape_w = (2, BXW, W)
    z_w = _lane_idx(shape_w)
    shape_c = (2, BX, W)
    z_c = _lane_idx(shape_c)
    row_c = jax.lax.broadcasted_iota(jnp.int32, shape_c, 1)
    gx_c = row_c + xb * BX

    _wc = {}

    def wgt(axis, o):
        if (axis, o) not in _wc:
            _wc[(axis, o)] = _w2(psl, axis, o)  # (BXW, W)
        return _wc[(axis, o)]

    # mw at all window rows
    mw = jnp.zeros(shape_w, dtype=psl.dtype)
    for ox in (-1, 0, 1):
        xt = pltpu.roll(msl, (-ox) % BXW, 1) if ox != 0 else msl
        wx = wgt(0, ox)
        for oz in (-1, 0, 1):
            tap = _ztap(xt, oz, W, z_w, W)
            mw = mw + (wx * wgt(1, oz)) * tap

    xp = pltpu.roll(psl, BXW - 1, 1)
    xm = pltpu.roll(psl, 1, 1)
    Jx = 0.5 * (xp - xm)
    Jz = 0.5 * (_ztap(psl, 1, W, z_w, W) - _ztap(psl, -1, W, z_w, W))

    # d_mw_a = sum_c g_c J_ca + g_a
    d_mw = jnp.stack(
        [
            gsl[0] * Jx[0] + gsl[1] * Jx[1] + gsl[0],
            gsl[0] * Jz[0] + gsl[1] * Jz[1] + gsl[1],
        ],
        axis=0,
    )

    # d_m0 = transpose of the weighted warp (x-roll transposes + z factored)
    accz = {oz: jnp.zeros(shape_c, dtype=psl.dtype) for oz in (-1, 0, 1)}
    dctr = psl[:, 8 : 8 + BX, :]
    d_mw_c = d_mw[:, 8 : 8 + BX, :]
    acc0 = jnp.zeros((BX, W), dtype=psl.dtype)
    acc1 = jnp.zeros((BX, W), dtype=psl.dtype)
    DW = {(a, o): _dw2(dctr, a, o) for a in range(2) for o in (-1, 0, 1)}
    for ox in (-1, 0, 1):
        wx = wgt(0, ox)
        xt = pltpu.roll(msl, (-ox) % BXW, 1) if ox != 0 else msl
        for oz in (-1, 0, 1):
            wz = wgt(1, oz)
            w2 = wx * wz
            # weight-gradient path at center rows
            tap = _ztap(xt, oz, W, z_w, W)[:, 8 : 8 + BX, :]
            gt = d_mw_c[0] * tap[0] + d_mw_c[1] * tap[1]
            acc0 = acc0 + DW[(0, ox)] * wz[8 : 8 + BX, :] * gt
            acc1 = acc1 + wx[8 : 8 + BX, :] * DW[(1, oz)] * gt
            # d_m0 x-transpose; z factored below
            P = w2 * d_mw  # (2, BXW, W)
            Pr = pltpu.roll(P, ox % BXW, 1) if ox != 0 else P
            A = Pr[:, 8 : 8 + BX, :]
            if ox != 0:
                edge = (gx_c == 0) if ox == -1 else (gx_c == H - 1)
                A = A + jnp.where(edge, P[:, 8 : 8 + BX, :], 0.0)
            accz[oz] = accz[oz] + A

    acc_dm = jnp.zeros(shape_c, dtype=psl.dtype)
    for oz in (-1, 0, 1):
        acc_z = accz[oz]
        if oz != 0:
            wrap = (z_c == 0) if oz == 1 else (z_c == W - 1)
            Ar = pltpu.roll(acc_z, oz % W, 2)
            A2 = jnp.where(wrap, 0.0, Ar)
            zedge = (z_c == 0) if oz == -1 else (z_c == W - 1)
            acc_z = A2 + jnp.where(zedge, acc_z, 0.0)
        acc_dm = acc_dm + acc_z
    dm_ref[0] = acc_dm

    # d_p divergence path: sum_a D_a^T (g * mw_a)
    div = jnp.zeros(shape_c, dtype=psl.dtype)
    for a in range(2):
        q = gsl * mw[a][None]
        qc = q[:, 8 : 8 + BX, :]
        if a == 0:
            qm = pltpu.roll(q, 1, 1)[:, 8 : 8 + BX, :]
            qp = pltpu.roll(q, BXW - 1, 1)[:, 8 : 8 + BX, :]
            first = gx_c == 0
            last = gx_c == H - 1
        else:
            qm = pltpu.roll(qc, 1, 2)
            qp = pltpu.roll(qc, W - 1, 2)
            first = z_c == 0
            last = z_c == W - 1
        div = div + 0.5 * (
            jnp.where(first, -qc, qm) - jnp.where(last, -qc, qp)
        )

    dp_ref[0] = div + jnp.stack([acc0, acc1], axis=0)


def _pad_x(x, mode):
    return jnp.pad(
        x, [(0, 0), (0, 0), (8, 8), (0, 0)],
        mode=mode if mode != "constant" else "constant",
    )


def _adstar2d_fwd_dispatch(phiinv, m0b):
    N = phiinv.shape[0]
    H, W = phiinv.shape[2:]
    BX = _pick_bx(H)
    ppad = _pad_x(phiinv, "edge")
    mpad = _pad_x(m0b, "edge")
    return pl.pallas_call(
        partial(_adstar2d_fwd_kernel, BX, W),
        out_shape=jax.ShapeDtypeStruct((N, 2, H, W), phiinv.dtype),
        grid=(N, H // BX),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
        out_specs=pl.BlockSpec(
            (1, 2, BX, W), lambda n, xb: (n, 0, xb, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2, BX + 16, W), jnp.float32),
            pltpu.VMEM((2, 2, BX + 16, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )(ppad, mpad)


@jax.custom_vjp
def ad_star2d_pallas(phiinv, m0):
    """Fused 2D ``Ad^*(phiinv, m0)`` for the unit-displacement regime."""
    N = phiinv.shape[0]
    m0b = (
        jnp.broadcast_to(m0, (N,) + m0.shape[1:])
        if m0.shape[0] == 1 and N > 1
        else m0
    )
    return _adstar2d_fwd_dispatch(phiinv, m0b)


def _adstar2d_fwd(phiinv, m0):
    return ad_star2d_pallas(phiinv, m0), (phiinv, m0)


def _adstar2d_bwd(res, g):
    phiinv, m0 = res
    N = phiinv.shape[0]
    H, W = phiinv.shape[2:]
    broadcasting = m0.shape[0] == 1 and N > 1
    m0b = jnp.broadcast_to(m0, (N,) + m0.shape[1:]) if broadcasting else m0
    BX = _pick_bx(H)
    ppad = _pad_x(phiinv, "edge")
    mpad = _pad_x(m0b, "edge")
    gpad = _pad_x(g, "constant")
    dp, dm = pl.pallas_call(
        partial(_adstar2d_bwd_kernel, BX, W, H),
        out_shape=[
            jax.ShapeDtypeStruct((N, 2, H, W), phiinv.dtype),
            jax.ShapeDtypeStruct((N, 2, H, W), phiinv.dtype),
        ],
        grid=(N, H // BX),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3,
        out_specs=[
            pl.BlockSpec(
                (1, 2, BX, W), lambda n, xb: (n, 0, xb, 0),
                memory_space=pltpu.VMEM,
            )
        ] * 2,
        scratch_shapes=[
            pltpu.VMEM((2, 2, BX + 16, W), jnp.float32),
            pltpu.VMEM((2, 2, BX + 16, W), jnp.float32),
            pltpu.VMEM((2, 2, BX + 16, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )(ppad, mpad, gpad)
    if broadcasting:
        dm = jnp.sum(dm, axis=0, keepdims=True)
    return dp, dm


ad_star2d_pallas.defvjp(_adstar2d_fwd, _adstar2d_bwd)


# ---------------------------------------------------------------------------
# compose 2D: out = s*v + phiinv(x + s*v(x))
# ---------------------------------------------------------------------------


def _compose2d_fwd_kernel(BX, W, s, ppad_ref, v_ref, out_ref, p_slab, sems):
    n, xb, L, T, window = _h2d_window(BX)
    slot = wu._db_slabs((ppad_ref,), (p_slab,), sems, window, L, T)
    v = v_ref[0]  # (2, BX, W)
    d = s * v
    shape = (2, BX, W)
    z_idx = _lane_idx(shape)
    psl = p_slab[slot]
    Wd = {(a, o): _w2(d, a, o) for a in range(2) for o in (-1, 0, 1)}
    acc = s * v
    for ox in (-1, 0, 1):
        rx = pltpu.roll(psl, (-ox) % (BX + 16), 1) if ox != 0 else psl
        base = rx[:, 8 : 8 + BX, :]
        wx = Wd[(0, ox)]
        for oz in (-1, 0, 1):
            tap = _ztap(base, oz, W, z_idx, W)
            acc = acc + (wx * Wd[(1, oz)]) * tap
    out_ref[0] = acc


def _compose2d_bwd_kernel(BX, W, H, s, ppad_ref, vpad_ref, gpad_ref,
                          dp_ref, dv_ref, p_slab, v_slab, g_slab, sems):
    BXW = BX + 16
    n, xb, L, T, window = _h2d_window(BX)
    slot = wu._db_slabs((ppad_ref, vpad_ref, gpad_ref),
                        (p_slab, v_slab, g_slab), sems, window, L, T)
    psl = p_slab[slot]
    dsl = s * v_slab[slot]
    gsl = g_slab[slot]

    shape_w = (2, BXW, W)
    z_w = _lane_idx(shape_w)
    shape_c = (2, BX, W)
    z_c = _lane_idx(shape_c)
    row_c = jax.lax.broadcasted_iota(jnp.int32, shape_c, 1)
    gx_c = row_c + xb * BX

    _wc = {}

    def wgt(axis, o):
        if (axis, o) not in _wc:
            _wc[(axis, o)] = _w2(dsl, axis, o)
        return _wc[(axis, o)]

    # d_phiinv = warp transpose of W * g (x at 9, z factored at 3)
    accz = {oz: jnp.zeros(shape_c, dtype=psl.dtype) for oz in (-1, 0, 1)}
    for ox in (-1, 0, 1):
        wx = wgt(0, ox)
        for oz in (-1, 0, 1):
            P = (wx * wgt(1, oz)) * gsl
            Pr = pltpu.roll(P, ox % BXW, 1) if ox != 0 else P
            A = Pr[:, 8 : 8 + BX, :]
            if ox != 0:
                edge = (gx_c == 0) if ox == -1 else (gx_c == H - 1)
                A = A + jnp.where(edge, P[:, 8 : 8 + BX, :], 0.0)
            accz[oz] = accz[oz] + A

    acc_dp = jnp.zeros(shape_c, dtype=psl.dtype)
    for oz in (-1, 0, 1):
        acc_z = accz[oz]
        if oz != 0:
            wrap = (z_c == 0) if oz == 1 else (z_c == W - 1)
            Ar = pltpu.roll(acc_z, oz % W, 2)
            A2 = jnp.where(wrap, 0.0, Ar)
            zedge = (z_c == 0) if oz == -1 else (z_c == W - 1)
            acc_z = A2 + jnp.where(zedge, acc_z, 0.0)
        acc_dp = acc_dp + acc_z
    dp_ref[0] = acc_dp

    # d_v = s*g + s * weight-gradient path at center rows
    dctr = dsl[:, 8 : 8 + BX, :]
    g_c = gsl[:, 8 : 8 + BX, :]
    acc0 = jnp.zeros((BX, W), dtype=psl.dtype)
    acc1 = jnp.zeros((BX, W), dtype=psl.dtype)
    Wc = {(a, o): _w2(dctr, a, o) for a in range(2) for o in (-1, 0, 1)}
    DW = {(a, o): _dw2(dctr, a, o) for a in range(2) for o in (-1, 0, 1)}
    for ox in (-1, 0, 1):
        base = (
            pltpu.roll(psl, (-ox) % BXW, 1)[:, 8 : 8 + BX, :]
            if ox != 0
            else psl[:, 8 : 8 + BX, :]
        )
        wx = Wc[(0, ox)]
        for oz in (-1, 0, 1):
            tap = _ztap(base, oz, W, z_c, W)
            gt = g_c[0] * tap[0] + g_c[1] * tap[1]
            acc0 = acc0 + DW[(0, ox)] * Wc[(1, oz)] * gt
            acc1 = acc1 + wx * DW[(1, oz)] * gt
    dv_ref[0] = s * g_c + s * jnp.stack([acc0, acc1], axis=0)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def compose2d_pallas(phiinv, v, s):
    """Fused 2D ``s*v(x) + phiinv(x + s*v(x))`` for |s*v| < 1."""
    N = phiinv.shape[0]
    H, W = phiinv.shape[2:]
    BX = _pick_bx(H)
    ppad = _pad_x(phiinv, "edge")
    return pl.pallas_call(
        partial(_compose2d_fwd_kernel, BX, W, s),
        out_shape=jax.ShapeDtypeStruct((N, 2, H, W), phiinv.dtype),
        grid=(N, H // BX),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (1, 2, BX, W), lambda n, xb: (n, 0, xb, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 2, BX, W), lambda n, xb: (n, 0, xb, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2, BX + 16, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 1)),
        ],
    )(ppad, v)


def _compose2d_fwd(phiinv, v, s):
    return compose2d_pallas(phiinv, v, s), (phiinv, v)


def _compose2d_bwd(s, res, g):
    phiinv, v = res
    N = phiinv.shape[0]
    H, W = phiinv.shape[2:]
    BX = _pick_bx(H)
    ppad = _pad_x(phiinv, "edge")
    vpad = _pad_x(v, "edge")
    gpad = _pad_x(g, "constant")
    dp, dv = pl.pallas_call(
        partial(_compose2d_bwd_kernel, BX, W, H, s),
        out_shape=[
            jax.ShapeDtypeStruct((N, 2, H, W), phiinv.dtype),
            jax.ShapeDtypeStruct((N, 2, H, W), phiinv.dtype),
        ],
        grid=(N, H // BX),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3,
        out_specs=[
            pl.BlockSpec(
                (1, 2, BX, W), lambda n, xb: (n, 0, xb, 0),
                memory_space=pltpu.VMEM,
            )
        ] * 2,
        scratch_shapes=[
            pltpu.VMEM((2, 2, BX + 16, W), jnp.float32),
            pltpu.VMEM((2, 2, BX + 16, W), jnp.float32),
            pltpu.VMEM((2, 2, BX + 16, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )(ppad, vpad, gpad)
    return dp, dv


compose2d_pallas.defvjp(_compose2d_fwd, _compose2d_bwd)
