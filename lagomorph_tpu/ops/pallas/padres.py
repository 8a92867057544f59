"""Padded-resident EPDiff shooting kernels (round 3).

The fused y-blocked kernels (ops/pallas/epdiff_unit.py) consume x-edge-padded,
lane-flattened slabs with a 1-2 voxel y halo.  When each op pads its own
inputs, every EPDiff substep pays ~7 XLA pad copies (~0.27 ms each at 128^3
b4, ~2 ms/substep) that cannot fuse into `pallas_call` operands.  This module
keeps the shooting scan's carry (phiinv) RESIDENT in one unified padded
layout

    (N, 3, X + 16, (Y + 4) * Z)    x pad 8 (DMA alignment), y pad 2 (halos)

so the carry is padded once at scan entry and sliced once at exit:

 * `ad_star_pr(ppad, mpad)` reads the padded carry and the (hoisted,
   loop-invariant) padded momentum directly — no per-substep pads — and
   returns the UNPADDED transported momentum `m` (it feeds the fluid solve)
   plus a per-block unit-regime flag reduced in-kernel (replacing the
   separate `_in_unit` HBM passes of the hoisted fast path);
 * `compose_pr(ppad, v, s)` reads the padded carry and the unpadded
   velocity and WRITES the padded layout directly (center blocks via manual
   DMA; edge blocks also write the x/y halo bands as domain-edge
   replications, so the next substep's taps see exact CLAMP semantics);
 * both backwards consume the padded residuals directly and write their
   phiinv-cotangents in the padded layout with ZERO halos.  Zero halos are
   correct: with the clamp folded into the per-axis weights
   (epdiff_unit._adjust_axis) the forward output never depends on the halo
   entries (their weights are zero), so d/d(halo) == 0; and they keep the
   invariant that every carry cotangent in the scan is zero-halo, which is
   exactly the zero-padded-g contract the backward bodies already assume.

The kernel MATH is shared with epdiff_unit (`_adstar_yb_fwd_body`,
`_compose_yb_fwd_body`, `_adstar_yb_bwd_body`, `_compose_yb_bwd_body`) —
only the HBM window offsets (+Z lanes: the 1-halo window sits centered in
the 2-halo layout) and the output placement differ, so the padded-resident
path is bit-identical to the per-call-padded path in its regime.

Only the y-blocked geometry (Z % 128 == 0: the 128^3/256^3 bench shapes) is
covered; other shapes keep the per-call-padded dispatches.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import warp_unit as wu
from . import epdiff_unit as eu

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except ImportError:  # pragma: no cover
    _HAVE_PALLAS = False

PX = 8  # x pad each side (Mosaic sublane/DMA alignment)
PY = 2  # y pad each side (superset halo: bwd Ad* needs 2, the rest 1)

_ENABLED = True


def set_padres(enabled: bool):
    """Enable/disable the padded-resident shooting path (trace-time flag)."""
    global _ENABLED
    prev = _ENABLED
    _ENABLED = bool(enabled)
    return prev


def supported(p_shape, dtype) -> bool:
    """True when the padded-resident scan covers this shape end-to-end:
    y-blocked forwards AND both fused y-blocked backwards."""
    if not (_ENABLED and _HAVE_PALLAS and wu.pallas_warp_enabled()
            and eu._ENABLED and eu._FUSED_BWD):
        return False
    if dtype != jnp.float32:
        return False
    if len(p_shape) != 5 or p_shape[1] != 3:
        return False
    if not wu.yblocked_supported(p_shape, p_shape, dtype):
        return False
    X, Y, Z = p_shape[2:]
    if eu._fwd_blocks(X, Y, Z) is None:
        return False
    bx = eu._pick_bx_bwd(X)
    if not bx or not eu._pick_by_bwd(Y, Z, bx) or not eu._pick_by_cbwd(Y, Z, bx):
        return False
    return True


# ---------------------------------------------------------------------------
# layout helpers
# ---------------------------------------------------------------------------


def pad_carry(p):
    """(N, 3, X, Y, Z) -> (N, 3, X+2*PX, (Y+2*PY)*Z), edge-replicated.
    Differentiable; with zero-halo cotangents (the scan invariant) its VJP
    fold degenerates to the exact slice."""
    N, C, X, Y, Z = p.shape
    pp = jnp.pad(p, [(0, 0), (0, 0), (PX, PX), (PY, PY), (0, 0)], mode="edge")
    return pp.reshape(N, C, X + 2 * PX, (Y + 2 * PY) * Z)


def unpad_carry(pp, X, Y, Z):
    """Inverse of :func:`pad_carry` (interior slice)."""
    N, C = pp.shape[:2]
    return pp.reshape(N, C, X + 2 * PX, Y + 2 * PY, Z)[
        :, :, PX : PX + X, PY : PY + Y, :
    ]


def _zero_pad_g(g):
    """Zero-pad an unpadded cotangent into the carry layout (used for the
    Ad* backward's m-cotangent, which arrives unpadded from the fluid
    solve)."""
    N, C, X, Y, Z = g.shape
    gp = jnp.pad(g, [(0, 0), (0, 0), (PX, PX), (PY, PY), (0, 0)])
    return gp.reshape(N, C, X + 2 * PX, (Y + 2 * PY) * Z)


# ---------------------------------------------------------------------------
# padded-layout output stores
# ---------------------------------------------------------------------------


def _store_padded(out_ref, n, xb, yb, X, Y, Z, BX, BY, acc,
                  obuf, hx, hy, hc, sem, edge):
    """DMA the (3, BX, BY*Z) block ``acc`` into the padded layout of
    ``out_ref`` at block (n, xb, yb); edge blocks also write their x/y halo
    bands — domain-edge replications when ``edge`` (forward values) or
    zeros (backward cotangents).  All writes are (8,128)-aligned: rows are
    multiples of 8 (PX=8, BX%8==0), lane offsets multiples of Z (Z%128==0).
    """
    BL = BY * Z
    XB = pl.num_programs(1)
    YB = pl.num_programs(2)
    row0 = PX + xb * BX
    lane0 = PY * Z + yb * BL

    def cp(src, dst_rows, dst_lanes):
        c = pltpu.make_async_copy(
            src, out_ref.at[n, :, dst_rows, dst_lanes], sem
        )
        c.start()
        c.wait()

    obuf[...] = acc
    cp(obuf, pl.ds(row0, BX), pl.ds(lane0, BL))

    # x halo bands (rows [0, PX) / [PX+X, PX+X+PX)) over this block's lanes
    @pl.when(xb == 0)
    def _():
        hx[...] = (
            jnp.broadcast_to(acc[:, 0:1, :], (3, PX, BL)) if edge
            else jnp.zeros((3, PX, BL), acc.dtype)
        )
        cp(hx, pl.ds(0, PX), pl.ds(lane0, BL))

    @pl.when(xb == XB - 1)
    def _():
        hx[...] = (
            jnp.broadcast_to(acc[:, BX - 1 : BX, :], (3, PX, BL)) if edge
            else jnp.zeros((3, PX, BL), acc.dtype)
        )
        cp(hx, pl.ds(PX + X, PX), pl.ds(lane0, BL))

    # y halo bands (lanes [0, PY*Z) / [(Y+PY)*Z, (Y+2PY)*Z)) over this
    # block's rows: PY copies of the domain-edge y-plane
    @pl.when(yb == 0)
    def _():
        hy[...] = acc[:, :, 0:Z] if edge else jnp.zeros((3, BX, Z), acc.dtype)
        for k in range(PY):
            cp(hy, pl.ds(row0, BX), pl.ds(k * Z, Z))

    @pl.when(yb == YB - 1)
    def _():
        hy[...] = (
            acc[:, :, BL - Z : BL] if edge
            else jnp.zeros((3, BX, Z), acc.dtype)
        )
        for k in range(PY):
            cp(hy, pl.ds(row0, BX), pl.ds((Y + PY + k) * Z, Z))

    # corners (x halo rows x y halo lanes)
    for xcond, rows, xsel in (
        (xb == 0, pl.ds(0, PX), slice(0, 1)),
        (xb == XB - 1, pl.ds(PX + X, PX), slice(BX - 1, BX)),
    ):
        for ycond, lane_base, ysel in (
            (yb == 0, 0, slice(0, Z)),
            (yb == YB - 1, (Y + PY) * Z, slice(BL - Z, BL)),
        ):
            @pl.when(jnp.logical_and(xcond, ycond))
            def _(rows=rows, xsel=xsel, lane_base=lane_base, ysel=ysel):
                hc[...] = (
                    jnp.broadcast_to(acc[:, xsel, ysel], (3, PX, Z)) if edge
                    else jnp.zeros((3, PX, Z), acc.dtype)
                )
                for k in range(PY):
                    cp(hc, rows, pl.ds(lane_base + k * Z, Z))


# ---------------------------------------------------------------------------
# forward kernels
# ---------------------------------------------------------------------------


def _flag_of(d):
    """Unit-regime flag of a displacement block: 1.0 iff every component is
    in [-1, 1) — the same predicate as lddmm._in_unit, reduced in-kernel."""
    ok = jnp.logical_and(d >= -1.0, d < 1.0)
    return jnp.min(jnp.where(ok, 1.0, 0.0))


def _accum_flag(flag_ref, L, val):
    """Accumulate a running min into the resident (1, 1) SMEM flag output
    (constant index map keeps one block live across the whole sequential
    grid; initialized at the first step)."""

    @pl.when(L == 0)
    def _():
        flag_ref[0, 0] = 1.0

    flag_ref[0, 0] = jnp.minimum(flag_ref[0, 0], val)


def _adstar_fwd_kernel_pr(BX, BY, Y, Z, ppad_ref, mpad_ref,
                          out_ref, flag_ref, p_slab, m_slab, sems):
    WL = (BY + 2) * Z
    BL = BY * Z
    n, xb, yb, L, T, ids = eu._yb_linear_step()

    def window(Lq):
        nq, xbq, ybq = ids(Lq)
        # the (BY+2)-window sits centered in the (Y+2*PY) layout: +Z lanes
        return (nq, slice(None), pl.ds(xbq * BX, BX + 16),
                pl.ds(ybq * BL + (PY - 1) * Z, WL))

    slot = eu._db_slabs((ppad_ref, mpad_ref), (p_slab, m_slab), sems,
                        window, L, T)
    psl = p_slab[slot]
    out_ref[0] = eu._adstar_yb_fwd_body(BX, BY, Y, Z, psl, m_slab[slot])
    _accum_flag(flag_ref, L, _flag_of(psl[:, 8 : 8 + BX, Z : Z + BL]))


def _adstar_fwd_kernel_pr_mw(BX, BY, Y, Z, X, ppad_ref, mpad_ref,
                             out_ref, flag_ref, mw_ref, p_slab, m_slab,
                             obuf, hx, hy, hc, sems, osem):
    """VJP-forward variant: also stores the warped-momentum residual in the
    carry layout (zero halo bands — domain-edge mw taps are masked in the
    backward's divergence path)."""
    WL = (BY + 2) * Z
    BL = BY * Z
    n, xb, yb, L, T, ids = eu._yb_linear_step()

    def window(Lq):
        nq, xbq, ybq = ids(Lq)
        return (nq, slice(None), pl.ds(xbq * BX, BX + 16),
                pl.ds(ybq * BL + (PY - 1) * Z, WL))

    slot = eu._db_slabs((ppad_ref, mpad_ref), (p_slab, m_slab), sems,
                        window, L, T)
    psl = p_slab[slot]
    out, mw = eu._adstar_yb_fwd_body(BX, BY, Y, Z, psl, m_slab[slot],
                                     want_mw=True)
    out_ref[0] = out
    _store_padded(mw_ref, n, xb, yb, X, Y, Z, BX, BY, mw,
                  obuf, hx, hy, hc, osem.at[0], edge=False)
    _accum_flag(flag_ref, L, _flag_of(psl[:, 8 : 8 + BX, Z : Z + BL]))


def _compose_fwd_kernel_pr(BX, BY, Y, Z, X, s, ppad_ref, v_ref,
                           out_ref, flag_ref, p_slab,
                           obuf, hx, hy, hc, sems, osem):
    WL = (BY + 2) * Z
    BL = BY * Z
    n, xb, yb, L, T, ids = eu._yb_linear_step()

    def window(Lq):
        nq, xbq, ybq = ids(Lq)
        return (nq, slice(None), pl.ds(xbq * BX, BX + 16),
                pl.ds(ybq * BL + (PY - 1) * Z, WL))

    slot = eu._db_slabs((ppad_ref,), (p_slab,), sems, window, L, T)
    v = v_ref[0]
    acc = eu._compose_yb_fwd_body(BX, BY, Y, Z, s, p_slab[slot], v)
    _store_padded(out_ref, n, xb, yb, X, Y, Z, BX, BY, acc,
                  obuf, hx, hy, hc, osem.at[0], edge=True)
    _accum_flag(flag_ref, L, _flag_of(s * v))


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------


def _adstar_bwd_kernel_pr(BX, BY, Y, Z, X, ppad_ref, mpad_ref, gpad_ref,
                          mwpad_ref, dp_ref, dm_ref, p_slab, m_slab, g_slab,
                          mw_slab, obuf, hx, hy, hc, sems, osem):
    BXW = BX + 16
    WL2 = (BY + 4) * Z
    SL = (BY + 2) * Z
    BL = BY * Z
    n, xb, yb, L, T, ids = wu._yb_linear_step()

    # PY == 2: the 2-halo window IS the layout window (no lane offset);
    # the 1-halo windows (m0, g, residual mw) sit +Z lanes in.
    # Slab-double-buffered like the unpadded yb backward (round 4: the
    # split probe put ~77% of the kernel in DMA stall + shared prep).
    def window(Lq):
        nq, xbq, ybq = ids(Lq)
        base = (nq, slice(None), pl.ds(xbq * BX, BXW))
        return [base + (pl.ds(ybq * BL, WL2),)] + [
            base + (pl.ds(ybq * BL + (PY - 1) * Z, SL),)
        ] * 3

    slot = wu._db_slabs(
        (ppad_ref, mpad_ref, gpad_ref, mwpad_ref),
        (p_slab, m_slab, g_slab, mw_slab), sems, window, L, T,
    )

    def emit_dm(dm):
        _store_padded(dm_ref, n, xb, yb, X, Y, Z, BX, BY, dm,
                      obuf, hx, hy, hc, osem.at[0], edge=False)

    dp = eu._adstar_yb_bwd_body(
        BX, BY, Y, Z, X, xb, yb, p_slab[slot], m_slab[slot], g_slab[slot],
        mw_slab[slot], emit_dm,
    )
    _store_padded(dp_ref, n, xb, yb, X, Y, Z, BX, BY, dp,
                  obuf, hx, hy, hc, osem.at[0], edge=False)


def _compose_bwd_kernel_pr(BX, BY, Y, Z, X, s, ppad_ref, vpad_ref, gpad_ref,
                           dp_ref, dv_ref, p_slab, v_slab, g_slab,
                           obuf, hx, hy, hc, sems, osem):
    BXW = BX + 16
    WL = (BY + 2) * Z
    BL = BY * Z
    n, xb, yb, L, T, ids = eu._yb_linear_step()

    def window(Lq):
        nq, xbq, ybq = ids(Lq)
        return (nq, slice(None), pl.ds(xbq * BX, BXW),
                pl.ds(ybq * BL + (PY - 1) * Z, WL))

    # p, v and g all live in the carry layout here (g is the padded
    # zero-halo carry cotangent — exactly the zero-padded-g contract)
    slot = eu._db_slabs((ppad_ref, vpad_ref, gpad_ref),
                        (p_slab, v_slab, g_slab), sems, window, L, T)
    dp, dv = eu._compose_yb_bwd_body(
        BX, BY, Y, Z, X, s, xb, yb, p_slab[slot], v_slab[slot], g_slab[slot]
    )
    dv_ref[0] = dv
    _store_padded(dp_ref, n, xb, yb, X, Y, Z, BX, BY, dp,
                  obuf, hx, hy, hc, osem.at[0], edge=False)


# ---------------------------------------------------------------------------
# dispatches
# ---------------------------------------------------------------------------


def _out_scratch(BX, BY, Z):
    BL = BY * Z
    return [
        pltpu.VMEM((3, BX, BL), jnp.float32),   # obuf
        pltpu.VMEM((3, PX, BL), jnp.float32),   # hx
        pltpu.VMEM((3, BX, Z), jnp.float32),    # hy
        pltpu.VMEM((3, PX, Z), jnp.float32),    # hc
    ]


def _fwd_blocks_mw(X, Y, Z):
    """(BX, BY) for the mw-emitting forward: the _store_padded scratch
    (obuf + halo bands) rides on top of the double-buffered slabs, so the
    default _fwd_blocks assignment can overflow scoped vmem (measured:
    BX=16/BY=32 at 32x96x128 wanted 16.23M vs the 16M limit).  Shrink BY
    until slabs + store scratch fit the same 15M envelope."""
    BX, BY = eu._fwd_blocks(X, Y, Z)
    while BY > 2:
        slabs = (BX + 16) * (BY + 2) * Z * 104
        store = 4 * 3 * (BY * Z * (BX + PX) + Z * (BX + PX))
        # 14M, not the forwards' 15M: BX=16/BY=32 at Z=128 passes a 15M
        # budget on paper but Mosaic wants 16.23M (measured overflow)
        if slabs + store <= 14 * 1024 * 1024:
            break
        BY //= 2
    return BX, BY


def _adstar_fwd_pr(ppad, mpad, X, Y, Z, want_mw=False):
    N = ppad.shape[0]
    BX, BY = _fwd_blocks_mw(X, Y, Z) if want_mw else eu._fwd_blocks(X, Y, Z)
    BL = BY * Z
    out_shape = [
        jax.ShapeDtypeStruct((N, 3, X, Y * Z), ppad.dtype),
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec(
            (1, 3, BX, BL),
            lambda n, xb, yb: (n, 0, xb, yb),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1),
            lambda n, xb, yb: (0, 0),
            memory_space=pltpu.SMEM,
        ),
    ]
    scratch = [
        pltpu.VMEM((2, 3, BX + 16, (BY + 2) * Z), jnp.float32),
        pltpu.VMEM((2, 3, BX + 16, (BY + 2) * Z), jnp.float32),
    ]
    if want_mw:
        # residual mw in the carry layout (manual DMA store, zero halos)
        out_shape.append(jax.ShapeDtypeStruct(ppad.shape, ppad.dtype))
        out_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
        res = pl.pallas_call(
            partial(_adstar_fwd_kernel_pr_mw, BX, BY, Y, Z, X),
            out_shape=out_shape,
            grid=(N, X // BX, Y // BY),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
            out_specs=out_specs,
            scratch_shapes=scratch + _out_scratch(BX, BY, Z) + [
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.SemaphoreType.DMA((1,)),
            ],
        )(ppad, mpad)
        out, flags, mwpad = res
        return out.reshape(N, 3, X, Y, Z), flags, mwpad
    out, flags = pl.pallas_call(
        partial(_adstar_fwd_kernel_pr, BX, BY, Y, Z),
        out_shape=out_shape,
        grid=(N, X // BX, Y // BY),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=out_specs,
        scratch_shapes=scratch + [
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )(ppad, mpad)
    return out.reshape(N, 3, X, Y, Z), flags


def _compose_fwd_pr(ppad, v, s, X, Y, Z):
    N = ppad.shape[0]
    BX, BY = eu._fwd_blocks(X, Y, Z)
    BL = BY * Z
    out, flags = pl.pallas_call(
        partial(_compose_fwd_kernel_pr, BX, BY, Y, Z, X, s),
        out_shape=[
            jax.ShapeDtypeStruct(ppad.shape, ppad.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        grid=(N, X // BX, Y // BY),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (1, 3, BX, BL),
                lambda n, xb, yb: (n, 0, xb, yb),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (1, 1),
                lambda n, xb, yb: (0, 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 3, BX + 16, (BY + 2) * Z), jnp.float32),
        ] + _out_scratch(BX, BY, Z) + [
            pltpu.SemaphoreType.DMA((2, 1)),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )(ppad, v.reshape(N, 3, X, Y * Z))
    return out, flags


def _adstar_bwd_pr(ppad, mpad, gpad, mwpad, X, Y, Z):
    N = ppad.shape[0]
    BX = eu._pick_bx_bwd(X)
    BY = eu._pick_by_bwd(Y, Z, BX)
    dp, dm = pl.pallas_call(
        partial(_adstar_bwd_kernel_pr, BX, BY, Y, Z, X),
        out_shape=[
            jax.ShapeDtypeStruct(ppad.shape, ppad.dtype),
            jax.ShapeDtypeStruct(ppad.shape, ppad.dtype),
        ],
        grid=(N, X // BX, Y // BY),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
        scratch_shapes=[
            pltpu.VMEM((2, 3, BX + 16, (BY + 4) * Z), jnp.float32),
            pltpu.VMEM((2, 3, BX + 16, (BY + 2) * Z), jnp.float32),
            pltpu.VMEM((2, 3, BX + 16, (BY + 2) * Z), jnp.float32),
            pltpu.VMEM((2, 3, BX + 16, (BY + 2) * Z), jnp.float32),
        ] + _out_scratch(BX, BY, Z) + [
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(ppad, mpad, gpad, mwpad)
    return dp, dm


def _compose_bwd_pr(ppad, vpad, gpad, s, X, Y, Z):
    N = ppad.shape[0]
    BX = eu._pick_bx_bwd(X)
    BY = eu._pick_by_cbwd(Y, Z, BX)
    BL = BY * Z
    dp, dv = pl.pallas_call(
        partial(_compose_bwd_kernel_pr, BX, BY, Y, Z, X, s),
        out_shape=[
            jax.ShapeDtypeStruct(ppad.shape, ppad.dtype),
            jax.ShapeDtypeStruct((N, 3, X, Y * Z), ppad.dtype),
        ],
        grid=(N, X // BX, Y // BY),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3,
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (1, 3, BX, BL),
                lambda n, xb, yb: (n, 0, xb, yb),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 3, BX + 16, (BY + 2) * Z), jnp.float32),
            pltpu.VMEM((2, 3, BX + 16, (BY + 2) * Z), jnp.float32),
            pltpu.VMEM((2, 3, BX + 16, (BY + 2) * Z), jnp.float32),
        ] + _out_scratch(BX, BY, Z) + [
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(ppad, vpad, gpad)
    return dp, dv.reshape(N, 3, X, Y, Z)


# ---------------------------------------------------------------------------
# custom-VJP ops
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def ad_star_pr(ppad, mpad, X, Y, Z):
    """Fused ``Ad^*`` on the padded-resident carry: ``ppad``/``mpad`` in the
    carry layout; returns ``(m, flags)`` with ``m`` the unpadded transported
    momentum and ``flags`` the per-block unit-regime indicators (non-diff).
    Bit-identical to :func:`epdiff_unit.ad_star_unit_pallas` in its regime.
    """
    return _adstar_fwd_pr(ppad, mpad, X, Y, Z)


def _adstar_pr_fwd(ppad, mpad, X, Y, Z):
    m, flags, mwpad = _adstar_fwd_pr(ppad, mpad, X, Y, Z, want_mw=True)
    return (m, flags), (ppad, mpad, mwpad)


def _adstar_pr_bwd(X, Y, Z, res, cts):
    g, _g_flags = cts  # flags are an indicator output: cotangent ignored
    ppad, mpad, mwpad = res
    gpad = _zero_pad_g(g)
    d_ppad, d_mpad = _adstar_bwd_pr(ppad, mpad, gpad, mwpad, X, Y, Z)
    return d_ppad, d_mpad


ad_star_pr.defvjp(_adstar_pr_fwd, _adstar_pr_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def compose_pr(ppad, v, s, X, Y, Z):
    """Fused ``s*v + phiinv(x + s*v)`` on the padded-resident carry:
    reads/writes the carry layout (edge blocks refresh the halo bands with
    domain-edge replications); returns ``(ppad', flags)``.  Bit-identical
    to :func:`epdiff_unit.compose_disp_vel_pallas` in its regime."""
    return _compose_fwd_pr(ppad, v, s, X, Y, Z)


def _compose_pr_fwd(ppad, v, s, X, Y, Z):
    out, flags = _compose_fwd_pr(ppad, v, s, X, Y, Z)
    return (out, flags), (ppad, v)


def _compose_pr_bwd(s, X, Y, Z, res, cts):
    g, _g_flags = cts  # g is the padded zero-halo carry cotangent
    ppad, v = res
    vpad = pad_carry(v)
    d_ppad, d_v = _compose_bwd_pr(ppad, vpad, g, s, X, Y, Z)
    return d_ppad, d_v


compose_pr.defvjp(_compose_pr_fwd, _compose_pr_bwd)
