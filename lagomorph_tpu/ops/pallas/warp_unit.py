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

_ENABLED = True


def set_pallas_warp(enabled: bool):
    """Globally enable/disable the Pallas tier-1 warp fast path.

    The flag is read at *trace* time: functions already jitted keep the path
    they were traced with (jit caches do not key on it).  Set it before
    building/jitting step functions, or clear their caches to retrace.
    """
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


def _pick_block(X: int, YZ: int = 0) -> int:
    # sublane blocks must be multiples of 8 (Mosaic tiling rule)
    for bx in (8, 16):
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
    if _pick_block(X, Y * Z) == 0:
        return False
    if (Y * Z) % 128 != 0:
        return False
    if Y * Z > 8192:
        # slab working sets exceed scoped VMEM beyond this lane extent;
        # larger volumes take the y-blocked variant below (lane-aligned
        # y-halo windows) or the padded-coverage path
        return False
    C = I_shape[1]
    bx = _pick_block(X, Y * Z)
    # 2x the I slab for the double-buffered slot axis
    vmem = (2 * C * (bx + 16) + 3 * bx + 4 * C * bx) * Y * Z * 4
    return vmem < 12 * 1024 * 1024


_PIPELINE_SLABS = True


def set_pipeline_slabs(enabled: bool):
    """Enable/disable double-buffered slab DMA in the manual-copy kernels
    (trace-time flag, for A/B measurement and debugging)."""
    global _PIPELINE_SLABS
    prev = _PIPELINE_SLABS
    _PIPELINE_SLABS = bool(enabled)
    return prev


def _grid_linear_step(ndim):
    """Linear step index over a sequential lexicographic ``ndim``-axis grid:
    returns ``(ids, L, T, unravel)`` — the per-axis program ids, the linear
    index of this step, the total step count, and a function mapping any
    linear index back to per-axis scalar indices."""
    ids = tuple(pl.program_id(i) for i in range(ndim))
    sizes = tuple(pl.num_programs(i) for i in range(ndim))
    L = ids[0]
    for i in range(1, ndim):
        L = L * sizes[i] + ids[i]
    T = 1
    for s in sizes:
        T = T * s

    def unravel(Lq):
        out = []
        for i in range(ndim - 1, 0, -1):
            out.append(jax.lax.rem(Lq, sizes[i]))
            Lq = jax.lax.div(Lq, sizes[i])
        out.append(Lq)
        return tuple(reversed(out))

    return ids, L, T, unravel


def _yb_linear_step():
    """(n, xb, yb, L, T, unravel) for the standard (N, X//BX, Y//BY) grid."""
    (n, xb, yb), L, T, unravel = _grid_linear_step(3)
    return n, xb, yb, L, T, unravel


def _db_slabs(refs, slabs, sems, window, L, T):
    """Double-buffered manual slab DMA for halo-window kernels.

    The halo windows overlap between grid steps, so they cannot be expressed
    as (disjoint) BlockSpec tiles and Pallas's automatic input pipelining
    does not apply; with plain start-then-wait copies every grid step
    exposed its full slab-DMA latency (measured 29-48%% of kernel time at
    128^3 b4, scripts/dma_stall_probe.py).  This helper hand-pipelines them:
    each ``slabs[i]`` carries a leading slot axis of 2 and ``sems`` is
    ``(2, len(refs))``; step L's copies were started during step L-1 (the
    first step starts its own), step L+1's copies are started into the other
    slot before waiting, and the TPU's sequential lexicographic grid order
    makes the linear step index L the slot selector.

    ``window(Lq)`` maps a linear step index to the index tuple selecting
    that step's HBM window — either one tuple shared by every ref, or a
    list/tuple of per-ref index tuples.  Returns the slot holding step L's
    data."""

    def windows(Lq):
        win = window(Lq)
        if isinstance(win, list):
            return win
        return [win] * len(refs)

    if not _PIPELINE_SLABS:
        wins = windows(L)
        for i, (ref, slab) in enumerate(zip(refs, slabs)):
            pltpu.make_async_copy(
                ref.at[wins[i]], slab.at[0], sems.at[0, i]
            ).start()
        for i, (ref, slab) in enumerate(zip(refs, slabs)):
            pltpu.make_async_copy(
                ref.at[wins[i]], slab.at[0], sems.at[0, i]
            ).wait()
        return 0

    slot = jax.lax.rem(L, 2)

    def start(Lq, s):
        wins = windows(Lq)
        for i, (ref, slab) in enumerate(zip(refs, slabs)):
            pltpu.make_async_copy(
                ref.at[wins[i]], slab.at[s], sems.at[s, i]
            ).start()

    @pl.when(L == 0)
    def _():
        start(L, slot)

    @pl.when(L + 1 < T)
    def _():
        start(L + 1, 1 - slot)

    wins = windows(L)
    for i, (ref, slab) in enumerate(zip(refs, slabs)):
        pltpu.make_async_copy(
            ref.at[wins[i]], slab.at[slot], sems.at[slot, i]
        ).wait()
    return slot


def _fwd_kernel(BX, Y, Z, C, Ipad_ref, disp_ref, out_ref, scratch, sem):
    """Fused 27-tap warp on one (n, x-block), with (Y, Z) flattened into a
    single 128-aligned lane axis.

    X taps come from the x-halo of the DMA'd slab (X is an untiled dim, so
    ±1 slices are legal).  Y taps are lane rolls by Z, Z taps lane rolls by
    1, each with a clamp edge-fix: at the clamped edge the tap value equals
    the unshifted value, so ``tap = where(edge, A, roll(A, -o))``.
    """
    # aligned slab: padded rows [xb*BX, xb*BX + BX + 16); the output block
    # maps to slab-local rows [8, 8+BX)
    (n, xb), L, T, unravel = _grid_linear_step(2)

    def window(Lq):
        nq, xbq = unravel(Lq)
        return (nq, slice(None), pl.ds(xbq * BX, BX + 16), slice(None))

    slot = _db_slabs((Ipad_ref,), (scratch,), sem, window, L, T)
    d = disp_ref[0]  # (3, BX, Y*Z)

    def w(axis, o):
        da = d[axis]
        fa = jnp.floor(da)
        ta = da - fa
        if o == -1:
            return (fa == -1.0).astype(da.dtype) * (1.0 - ta)
        if o == 0:
            return (fa == -1.0).astype(da.dtype) * ta + (
                fa == 0.0
            ).astype(da.dtype) * (1.0 - ta)
        return (fa == 0.0).astype(da.dtype) * ta

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
    slab = scratch[slot]
    W = {(a, o): w(a, o) for a in range(3) for o in (-1, 0, 1)}
    for ox in (-1, 0, 1):
        # x-tap: sublane roll of the slab then an 8-aligned static slice
        # (the wrapped rows land outside the sliced window)
        rolled = pltpu.roll(slab, (-ox) % (BX + 16), 1) if ox != 0 else slab
        base = rolled[:, 8 : 8 + BX, :]
        wx = W[(0, ox)]
        for oy in (-1, 0, 1):
            xy = roll_clamp(base, oy, Z, y_idx, Y)
            wxy = wx * W[(1, oy)]
            for oz in (-1, 0, 1):
                tap = roll_clamp(xy, oz, 1, z_idx, Z)
                acc = acc + (wxy * W[(2, oz)])[None] * tap
    out_ref[0] = acc


def _warp_unit_fwd_pallas(Ipad, disp):
    """Ipad: (N, C, X+16, Y, Z) x-edge-padded; disp: (N, 3, X, Y, Z)."""
    N, C = Ipad.shape[:2]
    X, Y, Z = disp.shape[2:]
    BX = _pick_block(X, Y * Z)
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
            pltpu.VMEM((2, C, BX + 16, Y * Z), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 1)),
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
    shp = (N,) + I.shape[1:]
    if supported(shp, disp.shape, disp.dtype):
        # whole-Y path: pad X by 8 per side (sublane-aligned DMA slabs)
        Ipad = jnp.pad(Ib, [(0, 0), (0, 0), (8, 8), (0, 0), (0, 0)], mode="edge")
        out = _warp_unit_fwd_pallas(Ipad, disp)
    elif yblocked_supported(shp, disp.shape, disp.dtype):
        # y-blocked path: additional 1-voxel y halo pad
        Ipad = jnp.pad(
            Ib, [(0, 0), (0, 0), (8, 8), (1, 1), (0, 0)], mode="edge"
        )
        out = _warp_unit_fwd_yb(Ipad, disp)
    elif padded_supported(shp, disp.shape, disp.dtype):
        # universal-coverage path: end-edge-pad to a kernel geometry, run
        # the kernel there, slice back (bit-exact; see comment above
        # _pad_amounts)
        X, Y, Z = disp.shape[2:]
        px, py, pz, _ = _pad_amounts(X, Y, Z)
        Ipp, dpp = _pad_fields([Ib, disp], px, py, pz, "edge")
        outp = _sdu_fwd(Ipp, dpp)[0]
        out = outp[:, :, :X, :Y, :Z]
    else:
        # no kernel applies (caller bypassed fastpath_supported): fall back
        # to the identical-discretization XLA formulation
        from ..sampling import sample_displacement_unit

        out = sample_displacement_unit(I, disp)
    return out, (I, disp)


def _sdu_bwd(res, g):
    I, disp = res
    N = disp.shape[0]
    broadcasting = I.shape[0] == 1 and N > 1
    shp = (N,) + I.shape[1:]
    if len(disp.shape) != 5:
        # non-3D (e.g. 2D): no kernel geometry — XLA formulation's VJP
        from ..sampling import sample_displacement_unit

        _, vjp = jax.vjp(sample_displacement_unit, I, disp)
        return vjp(g)
    X, Y, Z = disp.shape[2:]
    if supported(shp, disp.shape, disp.dtype):
        Ib = jnp.broadcast_to(I, shp) if broadcasting else I
        Ipad = jnp.pad(Ib, [(0, 0), (0, 0), (8, 8), (0, 0), (0, 0)], mode="edge")
        zpad = [(0, 0), (0, 0), (8, 8), (0, 0), (0, 0)]
        gpad = jnp.pad(g, zpad)  # zero pad
        dpad = jnp.pad(disp, zpad)
        d_I, d_disp = _warp_unit_bwd_pallas(
            Ipad.reshape(N, -1, X + 16, Y * Z),
            gpad.reshape(N, -1, X + 16, Y * Z),
            dpad.reshape(N, 3, X + 16, Y * Z),
            X, Y, Z,
        )
        if broadcasting:
            d_I = jnp.sum(d_I, axis=0, keepdims=True)
        return d_I, d_disp
    if yblocked_supported(shp, disp.shape, disp.dtype):
        Ib = jnp.broadcast_to(I, shp) if broadcasting else I
        epad = [(0, 0), (0, 0), (8, 8), (1, 1), (0, 0)]
        Ipad = jnp.pad(Ib, epad, mode="edge")
        gpad = jnp.pad(g, epad)  # zero pad
        dpad = jnp.pad(disp, epad)
        YL = (Y + 2) * Z
        d_I, d_disp = _warp_unit_bwd_yb(
            Ipad.reshape(N, -1, X + 16, YL),
            gpad.reshape(N, -1, X + 16, YL),
            dpad.reshape(N, 3, X + 16, YL),
            X, Y, Z,
        )
        if broadcasting:
            d_I = jnp.sum(d_I, axis=0, keepdims=True)
        return d_I, d_disp
    if padded_supported(shp, disp.shape, disp.dtype):
        px, py, pz, _ = _pad_amounts(X, Y, Z)
        Ipp, dpp = _pad_fields([I, disp], px, py, pz, "edge")
        (gpp,) = _pad_fields([g], px, py, pz, "constant")
        d_Ip, d_dp = _sdu_bwd((Ipp, dpp), gpp)
        d_I = _fold_unpad(d_Ip, X, Y, Z)
        d_disp = d_dp[:, :, :X, :Y, :Z]
        return d_I, d_disp
    # fallback: the XLA formulation's VJP (identical discretization)
    from ..sampling import sample_displacement_unit

    _, vjp = jax.vjp(sample_displacement_unit, I, disp)
    return vjp(g)


sample_displacement_unit_pallas.defvjp(_sdu_fwd, _sdu_bwd)


# ---------------------------------------------------------------------------
# Fused backward kernel
# ---------------------------------------------------------------------------


def _make_ws(d_ref):
    """Lazy per-axis weight/derivative factories reading from a VMEM ref."""

    def w_s(axis, o):
        da = d_ref[axis]
        fa = jnp.floor(da)
        ta = da - fa
        if o == -1:
            return (fa == -1.0).astype(da.dtype) * (1.0 - ta)
        if o == 0:
            return (fa == -1.0).astype(da.dtype) * ta + (
                fa == 0.0
            ).astype(da.dtype) * (1.0 - ta)
        return (fa == 0.0).astype(da.dtype) * ta

    def dw_s(axis, o):
        da = d_ref[axis]
        fa = jnp.floor(da)
        if o == -1:
            return -(fa == -1.0).astype(da.dtype)
        if o == 0:
            return (fa == -1.0).astype(da.dtype) - (fa == 0.0).astype(da.dtype)
        return (fa == 0.0).astype(da.dtype)

    return w_s, dw_s


def _bwd_dI_kernel(BX, Y, Z, C, X,
                   gpad_ref, dpad_ref, dI_ref, g_slab, d_slab, sems):
    """d_I[v] = sum_o T_o(w_o * g)[v]: per-axis shift-transposes of the
    weighted cotangent with clamp edge-folds.  Zero-padded g makes
    out-of-domain contributions vanish; one (n, x-block, channel) per grid
    step keeps the slab working set within scoped VMEM."""
    n = pl.program_id(0)
    xb = pl.program_id(1)
    c = pl.program_id(2)
    YZ = Y * Z

    cp1 = pltpu.make_async_copy(
        gpad_ref.at[n, c, pl.ds(xb * BX, BX + 16), :], g_slab, sems.at[0]
    )
    cp2 = pltpu.make_async_copy(
        dpad_ref.at[n, :, pl.ds(xb * BX, BX + 16), :], d_slab, sems.at[1]
    )
    cp1.start(); cp2.start()
    cp1.wait(); cp2.wait()

    w_s, _ = _make_ws(d_slab)

    blk_shape = (BX, YZ)
    lane_b = jax.lax.broadcasted_iota(jnp.int32, blk_shape, 1)
    y_idx_b = lane_b // Z
    z_idx_b = lane_b - y_idx_b * Z
    row_b = jax.lax.broadcasted_iota(jnp.int32, blk_shape, 0)
    gx_b = row_b + xb * BX

    # hoisted weights (9 computes, not 81) and clamp-fold masks
    Ws = {(a, o): w_s(a, o) for a in range(3) for o in (-1, 0, 1)}
    gs = g_slab[...]
    x_lo, x_hi = gx_b == 0, gx_b == X - 1

    # per-axis transposes factored over the offset sum (x at 27, y at 9,
    # z at 3): sum_o Tz Ty Tx P_o = sum_oz Tz[ sum_oy Ty[ sum_ox Tx P ]]
    accs_xy = {}
    for ox in (-1, 0, 1):
        wx = Ws[(0, ox)]
        for oy in (-1, 0, 1):
            wxy = wx * Ws[(1, oy)]
            for oz in (-1, 0, 1):
                P = (wxy * Ws[(2, oz)]) * gs
                Pr = pltpu.roll(P, ox % (BX + 16), 0) if ox != 0 else P
                A = Pr[8 : 8 + BX, :]
                if ox != 0:
                    edge = x_lo if ox == -1 else x_hi
                    A = A + jnp.where(edge, P[8 : 8 + BX, :], 0.0)
                key = (oy, oz)
                accs_xy[key] = A if key not in accs_xy else accs_xy[key] + A

    acc_dI = jnp.zeros(blk_shape, dtype=g_slab.dtype)
    for oz in (-1, 0, 1):
        acc_z = jnp.zeros(blk_shape, dtype=g_slab.dtype)
        for oy in (-1, 0, 1):
            A = accs_xy[(oy, oz)]
            if oy != 0:
                wrap = (y_idx_b == 0) if oy == 1 else (y_idx_b == Y - 1)
                Ar = pltpu.roll(A, (oy * Z) % YZ, 1)
                A2 = jnp.where(wrap, 0.0, Ar)
                edge = (y_idx_b == 0) if oy == -1 else (y_idx_b == Y - 1)
                A = A2 + jnp.where(edge, A, 0.0)
            acc_z = acc_z + A
        if oz != 0:
            wrap = (z_idx_b == 0) if oz == 1 else (z_idx_b == Z - 1)
            Ar = pltpu.roll(acc_z, oz % YZ, 1)
            A2 = jnp.where(wrap, 0.0, Ar)
            edge = (z_idx_b == 0) if oz == -1 else (z_idx_b == Z - 1)
            acc_z = A2 + jnp.where(edge, acc_z, 0.0)
        acc_dI = acc_dI + acc_z
    dI_ref[0, 0] = acc_dI


def _bwd_dD_kernel(BX, Y, Z, C, X,
                   Ipad_ref, gpad_ref, dpad_ref, dD_ref,
                   I_slab, g_blk, d_blk, sems):
    """d_disp[a] = sum_o dw_a(o_a) * prod_{b!=a} w_b(o_b) * g * I_tap_o.

    Grid (N, XB); channels are looped inside the kernel (single-buffered
    manual DMAs) so the accumulation happens in registers — no output
    revisiting and a small scoped-VMEM footprint."""
    n = pl.program_id(0)
    xb = pl.program_id(1)
    YZ = Y * Z

    cpd = pltpu.make_async_copy(
        dpad_ref.at[n, :, pl.ds(xb * BX + 8, BX), :], d_blk, sems.at[2]
    )
    cpd.start()

    blk_shape = (BX, YZ)
    lane_b = jax.lax.broadcasted_iota(jnp.int32, blk_shape, 1)
    y_idx_b = lane_b // Z
    z_idx_b = lane_b - y_idx_b * Z

    def roll_clamp_b(A, o, step, idx, n_axis):
        if o == 0:
            return A
        rolled = pltpu.roll(A, (-o * step) % YZ, 1)
        edge = idx == (n_axis - 1 if o == 1 else 0)
        return jnp.where(edge, A, rolled)

    cpd.wait()

    def wc(axis, o):
        da = d_blk[axis]
        fa = jnp.floor(da)
        ta = da - fa
        if o == -1:
            return (fa == -1.0).astype(da.dtype) * (1.0 - ta)
        if o == 0:
            return (fa == -1.0).astype(da.dtype) * ta + (
                fa == 0.0
            ).astype(da.dtype) * (1.0 - ta)
        return (fa == 0.0).astype(da.dtype) * ta

    def dwc(axis, o):
        da = d_blk[axis]
        fa = jnp.floor(da)
        if o == -1:
            return -(fa == -1.0).astype(da.dtype)
        if o == 0:
            return (fa == -1.0).astype(da.dtype) - (fa == 0.0).astype(da.dtype)
        return (fa == 0.0).astype(da.dtype)

    # weights/dweights are channel-independent: hoist them out of the
    # channel AND tap loops (9+9 computes instead of 5 per (channel, tap)),
    # with the triple products factored at the oy level
    Wc = {(a, o): wc(a, o) for a in range(3) for o in (-1, 0, 1)}
    dWc = {(a, o): dwc(a, o) for a in range(3) for o in (-1, 0, 1)}

    acc_d = [jnp.zeros(blk_shape, dtype=jnp.float32) for _ in range(3)]
    for c in range(C):
        cpi = pltpu.make_async_copy(
            Ipad_ref.at[n, c, pl.ds(xb * BX, BX + 16), :], I_slab, sems.at[0]
        )
        cpg = pltpu.make_async_copy(
            gpad_ref.at[n, c, pl.ds(xb * BX + 8, BX), :], g_blk, sems.at[1]
        )
        cpi.start(); cpg.start()
        cpi.wait(); cpg.wait()
        g_ctr = g_blk[...]
        for ox in (-1, 0, 1):
            base = (
                pltpu.roll(I_slab[...], (-ox) % (BX + 16), 0)
                if ox != 0
                else I_slab[...]
            )
            base = base[8 : 8 + BX, :]
            for oy in (-1, 0, 1):
                xy = roll_clamp_b(base, oy, Z, y_idx_b, Y)
                a_xy = dWc[(0, ox)] * Wc[(1, oy)]
                b_xy = Wc[(0, ox)] * dWc[(1, oy)]
                c_xy = Wc[(0, ox)] * Wc[(1, oy)]
                for oz in (-1, 0, 1):
                    tap = roll_clamp_b(xy, oz, 1, z_idx_b, Z)
                    gt = g_ctr * tap
                    t2 = Wc[(2, oz)] * gt
                    acc_d[0] = acc_d[0] + a_xy * t2
                    acc_d[1] = acc_d[1] + b_xy * t2
                    acc_d[2] = acc_d[2] + c_xy * (dWc[(2, oz)] * gt)

    dD_ref[0] = jnp.stack(acc_d, axis=0)


def _warp_unit_bwd_pallas(Ipad, gpad, dpad, X, Y, Z):
    """Ipad: (N,C,X+16,YZ) edge-padded; gpad/dpad zero-padded (C / 3 chans).
    Returns (d_I (N,C,X,Y,Z), d_disp (N,3,X,Y,Z))."""
    N, C = Ipad.shape[:2]
    BX = _pick_block(X, Y * Z)
    grid = (N, X // BX, C)
    YZ = Y * Z

    dI = pl.pallas_call(
        partial(_bwd_dI_kernel, BX, Y, Z, C, X),
        out_shape=jax.ShapeDtypeStruct((N, C, X, YZ), Ipad.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, BX, YZ),
            lambda n, xb, c: (n, c, xb, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((BX + 16, YZ), jnp.float32),
            pltpu.VMEM((3, BX + 16, YZ), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(gpad, dpad)

    dD = pl.pallas_call(
        partial(_bwd_dD_kernel, BX, Y, Z, C, X),
        out_shape=jax.ShapeDtypeStruct((N, 3, X, YZ), Ipad.dtype),
        grid=(N, X // BX),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 3, BX, YZ),
            lambda n, xb: (n, 0, xb, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((BX + 16, YZ), jnp.float32),
            pltpu.VMEM((BX, YZ), jnp.float32),
            pltpu.VMEM((3, BX, YZ), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )(Ipad, gpad, dpad)
    return dI.reshape(N, C, X, Y, Z), dD.reshape(N, 3, X, Y, Z)


# ---------------------------------------------------------------------------
# Y-blocked kernel variants (for lane extents beyond scoped VMEM; require
# Z % 128 == 0 so y-halo windows stay lane-aligned)
# ---------------------------------------------------------------------------


def _pick_by(Y: int, Z: int) -> int:
    # keep the window (BY+2)*Z lanes around 4-8K lanes
    for by in (32, 16, 64, 8, 4, 2):
        if Y % by == 0 and (by + 2) * Z <= 10240:
            return by
    return 0


def yblocked_supported(I_shape, disp_shape, dtype) -> bool:
    if not pallas_warp_enabled():
        return False
    if dtype != jnp.float32:
        return False
    if len(disp_shape) != 5 or disp_shape[1] != 3:
        return False
    X, Y, Z = disp_shape[2:]
    return (
        Z % 128 == 0
        and _pick_block(X) != 0
        and _pick_by(Y, Z) != 0
    )


def _fwd_kernel_yb(BX, BY, Y, Z, C, Ipad_ref, disp_ref, out_ref, scratch, sem):
    """Forward warp, y-blocked: I window carries x- and y-halos (edge pad),
    y-taps are window lane-rolls by Z followed by an aligned center slice,
    z-taps lane rolls by 1 with z-edge masks."""
    WL = (BY + 2) * Z  # window lanes
    BL = BY * Z        # center lanes
    n, xb, yb, L, T, ids = _yb_linear_step()

    def window(Lq):
        nq, xbq, ybq = ids(Lq)
        return (nq, slice(None), pl.ds(xbq * BX, BX + 16),
                pl.ds(ybq * BL, WL))

    slot = _db_slabs((Ipad_ref,), (scratch,), sem, window, L, T)
    d = disp_ref[0]  # (3, BX, BL)

    def w(axis, o):
        da = d[axis]
        fa = jnp.floor(da)
        ta = da - fa
        if o == -1:
            return (fa == -1.0).astype(da.dtype) * (1.0 - ta)
        if o == 0:
            return (fa == -1.0).astype(da.dtype) * ta + (
                fa == 0.0
            ).astype(da.dtype) * (1.0 - ta)
        return (fa == 0.0).astype(da.dtype) * ta

    shape = (C, BX, BL)
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

    slab = scratch[slot]
    acc = jnp.zeros(shape, dtype=d.dtype)
    W = {(a, o): w(a, o) for a in range(3) for o in (-1, 0, 1)}
    for ox in (-1, 0, 1):
        rx = pltpu.roll(slab, (-ox) % (BX + 16), 1) if ox != 0 else slab
        bx_rows = rx[:, 8 : 8 + BX, :]
        wx = W[(0, ox)]
        for oy in (-1, 0, 1):
            ry = (
                pltpu.roll(bx_rows, (-oy * Z) % WL, 2) if oy != 0 else bx_rows
            )
            ctr = ry[:, :, Z : Z + BL]
            wxy = wx * W[(1, oy)]
            for oz in (-1, 0, 1):
                tap = ztap(ctr, oz)
                acc = acc + (wxy * W[(2, oz)])[None] * tap
    out_ref[0] = acc


def _warp_unit_fwd_yb(Ipad, disp):
    """Ipad: (N, C, X+16, Y+2, Z) x/y-edge-padded; disp: (N, 3, X, Y, Z)."""
    N, C = Ipad.shape[:2]
    X, Y, Z = disp.shape[2:]
    # BX=16 halves the x-halo read amplification (block sweep, 128^3 b4),
    # within the known-good scoped-VMEM envelope (32 rows x 34*128 lanes)
    BY_est = _pick_by(Y, Z)
    BX = (
        16
        if X % 16 == 0 and 32 * (BY_est + 2) * Z <= 32 * 34 * 128
        else _pick_block(X)
    )
    BY = _pick_by(Y, Z)
    BL = BY * Z
    grid = (N, X // BX, Y // BY)
    Ipad_f = Ipad.reshape(N, C, X + 16, (Y + 2) * Z)
    disp_f = disp.reshape(N, 3, X, Y * Z)
    out = pl.pallas_call(
        partial(_fwd_kernel_yb, BX, BY, Y, Z, C),
        out_shape=jax.ShapeDtypeStruct((N, C, X, Y * Z), Ipad.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (1, 3, BX, BL),
                lambda n, xb, yb: (n, 0, xb, yb),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, C, BX, BL),
            lambda n, xb, yb: (n, 0, xb, yb),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, C, BX + 16, (BY + 2) * Z), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 1)),
        ],
    )(Ipad_f, disp_f)
    return out.reshape(N, C, X, Y, Z)


def _bwd_dI_kernel_yb(BX, BY, Y, Z, C, X,
                      gpad_ref, dpad_ref, dI_ref, g_slab, d_slab, sems):
    """Y-blocked d_I: transposed weighted stencil over an x/y-haloed window
    of zero-padded (w_o * g)."""
    WL = (BY + 2) * Z
    BL = BY * Z
    (n, xb, yb, c), L, T, unravel = _grid_linear_step(4)

    def window(Lq):
        nq, xbq, ybq, cq = unravel(Lq)
        span = (pl.ds(xbq * BX, BX + 16), pl.ds(ybq * BL, WL))
        return [(nq, cq) + span, (nq, slice(None)) + span]

    slot = _db_slabs((gpad_ref, dpad_ref), (g_slab, d_slab), sems,
                     window, L, T)
    dsl = d_slab[slot]

    def w_s(axis, o):
        da = dsl[axis]
        fa = jnp.floor(da)
        ta = da - fa
        if o == -1:
            return (fa == -1.0).astype(da.dtype) * (1.0 - ta)
        if o == 0:
            return (fa == -1.0).astype(da.dtype) * ta + (
                fa == 0.0
            ).astype(da.dtype) * (1.0 - ta)
        return (fa == 0.0).astype(da.dtype) * ta

    blk_shape = (BX, BL)
    lane_b = jax.lax.broadcasted_iota(jnp.int32, blk_shape, 1)
    gy_b = lane_b // Z + yb * BY  # global y of center lanes
    z_idx_b = lane_b % Z
    row_b = jax.lax.broadcasted_iota(jnp.int32, blk_shape, 0)
    gx_b = row_b + xb * BX

    # x-edge mask broadcast across the window lanes
    row_w = jax.lax.broadcasted_iota(jnp.int32, (BX, WL), 0)
    gx_w = row_w + xb * BX

    # hoisted weights (9 computes, not 81) and clamp-fold masks
    Ws = {(a, o): w_s(a, o) for a in range(3) for o in (-1, 0, 1)}
    gs = g_slab[slot]
    xw_lo, xw_hi = gx_w == 0, gx_w == X - 1

    # factored per-axis transposes (x at 27, y at 9, z at 3)
    accs_xy = {}
    for ox in (-1, 0, 1):
        wx = Ws[(0, ox)]
        for oy in (-1, 0, 1):
            wxy = wx * Ws[(1, oy)]
            for oz in (-1, 0, 1):
                P = (wxy * Ws[(2, oz)]) * gs
                # x transpose on the window (core shift + clamp edge fold)
                Pr = pltpu.roll(P, ox % (BX + 16), 0) if ox != 0 else P
                Bw = Pr[8 : 8 + BX, :]  # (BX, WL)
                if ox != 0:
                    Bw = Bw + jnp.where(
                        xw_lo if ox == -1 else xw_hi,
                        P[8 : 8 + BX, :], 0.0,
                    )
                key = (oy, oz)
                accs_xy[key] = Bw if key not in accs_xy else accs_xy[key] + Bw

    acc_dI = jnp.zeros(blk_shape, dtype=jnp.float32)
    for oz in (-1, 0, 1):
        acc_z = jnp.zeros(blk_shape, dtype=jnp.float32)
        for oy in (-1, 0, 1):
            Bw = accs_xy[(oy, oz)]
            # y transpose: window roll by +oy*Z, center slice (zero pad
            # swallows out-of-domain; wraps land outside the center)
            Ar = pltpu.roll(Bw, (oy * Z) % WL, 1) if oy != 0 else Bw
            A = Ar[:, Z : Z + BL]
            if oy != 0:
                yedge = (gy_b == 0) if oy == -1 else (gy_b == Y - 1)
                A = A + jnp.where(yedge, Bw[:, Z : Z + BL], 0.0)
            acc_z = acc_z + A
        # z transpose on the center block
        if oz != 0:
            wrap = (z_idx_b == 0) if oz == 1 else (z_idx_b == Z - 1)
            Az = pltpu.roll(acc_z, oz % BL, 1)
            A2 = jnp.where(wrap, 0.0, Az)
            zedge = (z_idx_b == 0) if oz == -1 else (z_idx_b == Z - 1)
            acc_z = A2 + jnp.where(zedge, acc_z, 0.0)
        acc_dI = acc_dI + acc_z
    dI_ref[0, 0] = acc_dI


def _bwd_dD_kernel_yb(BX, BY, Y, Z, C, X,
                      Ipad_ref, gpad_ref, dpad_ref, dD_ref,
                      I_slab, g_blk, d_blk, sems_c, sems_d):
    """Y-blocked d_disp: forward-style taps from the x/y-haloed edge-padded
    I window; channel loop inside the kernel."""
    n = pl.program_id(0)
    xb = pl.program_id(1)
    WL = (BY + 2) * Z
    BL = BY * Z
    n, xb, yb, L, T, ids = _yb_linear_step()

    def dwindow(Lq):
        nq, xbq, ybq = ids(Lq)
        return (nq, slice(None), pl.ds(xbq * BX + 8, BX),
                pl.ds(ybq * BL + Z, BL))

    dslot = _db_slabs((dpad_ref,), (d_blk,), sems_d, dwindow, L, T)
    dsl = d_blk[dslot]

    blk_shape = (BX, BL)
    lane_b = jax.lax.broadcasted_iota(jnp.int32, blk_shape, 1)
    z_idx_b = lane_b % Z

    def ztap(A, oz):
        if oz == 0:
            return A
        rolled = pltpu.roll(A, (-oz) % BL, 1)
        edge = z_idx_b == (Z - 1 if oz == 1 else 0)
        return jnp.where(edge, A, rolled)

    def wc(axis, o):
        da = dsl[axis]
        fa = jnp.floor(da)
        ta = da - fa
        if o == -1:
            return (fa == -1.0).astype(da.dtype) * (1.0 - ta)
        if o == 0:
            return (fa == -1.0).astype(da.dtype) * ta + (
                fa == 0.0
            ).astype(da.dtype) * (1.0 - ta)
        return (fa == 0.0).astype(da.dtype) * ta

    def dwc(axis, o):
        da = dsl[axis]
        fa = jnp.floor(da)
        if o == -1:
            return -(fa == -1.0).astype(da.dtype)
        if o == 0:
            return (fa == -1.0).astype(da.dtype) - (fa == 0.0).astype(da.dtype)
        return (fa == 0.0).astype(da.dtype)

    # channel-independent weights/dweights hoisted out of both loops, with
    # the triple products factored at the oy level
    Wc = {(a, o): wc(a, o) for a in range(3) for o in (-1, 0, 1)}
    dWc = {(a, o): dwc(a, o) for a in range(3) for o in (-1, 0, 1)}

    # (step, channel)-granular double-buffering of the per-channel I window
    # and g block: channel c's copies start during channel c-1 (or, for
    # c=0, during the previous grid step's last channel); the linear
    # (step, channel) index L*C + c selects the slot.
    def cwins(Lq, cq):
        nq, xbq, ybq = ids(Lq)
        return (
            (nq, cq, pl.ds(xbq * BX, BX + 16), pl.ds(ybq * BL, WL)),
            (nq, cq, pl.ds(xbq * BX + 8, BX), pl.ds(ybq * BL + Z, BL)),
        )

    def cstart(Lq, cq, s):
        wI, wg = cwins(Lq, cq)
        pltpu.make_async_copy(Ipad_ref.at[wI], I_slab.at[s],
                              sems_c.at[s, 0]).start()
        pltpu.make_async_copy(gpad_ref.at[wg], g_blk.at[s],
                              sems_c.at[s, 1]).start()

    acc_d = [jnp.zeros(blk_shape, dtype=jnp.float32) for _ in range(3)]
    for c in range(C):
        cslot = jax.lax.rem(L * C + c, 2)
        if not _PIPELINE_SLABS:
            cslot = 0
            cstart(L, c, cslot)
        else:
            if c == 0:
                @pl.when(L == 0)
                def _():
                    cstart(L, 0, cslot)
            if c + 1 < C:
                cstart(L, c + 1, 1 - cslot)
            else:
                @pl.when(L + 1 < T)
                def _():
                    cstart(L + 1, 0, 1 - cslot)
        wI, wg = cwins(L, c)
        pltpu.make_async_copy(Ipad_ref.at[wI], I_slab.at[cslot],
                              sems_c.at[cslot, 0]).wait()
        pltpu.make_async_copy(gpad_ref.at[wg], g_blk.at[cslot],
                              sems_c.at[cslot, 1]).wait()
        Isl = I_slab[cslot]
        g_ctr = g_blk[cslot]
        for ox in (-1, 0, 1):
            rx = (
                pltpu.roll(Isl, (-ox) % (BX + 16), 0)
                if ox != 0
                else Isl
            )
            bx_rows = rx[8 : 8 + BX, :]  # (BX, WL)
            for oy in (-1, 0, 1):
                ry = (
                    pltpu.roll(bx_rows, (-oy * Z) % WL, 1)
                    if oy != 0
                    else bx_rows
                )
                ctr = ry[:, Z : Z + BL]
                a_xy = dWc[(0, ox)] * Wc[(1, oy)]
                b_xy = Wc[(0, ox)] * dWc[(1, oy)]
                c_xy = Wc[(0, ox)] * Wc[(1, oy)]
                for oz in (-1, 0, 1):
                    tap = ztap(ctr, oz)
                    gt = g_ctr * tap
                    t2 = Wc[(2, oz)] * gt
                    acc_d[0] = acc_d[0] + a_xy * t2
                    acc_d[1] = acc_d[1] + b_xy * t2
                    acc_d[2] = acc_d[2] + c_xy * (dWc[(2, oz)] * gt)

    dD_ref[0] = jnp.stack(acc_d, axis=0)


def _warp_unit_bwd_yb(Ipad, gpad, dpad, X, Y, Z):
    """Y-blocked backward.  Ipad: (N,C,X+16,(Y+2)Z) edge-padded; gpad/dpad
    zero-padded in x (8) and y (1)."""
    N, C = Ipad.shape[:2]
    BX = _pick_block(X)
    BY = _pick_by(Y, Z)
    BL = BY * Z
    WL = (BY + 2) * Z
    YZ = Y * Z

    dI = pl.pallas_call(
        partial(_bwd_dI_kernel_yb, BX, BY, Y, Z, C, X),
        out_shape=jax.ShapeDtypeStruct((N, C, X, YZ), Ipad.dtype),
        grid=(N, X // BX, Y // BY, C),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, BX, BL),
            lambda n, xb, yb, c: (n, c, xb, yb),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, BX + 16, WL), jnp.float32),
            pltpu.VMEM((2, 3, BX + 16, WL), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )(gpad, dpad)

    dD = pl.pallas_call(
        partial(_bwd_dD_kernel_yb, BX, BY, Y, Z, C, X),
        out_shape=jax.ShapeDtypeStruct((N, 3, X, YZ), Ipad.dtype),
        grid=(N, X // BX, Y // BY),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 3, BX, BL),
            lambda n, xb, yb: (n, 0, xb, yb),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, BX + 16, WL), jnp.float32),
            pltpu.VMEM((2, BX, BL), jnp.float32),
            pltpu.VMEM((2, 3, BX, BL), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 1)),
        ],
    )(Ipad, gpad, dpad)
    return dI.reshape(N, C, X, Y, Z), dD.reshape(N, 3, X, Y, Z)


# ---------------------------------------------------------------------------
# Universal shape coverage: edge-pad to a kernel-compatible geometry
# ---------------------------------------------------------------------------
#
# The whole-Y kernel needs (Y*Z) % 128 == 0 (lane tiling) and the y-blocked
# kernel needs Z % 128 == 0 (lane-aligned y-halo windows).  For other shapes
# (96^3, 160^3, anisotropic, odd) we edge-pad the *end* of each offending
# axis, run the kernel on the padded geometry, and slice back.  Edge padding
# preserves CLAMP semantics bit-exactly: a logical tap past the old edge
# reads the replicated edge value, which IS the clamped value; in the
# backward, that tap's mass lands on the first padded plane and is folded
# back onto the edge (only one plane can receive mass since |tap| <= 1).

_MAX_PAD_RATIO = 2.0  # padded/logical voxels beyond which XLA tiers win
# (at ~2x padded traffic the fused kernel and the XLA stencil tier roughly
# break even; 130^3 pads Z to 256 at ratio 1.97 and still wins)


def _pad_amounts(X: int, Y: int, Z: int):
    """Edge-padding (px, py, pz, whole_y) reaching a supported geometry, or
    None.  Prefers the whole-Y kernel (small lane extents), else y-blocked."""
    px = (-X) % 8
    # whole-Y: pad Z minimally so (Y * Z') % 128 == 0, if the padded lane
    # extent stays within the whole-Y working-set bound
    step = 128 // np.gcd(Y, 128)
    Zw = -(-Z // step) * step
    if Y * Zw <= 8192:
        return px, 0, Zw - Z, True
    # y-blocked: Z' to a multiple of 128, Y' minimally so a block size exists
    Zb = -(-Z // 128) * 128
    py = 0
    while _pick_by(Y + py, Zb) == 0 and py < 64:
        py += 1
    if _pick_by(Y + py, Zb) == 0:
        return None
    return px, py, Zb - Z, False


def padded_supported(I_shape, disp_shape, dtype) -> bool:
    """True when the op can run through a kernel after end-edge padding with
    acceptable overhead."""
    if not pallas_warp_enabled():
        return False
    if dtype != jnp.float32:
        return False
    if len(disp_shape) != 5 or disp_shape[1] != 3:
        return False
    X, Y, Z = disp_shape[2:]
    if X < 2 or Y < 2 or Z < 2:
        return False
    amounts = _pad_amounts(X, Y, Z)
    if amounts is None:
        return False
    px, py, pz, whole_y = amounts
    ratio = ((X + px) * (Y + py) * (Z + pz)) / float(X * Y * Z)
    if ratio > _MAX_PAD_RATIO:
        return False
    if whole_y:
        C = I_shape[1]
        bx = _pick_block(X + px)
        YZ = (Y + py) * (Z + pz)
        vmem = (C * (bx + 16) + 3 * bx + 4 * C * bx) * YZ * 4
        return bx != 0 and vmem < 12 * 1024 * 1024
    return True


def _pad_fields(arrs, px, py, pz, mode):
    widths = [(0, 0), (0, 0), (0, px), (0, py), (0, pz)]
    return [jnp.pad(a, widths, mode=mode) for a in arrs]


def _fold_unpad(d, X, Y, Z):
    """Transpose of the end-edge-pad for |tap| <= 1 stencils: fold the first
    padded plane of each axis back onto the edge, then slice."""
    if d.shape[2] > X:
        d = d[:, :, : X + 1]
        d = d.at[:, :, X - 1].add(d[:, :, X])[:, :, :X]
    if d.shape[3] > Y:
        d = d[:, :, :, : Y + 1]
        d = d.at[:, :, :, Y - 1].add(d[:, :, :, Y])[:, :, :, :Y]
    if d.shape[4] > Z:
        d = d[..., : Z + 1]
        d = d.at[..., Z - 1].add(d[..., Z])[..., :Z]
    return d


def fastpath_supported(I_shape, disp_shape, dtype) -> bool:
    """True when a fused kernel path applies (directly or via padding)."""
    return (
        supported(I_shape, disp_shape, dtype)
        or yblocked_supported(I_shape, disp_shape, dtype)
        or padded_supported(I_shape, disp_shape, dtype)
    )
