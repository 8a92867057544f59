"""Whole-shoot 2D Pallas mega-kernel: the full EPDiff geodesic integration
in ONE kernel launch with every field VMEM-resident.

Motivation (round 4): at 2D bench shapes (256^2 b8) a vector field is only
0.5 MB/batch-element, so every per-op kernel in the shooting loop is
dispatch/fixed-cost bound — the step_decomp2d component timings are all
below measurement noise while the full atlas step costs ~3 ms.  The
TPU-native fix is to stop launching ~25 kernels per step: this module runs
the whole ``T``-step integration (Ad* warp -> fluid sharp -> compose) as a
single ``pallas_call`` over the batch grid, with the fluid solve done
in-kernel as packed-complex DFT matmuls on the MXU (the 2-channel 2D field
packs as one complex plane: the multiplier is real and even in k, the same
identity behind ops/fluid's packed-pair path).

The warp/compose tap math reuses :mod:`epdiff2d`'s weight formulas
(`_w2`/`_dw2`/`_ztap`) on whole-(H, W) planes — rolls with CLAMP edge fixes
on BOTH axes replace the x-halo slabs, so no padding exists anywhere.  The
backward is a second mega-kernel running the reverse sweep (compose-bwd ->
fluid (self-adjoint) -> Ad*-bwd) without ever touching HBM between steps.
The forward kernel stashes the trajectory (phiinv_t, v_t, and the pre-
Jacobian warped momentum mw_t) as extra HBM outputs that the custom-VJP
carries as residuals: the backward neither replays the forward nor
recomputes mw — the round-4 3D finding (the stencil backwards are
ROLL-bound, not mult-bound) says those recomputes were the kernel's cost.

Semantics mirror lddmm._expmap_fast_flagged exactly (same reference
discretization: interp.cu trilinear CLAMP + diff.cu central differences,
2D): a unit-regime validity flag is min-reduced in-kernel and the caller
falls back to the general tier when it trips.  The fluid solve matches
ops/fluid's MXU-DFT numerics (~4e-5 rel), not bit-exact XLA fftn — same
contract as the 3D fft_unit default.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import warp_unit as wu
from . import epdiff2d as e2
from . import fft_unit as fu

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except ImportError:  # pragma: no cover
    _HAVE_PALLAS = False


_ENABLED = True


def set_shoot2d(enabled: bool):
    """Enable/disable the whole-shoot 2D mega-kernel (trace-time flag)."""
    global _ENABLED
    prev = _ENABLED
    _ENABLED = bool(enabled)
    return prev


def _budget(H, W, T, stream):
    """Modeled backward-kernel VMEM bytes.  Resident mode keeps all 3T
    stashed trajectory planes as pipeline-double-buffered blocks; streaming
    mode keeps the trajectories in HBM and hand-DMAs one (2, H, W) plane
    per trajectory per step through a 2-slot ring (6 planes total),
    independent of T."""
    if stream:
        planes = 2 * (2 + 2) + 12 + 2 * 3
    else:
        planes = 2 * (2 + 3 * T + 2) + 12
    return (planes * 2 * H * W + 8 * (H * H + W * W) + H * W) * 4


def _stream_mode(H, W, T) -> bool:
    """Stream trajectory planes iff the resident form would not fit the
    80 MB envelope (so bench-validated small shapes keep the byte-identical
    resident kernels).  LAGO_SHOOT2D_STREAM=0/1 forces, for A/Bs."""
    import os

    env = os.environ.get("LAGO_SHOOT2D_STREAM", "")
    if env in ("0", "1"):
        return env == "1"
    return _budget(H, W, T, False) > 80 * 1024 * 1024


def supported(p_shape, dtype, params, T) -> bool:
    """Gate: 2D f32 2-channel fields, lane-aligned W, sublane-aligned H,
    a scalar (beta == 0) fluid multiplier, and a VMEM budget check.

    The budget models the BACKWARD mega-kernel (the larger of the pair):
    grid-indexed blocks (m0, g and the two output fields) are
    double-buffered by the Pallas pipeline, so they count twice; the DFT
    matrices and Mn are grid-invariant (single-buffered); the reverse-sweep
    body keeps ~12 whole-plane temporaries live; and the three stashed
    (T, 2, H, W) trajectories are either pipeline-resident (small shapes)
    or hand-streamed plane-by-plane from HBM (large shapes / deep T —
    admits 512^2, the reference's demo resolution class).  Headroom vs the
    100 MB vmem_limit_bytes the dispatches request is kept at ~20%."""
    if not (_ENABLED and _HAVE_PALLAS and wu.pallas_warp_enabled()):
        return False
    if dtype != jnp.float32:
        return False
    if len(p_shape) != 4 or p_shape[1] != 2:
        return False
    if params is None or len(params) != 3 or float(params[1]) != 0.0:
        return False
    if not isinstance(T, int) or T < 1 or T > 32:
        return False
    H, W = p_shape[2:]
    if H % 8 or W % 128 or H > 512 or W > 512:
        return False
    return _budget(H, W, T, _stream_mode(H, W, T)) <= 80 * 1024 * 1024


# ---------------------------------------------------------------------------
# whole-plane tap helpers (CLAMP on both axes; no halos anywhere)
# ---------------------------------------------------------------------------


def _xtap(A, ox, row_idx, H):
    """Sublane roll by ox with CLAMP edge fix on the H axis (the whole-plane
    analogue of the x-halo slab taps in epdiff2d)."""
    if ox == 0:
        return A
    rolled = pltpu.roll(A, (-ox) % H, 1)
    edge = row_idx == (H - 1 if ox == 1 else 0)
    return jnp.where(edge, A, rolled)


def _row_idx(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def _flag_of(d):
    """1.0 iff every displacement component is in [-1, 1) — the in-kernel
    reduction of lddmm._in_unit."""
    ok = jnp.logical_and(d >= -1.0, d < 1.0)
    return jnp.min(jnp.where(ok, 1.0, 0.0))


# ---------------------------------------------------------------------------
# whole-plane op bodies (same discretization as epdiff2d's windowed kernels)
# ---------------------------------------------------------------------------


def _adstar_body(H, W, phiinv, m0):
    """m_c = sum_a (D_a phiinv_c + delta_ca) m0_a(x + phiinv(x)); per-tap
    association matches epdiff2d._adstar2d_fwd_kernel for bit-identical
    results in the unit regime.  Returns ``(m, mw)`` — the backward kernel
    consumes the stashed pre-Jacobian warp ``mw`` instead of recomputing
    its 12 rolls."""
    shape = (2, H, W)
    z_idx = e2._lane_idx(shape)
    r_idx = _row_idx(shape)
    d = phiinv
    Wd = {(a, o): e2._w2(d, a, o) for a in range(2) for o in (-1, 0, 1)}
    mw = jnp.zeros(shape, dtype=d.dtype)
    for ox in (-1, 0, 1):
        base = _xtap(m0, ox, r_idx, H)
        wx = Wd[(0, ox)]
        for oz in (-1, 0, 1):
            tap = e2._ztap(base, oz, W, z_idx, W)
            mw = mw + (wx * Wd[(1, oz)]) * tap
    Jx = 0.5 * (_xtap(d, 1, r_idx, H) - _xtap(d, -1, r_idx, H))
    Jz = 0.5 * (e2._ztap(d, 1, W, z_idx, W) - e2._ztap(d, -1, W, z_idx, W))
    return mw + Jx * mw[0][None] + Jz * mw[1][None], mw


def _compose_body(H, W, s, phiinv, v):
    """s*v(x) + phiinv(x + s*v(x)); matches epdiff2d._compose2d_fwd_kernel."""
    shape = (2, H, W)
    z_idx = e2._lane_idx(shape)
    r_idx = _row_idx(shape)
    d = s * v
    Wd = {(a, o): e2._w2(d, a, o) for a in range(2) for o in (-1, 0, 1)}
    acc = s * v
    for ox in (-1, 0, 1):
        base = _xtap(phiinv, ox, r_idx, H)
        wx = Wd[(0, ox)]
        for oz in (-1, 0, 1):
            tap = e2._ztap(base, oz, W, z_idx, W)
            acc = acc + (wx * Wd[(1, oz)]) * tap
    return acc


def _fluid_body(m, Mn, mats):
    """Scalar-multiplier fluid apply on a (2, H, W) field via in-kernel DFT
    matmuls: the two channels pack as one complex plane (multiplier real +
    even in k => F^-1(M F(m0 + i m1)) = K m0 + i K m1), W-axis transforms
    are right-multiplications, H-axis are left-multiplications.  Precision
    follows fft_unit's hi/lo bf16 3-pass split (set_fft_mxu_precision)."""
    (hfr, hfi, wfr, wfi, hbr, hbi, wbr, wbi) = mats
    re, im = m[0], m[1]
    re, im = fu._cdot(re, im, wfr, wfi)
    re, im = fu._cdot(re, im, hfr, hfi, left=True)
    re = re * Mn
    im = im * Mn
    re, im = fu._cdot(re, im, hbr, hbi, left=True)
    re, im = fu._cdot(re, im, wbr, wbi)
    return jnp.stack([re, im])


def _adstar_bwd_body(H, W, phiinv, m0, g, mw):
    """Whole-plane transcription of epdiff2d._adstar2d_bwd_kernel: returns
    (d_phiinv, d_m0) for cotangent g of the transported momentum.  ``mw``
    is the forward's stashed pre-Jacobian warp (used by the divergence
    path) — passing it in drops 12 rolls per reverse step."""
    shape = (2, H, W)
    z_idx = e2._lane_idx(shape)
    r_idx = _row_idx(shape)
    z0 = z_idx == 0
    zL = z_idx == W - 1
    r0 = r_idx == 0
    rL = r_idx == H - 1

    Wd = {(a, o): e2._w2(phiinv, a, o) for a in range(2) for o in (-1, 0, 1)}
    DW = {(a, o): e2._dw2(phiinv, a, o) for a in range(2) for o in (-1, 0, 1)}

    Jx = 0.5 * (_xtap(phiinv, 1, r_idx, H) - _xtap(phiinv, -1, r_idx, H))
    Jz = 0.5 * (
        e2._ztap(phiinv, 1, W, z_idx, W) - e2._ztap(phiinv, -1, W, z_idx, W)
    )

    # d_mw_a = sum_c g_c J_ca + g_a
    d_mw = jnp.stack(
        [
            g[0] * Jx[0] + g[1] * Jx[1] + g[0],
            g[0] * Jz[0] + g[1] * Jz[1] + g[1],
        ],
        axis=0,
    )

    # d_m0: transpose of the weighted warp (x rolls wrap => mask the wrapped
    # rows, then add the CLAMP edge fold; z factored per oz as in epdiff2d)
    accz = {oz: jnp.zeros(shape, dtype=phiinv.dtype) for oz in (-1, 0, 1)}
    acc0 = jnp.zeros((H, W), dtype=phiinv.dtype)
    acc1 = jnp.zeros((H, W), dtype=phiinv.dtype)
    for ox in (-1, 0, 1):
        wx = Wd[(0, ox)]
        xt = _xtap(m0, ox, r_idx, H)
        for oz in (-1, 0, 1):
            wz = Wd[(1, oz)]
            # weight-gradient path
            tap = e2._ztap(xt, oz, W, z_idx, W)
            gt = d_mw[0] * tap[0] + d_mw[1] * tap[1]
            acc0 = acc0 + DW[(0, ox)] * wz * gt
            acc1 = acc1 + wx * DW[(1, oz)] * gt
            # d_m0 x-transpose
            P = (wx * wz) * d_mw
            if ox == 0:
                A = P
            else:
                wrap = r0 if ox == 1 else rL
                A = jnp.where(wrap, 0.0, pltpu.roll(P, ox % H, 1))
                edge = r0 if ox == -1 else rL
                A = A + jnp.where(edge, P, 0.0)
            accz[oz] = accz[oz] + A

    acc_dm = jnp.zeros(shape, dtype=phiinv.dtype)
    for oz in (-1, 0, 1):
        acc_z = accz[oz]
        if oz != 0:
            wrap = z0 if oz == 1 else zL
            A2 = jnp.where(wrap, 0.0, pltpu.roll(acc_z, oz % W, 2))
            zedge = z0 if oz == -1 else zL
            acc_z = A2 + jnp.where(zedge, acc_z, 0.0)
        acc_dm = acc_dm + acc_z

    # d_phiinv divergence path: sum_a D_a^T (g * mw_a)
    div = jnp.zeros(shape, dtype=phiinv.dtype)
    for a in range(2):
        q = g * mw[a][None]
        if a == 0:
            qm = pltpu.roll(q, 1, 1)
            qp = pltpu.roll(q, H - 1, 1)
            first, last = r0, rL
        else:
            qm = pltpu.roll(q, 1, 2)
            qp = pltpu.roll(q, W - 1, 2)
            first, last = z0, zL
        div = div + 0.5 * (
            jnp.where(first, -q, qm) - jnp.where(last, -q, qp)
        )

    d_phiinv = div + jnp.stack([acc0, acc1], axis=0)
    return d_phiinv, acc_dm


def _compose_bwd_body(H, W, s, phiinv, v, g):
    """Whole-plane transcription of epdiff2d._compose2d_bwd_kernel: returns
    (d_phiinv, d_v) for cotangent g of the composed displacement."""
    shape = (2, H, W)
    z_idx = e2._lane_idx(shape)
    r_idx = _row_idx(shape)
    z0 = z_idx == 0
    zL = z_idx == W - 1
    r0 = r_idx == 0
    rL = r_idx == H - 1

    d = s * v
    Wd = {(a, o): e2._w2(d, a, o) for a in range(2) for o in (-1, 0, 1)}
    DW = {(a, o): e2._dw2(d, a, o) for a in range(2) for o in (-1, 0, 1)}

    # d_phiinv = warp transpose of W * g
    accz = {oz: jnp.zeros(shape, dtype=phiinv.dtype) for oz in (-1, 0, 1)}
    for ox in (-1, 0, 1):
        wx = Wd[(0, ox)]
        for oz in (-1, 0, 1):
            P = (wx * Wd[(1, oz)]) * g
            if ox == 0:
                A = P
            else:
                wrap = r0 if ox == 1 else rL
                A = jnp.where(wrap, 0.0, pltpu.roll(P, ox % H, 1))
                edge = r0 if ox == -1 else rL
                A = A + jnp.where(edge, P, 0.0)
            accz[oz] = accz[oz] + A

    acc_dp = jnp.zeros(shape, dtype=phiinv.dtype)
    for oz in (-1, 0, 1):
        acc_z = accz[oz]
        if oz != 0:
            wrap = z0 if oz == 1 else zL
            A2 = jnp.where(wrap, 0.0, pltpu.roll(acc_z, oz % W, 2))
            zedge = z0 if oz == -1 else zL
            acc_z = A2 + jnp.where(zedge, acc_z, 0.0)
        acc_dp = acc_dp + acc_z

    # d_v = s*g + s * weight-gradient path
    acc0 = jnp.zeros((H, W), dtype=phiinv.dtype)
    acc1 = jnp.zeros((H, W), dtype=phiinv.dtype)
    for ox in (-1, 0, 1):
        base = _xtap(phiinv, ox, r_idx, H)
        wx = Wd[(0, ox)]
        for oz in (-1, 0, 1):
            tap = e2._ztap(base, oz, W, z_idx, W)
            gt = g[0] * tap[0] + g[1] * tap[1]
            acc0 = acc0 + DW[(0, ox)] * Wd[(1, oz)] * gt
            acc1 = acc1 + wx * DW[(1, oz)] * gt
    d_v = s * g + s * jnp.stack([acc0, acc1], axis=0)
    return acc_dp, d_v


# ---------------------------------------------------------------------------
# mega-kernels
# ---------------------------------------------------------------------------


def _shoot_fwd_kernel(T, s, H, W, stash, stream, m0_ref, p0_ref, mn_ref,
                      *rest):
    mat_refs = rest[:8]
    out_ref, flag_ref = rest[8], rest[9]
    if stash:
        tp_ref, tv_ref, tm_ref = rest[10], rest[11], rest[12]
        if stream:
            tbuf, tsem = rest[13], rest[14]
    mats = tuple(r[...] for r in mat_refs)
    Mn = mn_ref[...]
    m0 = m0_ref[0]
    phiinv = p0_ref[0]
    n = pl.program_id(0)

    def emit(t, k, ref, val):
        """Stash plane ``val`` as trajectory ``k``'s step ``t``: direct VMEM
        store (resident) or a 2-slot-ring DMA to HBM (streaming) — the copy
        started at step t drains while step t+1 computes; its slot is
        reclaimed at step t+2."""
        if not stream:
            ref[0, t] = val
            return
        slot = t % 2
        if t >= 2:
            pltpu.make_async_copy(
                tbuf.at[slot, k], ref.at[n, t - 2], tsem.at[slot, k]
            ).wait()
        tbuf[slot, k] = val
        pltpu.make_async_copy(
            tbuf.at[slot, k], ref.at[n, t], tsem.at[slot, k]
        ).start()

    ok = jnp.float32(1.0)
    for _t in range(T):
        ok = jnp.minimum(ok, _flag_of(phiinv))
        if stash:
            emit(_t, 0, tp_ref, phiinv)
        m, mw = _adstar_body(H, W, phiinv, m0)
        if stash:
            emit(_t, 2, tm_ref, mw)
        v = _fluid_body(m, Mn, mats)
        if stash:
            emit(_t, 1, tv_ref, v)
        ok = jnp.minimum(ok, _flag_of(s * v))
        phiinv = _compose_body(H, W, s, phiinv, v)
    if stash and stream:  # drain the last <=2 steps' in-flight copies
        for _t in range(max(0, T - 2), T):
            for k, ref in ((0, tp_ref), (1, tv_ref), (2, tm_ref)):
                pltpu.make_async_copy(
                    tbuf.at[_t % 2, k], ref.at[n, _t], tsem.at[_t % 2, k]
                ).wait()
    out_ref[0] = phiinv

    @pl.when(n == 0)
    def _():
        flag_ref[0, 0] = 1.0

    flag_ref[0, 0] = jnp.minimum(flag_ref[0, 0], ok)


def _shoot_bwd_kernel(T, s, H, W, stream, m0_ref, g_ref, mn_ref, *rest):
    mat_refs = rest[:8]
    tp_ref, tv_ref, tm_ref = rest[8], rest[9], rest[10]
    dm0_ref, dp0_ref = rest[11], rest[12]
    if stream:
        rbuf, rsem = rest[13], rest[14]
    mats = tuple(r[...] for r in mat_refs)
    Mn = mn_ref[...]
    m0 = m0_ref[0]
    n = pl.program_id(0)
    trefs = (tp_ref, tv_ref, tm_ref)

    def prefetch(t):
        for k, ref in enumerate(trefs):
            pltpu.make_async_copy(
                ref.at[n, t], rbuf.at[t % 2, k], rsem.at[t % 2, k]
            ).start()

    def planes_at(t):
        """(phiinv_t, v_t, mw_t): VMEM-resident block reads, or the
        streamed slot (waited, with step t-1's fetch already in flight)."""
        if not stream:
            return tp_ref[0, t], tv_ref[0, t], tm_ref[0, t]
        slot = t % 2
        for k, ref in enumerate(trefs):
            pltpu.make_async_copy(
                ref.at[n, t], rbuf.at[slot, k], rsem.at[slot, k]
            ).wait()
        if t > 0:
            prefetch(t - 1)
        return rbuf[slot, 0], rbuf[slot, 1], rbuf[slot, 2]

    if stream:
        prefetch(T - 1)

    # reverse sweep over the forward's stashed trajectory (no replay)
    g = g_ref[0]
    dm0 = jnp.zeros((2, H, W), dtype=g.dtype)
    for t in reversed(range(T)):
        p_t, v_t, mw_t = planes_at(t)
        dp_prev, dv = _compose_bwd_body(H, W, s, p_t, v_t, g)
        dm = _fluid_body(dv, Mn, mats)  # K is self-adjoint
        dpa, dm0_t = _adstar_bwd_body(H, W, p_t, m0, dm, mw_t)
        g = dp_prev + dpa
        dm0 = dm0 + dm0_t
    dm0_ref[0] = dm0
    dp0_ref[0] = g


# ---------------------------------------------------------------------------
# dispatches + custom VJP
# ---------------------------------------------------------------------------


def _spectral_inputs(H, W, params, dtype):
    """(Mn, 8 DFT matrices) for the scalar (beta == 0) sharp operator, all
    built from traced iota (no baked constants)."""
    from .. import fluid as fl

    Mn = fl._fluid_multiplier_traced(
        (H, W), tuple(float(p) for p in params), True, dtype,
        full_spectrum=True,
    )[(0, 0)]
    hf = fl._dft_pair(H, dtype, False)
    wf = fl._dft_pair(W, dtype, False)
    hb = fl._dft_pair(H, dtype, True)
    wb = fl._dft_pair(W, dtype, True)
    return Mn, (hf[0], hf[1], wf[0], wf[1], hb[0], hb[1], wb[0], wb[1])


def _full_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(
        shape, lambda n, nd=nd: (0,) * nd, memory_space=pltpu.VMEM
    )


def _field_spec(H, W):
    return pl.BlockSpec(
        (1, 2, H, W), lambda n: (n, 0, 0, 0), memory_space=pltpu.VMEM
    )


def _traj_spec(T, H, W):
    return pl.BlockSpec(
        (1, T, 2, H, W), lambda n: (n, 0, 0, 0, 0), memory_space=pltpu.VMEM
    )


def _shoot_fwd_dispatch(phiinv0, m0b, params, s, T, stash=True):
    """Returns ``(phiinv_T, flags, traj_phiinv, traj_v, traj_mw)`` when
    ``stash`` (the VJP forward), else just ``(phiinv_T, flags)``.

    The three trajectory tensors (N, T, 2, H, W) are the forward's stashed
    residuals: phiinv_t entering each step, the sharped velocity v_t, and
    the pre-Jacobian warped momentum mw_t.  The backward consumes them
    directly instead of replaying the forward (round-4 finding: the stencil
    bodies are ROLL-bound, so the replay was ~half the backward's cost).
    Pallas outputs are not DCE'd per-output, so non-grad callers (the
    primal, eval loops) use ``stash=False`` to skip the 3 HBM trajectory
    writes entirely (~63 MB/call at 256^2 b8 T=5; ADVICE r4).

    At shapes where the 3T resident trajectory planes overflow the VMEM
    envelope (512^2, deep T — see ``_stream_mode``) the trajectories are
    ANY-space outputs written plane-by-plane through a 2-slot DMA ring."""
    N, _, H, W = phiinv0.shape
    stream = stash and _stream_mode(H, W, T)
    Mn, mats = _spectral_inputs(H, W, params, phiinv0.dtype)
    traj = jax.ShapeDtypeStruct((N, T, 2, H, W), phiinv0.dtype)
    out_shape = [
        jax.ShapeDtypeStruct(phiinv0.shape, phiinv0.dtype),
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
    ]
    out_specs = [
        _field_spec(H, W),
        pl.BlockSpec((1, 1), lambda n: (0, 0), memory_space=pltpu.SMEM),
    ]
    scratch = []
    if stash:
        out_shape += [traj] * 3
        if stream:
            out_specs += [pl.BlockSpec(memory_space=pltpu.ANY)] * 3
            scratch = [
                pltpu.VMEM((2, 3, 2, H, W), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 3)),
            ]
        else:
            out_specs += [_traj_spec(T, H, W)] * 3
    res = pl.pallas_call(
        partial(_shoot_fwd_kernel, T, s, H, W, stash, stream),
        out_shape=out_shape,
        grid=(N,),
        in_specs=[_field_spec(H, W)] * 2
        + [_full_spec((H, W))]
        + [_full_spec(m.shape) for m in mats],
        out_specs=out_specs,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(m0b, phiinv0, Mn, *mats)
    return res


def _shoot_bwd_dispatch(m0b, g, tp, tv, tm, params, s, T):
    N, _, H, W = g.shape
    stream = _stream_mode(H, W, T)
    Mn, mats = _spectral_inputs(H, W, params, g.dtype)
    if stream:
        tspecs = [pl.BlockSpec(memory_space=pltpu.ANY)] * 3
        scratch = [
            pltpu.VMEM((2, 3, 2, H, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ]
    else:
        tspecs = [_traj_spec(T, H, W)] * 3
        scratch = []
    dm0, dp0 = pl.pallas_call(
        partial(_shoot_bwd_kernel, T, s, H, W, stream),
        out_shape=[
            jax.ShapeDtypeStruct(g.shape, g.dtype),
            jax.ShapeDtypeStruct(g.shape, g.dtype),
        ],
        grid=(N,),
        in_specs=[_field_spec(H, W)] * 2
        + [_full_spec((H, W))]
        + [_full_spec(m.shape) for m in mats]
        + tspecs,
        out_specs=[_field_spec(H, W)] * 2,
        scratch_shapes=scratch,
        # the reverse sweep's live set (compose-bwd + Ad*-bwd temporaries
        # over whole planes + the 3 T-step trajectory blocks when resident)
        # runs above the 64M default-ish cap at 256^2 T=5, comfortably
        # under the 128M physical
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(m0b, g, Mn, *mats, tp, tv, tm)
    return dm0, dp0


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _shoot2d_cvjp(phiinv0, m0b, params, s, T):
    # primal (non-grad) path: trajectory-free forward — no HBM stash
    out, flags = _shoot_fwd_dispatch(phiinv0, m0b, params, s, T, stash=False)
    return out, flags


def _shoot2d_fwd(phiinv0, m0b, params, s, T):
    out, flags, tp, tv, tm = _shoot_fwd_dispatch(phiinv0, m0b, params, s, T)
    return (out, flags), (m0b, tp, tv, tm)


def _shoot2d_bwd(params, s, T, res, cts):
    g, _g_flags = cts  # flags are an indicator output: cotangent ignored
    m0b, tp, tv, tm = res
    dm0, dp0 = _shoot_bwd_dispatch(m0b, g, tp, tv, tm, params, s, T)
    return dp0, dm0


_shoot2d_cvjp.defvjp(_shoot2d_fwd, _shoot2d_bwd)


def shoot2d(phiinv0, m0, params, s, T):
    """Whole-shoot 2D EPDiff integration (T steps of step size ``-s``):
    returns ``(phiinv_T, ok)`` where ``ok`` is a (1, 1) unit-regime flag
    (min over the whole trajectory; callers cond on ``ok > 0.5``).

    Equivalent to lddmm._expmap_fast_flagged with the fused 2D kernel pair
    (reference semantics: lagomorph/lddmm.py expmap + metric.sharp), but in
    two kernel launches per training step instead of ~25."""
    N = phiinv0.shape[0]
    m0b = (
        jnp.broadcast_to(m0, (N,) + m0.shape[1:])
        if m0.shape[0] == 1 and N > 1
        else m0
    )
    return _shoot2d_cvjp(phiinv0, m0b, tuple(float(p) for p in params), s, T)
