"""Probe: can a data-dependent tap gather beat the dense 27-tap roll
enumeration in the warp kernels?

RESULT (2026-08-18, v5e): NO on this backend — Mosaic's tpu.dynamic_gather
requires the gathered (lane) axis to fit ONE vreg ("Not implemented:
Multiple source vregs along gather dimension"); the kernels' flattened
(y,z) lane axis is (BY+2)*Z = 1280 lanes.  Restructuring to lanes=Z=128
would only dynamicize the z axis (27 -> 18 taps, ~1.4x on the tap loops)
at the cost of a full slab-layout rewrite — parked.  The 12-gather
formulation below is verified correct vs the 27-tap kernel in interpret
mode (1.2e-7 interior agreement) and is kept for backends whose gather
supports multiple source vregs.

The tier-1 warp (|d| < 1) touches only 8 of the 27 [-1,1]^3 taps per voxel
(floor(d_a) in {-1, 0} picks 2 of 3 offsets per axis).  The shipped kernels
enumerate all 27 with clamp-folded weights (zero weight on untouched taps)
because which 8 varies per voxel.  Mosaic supports lane-axis
take_along_axis (round-1 finding, scripts/pallas_probe.py), so the 4 (y,z)
taps can be fetched with per-voxel dynamic lane indices and the x offset
resolved with one select over sublane-rolled copies: 8 FMAs + 4 gathers x 2
x-copies instead of 27 rolls + 27 FMAs.

This measures mw-only kernels (the warp portion that dominates the fused
Ad* forward and is recomputed in its backward) at the y-blocked backward
geometry.  Usage: python scripts/tap_probe.py [res] [batch]
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lagomorph_tpu.ops.pallas.epdiff_unit import _weights

K = 6


def measure(name, fn, make_input):
    runs = {}
    for reps in (1, K):
        def body(x, reps=reps):
            def step(c, _):
                out = fn(c)
                leaf = jax.tree_util.tree_leaves(out)[0]
                f = 1.0 + 1e-30 * jnp.sum(leaf)
                return jax.tree_util.tree_map(
                    lambda a: a * f if jnp.issubdtype(a.dtype, jnp.floating)
                    else a,
                    c,
                ), None
            c, _ = jax.lax.scan(step, x, None, length=reps)
            return jnp.sum(jax.tree_util.tree_leaves(c)[0])
        runs[reps] = jax.jit(body)
        _ = float(runs[reps](make_input()))
    ts = {}
    for reps in (1, K):
        x = make_input()
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        _ = float(runs[reps](x))
        ts[reps] = time.perf_counter() - t0
    per = (ts[K] - ts[1]) / (K - 1) * 1000
    print(f"{name:44s} {per:9.2f} ms", flush=True)
    return per


# ---------------------------------------------------------------------------
# Variant A: dense 27-tap roll enumeration (mirrors _adstar_bwd_kernel_yb's
# mw loop, weights hoisted per axis)
# ---------------------------------------------------------------------------
def _kernel_rolls(BX, BY, Y, Z, ppad_ref, mpad_ref, out_ref, p_slab, m_slab,
                  sems):
    BXW = BX + 16
    WL2 = (BY + 4) * Z
    SL = (BY + 2) * Z
    BL = BY * Z
    n = pl.program_id(0)
    xb = pl.program_id(1)
    yb = pl.program_id(2)
    win = (n, slice(None), pl.ds(xb * BX, BXW), pl.ds(yb * BL, WL2))
    cps = [
        pltpu.make_async_copy(ref.at[win], slab, sems.at[i])
        for i, (ref, slab) in enumerate(
            ((ppad_ref, p_slab), (mpad_ref, m_slab))
        )
    ]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()
    psl = p_slab[...]
    msl = m_slab[...]
    psub = psl[:, :, Z : Z + SL]

    shape_s = (3, BXW, SL)
    lane_s = jax.lax.broadcasted_iota(jnp.int32, shape_s, 2)
    z_s = lane_s % Z
    _ems = {}

    def ztap_s(A, oz):
        if oz == 0:
            return A
        rolled = pltpu.roll(A, (-oz) % SL, 2)
        if oz not in _ems:
            _ems[oz] = z_s == (Z - 1 if oz == 1 else 0)
        return jnp.where(_ems[oz], A, rolled)

    Ws = {(a, o): _weights(psub, a, o) for a in range(3) for o in (-1, 0, 1)}
    mw = jnp.zeros(shape_s, dtype=psl.dtype)
    for ox in (-1, 0, 1):
        xt = pltpu.roll(msl, (-ox) % BXW, 1) if ox != 0 else msl
        wx = Ws[(0, ox)]
        for oy in (-1, 0, 1):
            ytap = xt[:, :, (1 + oy) * Z : (1 + oy) * Z + SL]
            wxy = wx * Ws[(1, oy)]
            for oz in (-1, 0, 1):
                w3 = wxy * Ws[(2, oz)]
                tap = ztap_s(ytap, oz)
                mw = mw + w3 * tap
    out_ref[0] = mw[:, 8 : 8 + BX, Z : Z + BL]


# ---------------------------------------------------------------------------
# Variant B: 8-tap data-dependent gather (x via select over rolled copies,
# (y,z) via take_along_axis with per-voxel lane indices)
# ---------------------------------------------------------------------------
def _kernel_gather(BX, BY, Y, Z, ppad_ref, mpad_ref, out_ref, p_slab, m_slab,
                   sems):
    BXW = BX + 16
    WL2 = (BY + 4) * Z
    SL = (BY + 2) * Z
    BL = BY * Z
    n = pl.program_id(0)
    xb = pl.program_id(1)
    yb = pl.program_id(2)
    win = (n, slice(None), pl.ds(xb * BX, BXW), pl.ds(yb * BL, WL2))
    cps = [
        pltpu.make_async_copy(ref.at[win], slab, sems.at[i])
        for i, (ref, slab) in enumerate(
            ((ppad_ref, p_slab), (mpad_ref, m_slab))
        )
    ]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()
    psl = p_slab[...]
    msl = m_slab[...]
    psub = psl[:, :, Z : Z + SL]

    shape_s = (3, BXW, SL)
    fy = jnp.floor(psub[1])
    fz = jnp.floor(psub[2])
    ty = psub[1] - fy
    tz = psub[2] - fz

    # x stays statically enumerated (3 zero-weighted copies — selecting by a
    # mask at the output voxel does not commute with the lane gather); the 4
    # (y,z) corners are fetched with per-voxel dynamic lane indices.
    lane_s = jax.lax.broadcasted_iota(jnp.int32, fy.shape, 1)
    base = jnp.clip(
        lane_s + fy.astype(jnp.int32) * Z + fz.astype(jnp.int32), 0, SL - 1
    )

    Wx = {o: _weights(psub, 0, o) for o in (-1, 0, 1)}
    wyl = 1.0 - ty
    wyh = ty
    wzl = 1.0 - tz
    wzh = tz

    mw = jnp.zeros(shape_s, dtype=psl.dtype)
    for ox in (-1, 0, 1):
        xt = (pltpu.roll(msl, (-ox) % BXW, 1) if ox != 0 else msl)[
            :, :, Z : Z + SL
        ]
        wx = Wx[ox]
        xt2 = xt.reshape(3 * BXW, SL)  # Mosaic gather is 2D-only
        for dy, wy in ((0, wyl), (Z, wyh)):
            for dz, wz in ((0, wzl), (1, wzh)):
                idx = jnp.minimum(base + dy + dz, SL - 1)
                idx2 = jnp.broadcast_to(idx[None], shape_s).reshape(
                    3 * BXW, SL
                )
                tap = jnp.take_along_axis(xt2, idx2, axis=1).reshape(shape_s)
                mw = mw + (wx * wy * wz) * tap
    out_ref[0] = mw[:, 8 : 8 + BX, Z : Z + BL]


# ---------------------------------------------------------------------------
# Raw op-cost micro-probe: N lane rolls vs N lane gathers on the slab shape
# ---------------------------------------------------------------------------
def _kernel_microrolls(REPS, BX, BY, Y, Z, x_ref, o_ref):
    A = x_ref[0]
    acc = jnp.zeros_like(A)
    for i in range(REPS):
        acc = acc + (0.5 + 0.01 * i) * pltpu.roll(A, i + 1, 2)
    o_ref[0] = acc


def _kernel_microgather(REPS, BX, BY, Y, Z, x_ref, i_ref, o_ref):
    sh = x_ref.shape[1:]
    A = x_ref[0].reshape(sh[0] * sh[1], sh[2])
    idx = i_ref[0].reshape(sh[0] * sh[1], sh[2])
    acc = jnp.zeros_like(A)
    for i in range(REPS):
        acc = acc + (0.5 + 0.01 * i) * jnp.take_along_axis(
            A, jnp.minimum(idx + i, A.shape[-1] - 1), axis=1
        )
    o_ref[0] = acc.reshape(sh)


def run_micro(N, X, Y, Z, BX, BY, reps=12):
    SL = (BY + 2) * Z
    rng = np.random.default_rng(1)
    x = jnp.asarray(
        rng.standard_normal((N * (X // BX) * (Y // BY), 3, BX + 16, SL)),
        dtype=jnp.float32,
    )
    G = x.shape[0]
    idx = jnp.asarray(
        rng.integers(0, SL, (G, 3, BX + 16, SL)), dtype=jnp.int32
    )
    fr = pl.pallas_call(
        partial(_kernel_microrolls, reps, BX, BY, Y, Z),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1,) + x.shape[1:], lambda g: (g, 0, 0, 0))
        ],
        out_specs=pl.BlockSpec((1,) + x.shape[1:], lambda g: (g, 0, 0, 0)),
    )
    fg = pl.pallas_call(
        partial(_kernel_microgather, reps, BX, BY, Y, Z),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1,) + x.shape[1:], lambda g: (g, 0, 0, 0)),
            pl.BlockSpec((1,) + x.shape[1:], lambda g: (g, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1,) + x.shape[1:], lambda g: (g, 0, 0, 0)),
    )
    tr = measure(f"micro: {reps} rolls+FMA", lambda a: fr(a[0]),
                 lambda: (x, idx))
    tg = measure(f"micro: {reps} gathers+FMA", lambda a: fg(*a),
                 lambda: (x, idx))
    print(f"  gather/roll cost ratio = {tg / tr:.2f}", flush=True)


def run_variant(name, kernel, N, X, Y, Z, BX, BY, mk):
    BL = BY * Z
    f = pl.pallas_call(
        partial(kernel, BX, BY, Y, Z),
        out_shape=[jax.ShapeDtypeStruct((N, 3, X, Y * Z), jnp.float32)],
        grid=(N, X // BX, Y // BY),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
        out_specs=[
            pl.BlockSpec(
                (1, 3, BX, BL),
                lambda n, xb, yb: (n, 0, xb, yb),
                memory_space=pltpu.VMEM,
            )
        ],
        scratch_shapes=[
            pltpu.VMEM((3, BX + 16, (BY + 4) * Z), jnp.float32),
            pltpu.VMEM((3, BX + 16, (BY + 4) * Z), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def op(args):
        (out,) = f(*args)
        return out

    return measure(name, op, mk), jax.jit(op)


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    X = Y = Z = res
    rng = np.random.default_rng(0)
    w2 = [(0, 0), (0, 0), (8, 8), (2, 2), (0, 0)]

    def mk():
        p = rng.uniform(-0.999, 0.999, (N, 3, X, Y, Z)).astype(np.float32)
        m = rng.standard_normal((N, 3, X, Y, Z)).astype(np.float32)
        ppad = np.pad(p, w2, mode="edge").reshape(N, 3, X + 16, (Y + 4) * Z)
        mpad = np.pad(m, w2, mode="edge").reshape(N, 3, X + 16, (Y + 4) * Z)
        return jnp.asarray(ppad), jnp.asarray(mpad)

    run_micro(N, X, Y, Z, 16 if X % 32 else 32, 8)
    for BX, BY in ((32, 8), (16, 8)):
        if X % BX or Y % BY:
            continue
        ta, fa = run_variant(f"27-tap rolls BX={BX} BY={BY}", _kernel_rolls,
                             N, X, Y, Z, BX, BY, mk)
        tb, fb = run_variant(f"12-gather BX={BX} BY={BY}", _kernel_gather,
                             N, X, Y, Z, BX, BY, mk)
        # interior agreement check (boundary handling differs on purpose)
        args = mk()
        a = np.asarray(fa(args)).reshape(N, 3, X, Y, Z)
        b = np.asarray(fb(args)).reshape(N, 3, X, Y, Z)
        sl = (slice(None), slice(None)) + (slice(2, -2),) * 3
        err = float(np.max(np.abs(a[sl] - b[sl])))
        print(f"  interior max|A-B| = {err:.2e}   speedup {ta / tb:.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
