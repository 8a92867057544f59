"""Transpose-based distributed rFFT fluid operator for spatially-sharded
fields (the design recorded in docs/spatial_sharding.md).

GSPMD's automatic partitioning all-gathers the whole field onto every
device for ``rfftn`` along a sharded axis, destroying the memory scaling
that motivates spatial sharding.  This module implements the classic
transpose (pencil) decomposition with ``shard_map``:

1. shard-local 2D rFFT over the unsharded (Y, Z) axes — no communication;
2. one ``all_to_all`` over the mesh axis re-sharding X-split -> Y-split
   (1/P of the field per device pair, vs all-gather's full field copy);
3. shard-local 1D FFT along the (now whole) X axis, the per-frequency
   d x d fluid solve on this device's Y-frequency band (built from iota
   with the shard's ky offset), and the inverse 1D FFT;
4. inverse ``all_to_all`` and shard-local inverse 2D rFFT, returning to the
   X-sharded layout.

Per application this moves 2 all-to-alls of ~V bytes total over ICI vs
GSPMD's ~2·P·V all-gather bytes, with peak per-chip memory O(V/P).

Like the dense fluid operator, the whole map is self-adjoint in the real L2
inner product, so the custom VJP re-applies it to the cotangent.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.fluid import _safe_sqrt_jnp


def _band_multiplier(shape_xyzf, y0, Y_full, Z_full, params, inverse, dtype):
    """Fluid multiplier entries {(a,b): arr} on a frequency grid of shape
    ``(X, Yb, Zf)`` where the Y axis is this shard's band starting at global
    frequency ``y0``; X carries full complex frequencies, Z the rFFT half
    spectrum.  Same LUT math as ops/fluid.py."""
    alpha, beta, gamma = params
    X, Yb, Zf = shape_xyzf
    ks = [
        jnp.arange(X, dtype=dtype).reshape(X, 1, 1),
        (y0 + jnp.arange(Yb, dtype=dtype)).reshape(1, Yb, 1),
        jnp.arange(Zf, dtype=dtype).reshape(1, 1, Zf),
    ]
    Ns = [X, Y_full, Z_full]
    ws, ss = [], []
    for k, N in zip(ks, Ns):
        ang = 2.0 * jnp.pi * k / N
        ws.append(2.0 * (1.0 - jnp.cos(ang)))
        ss.append(jnp.sin(ang))

    lam = gamma + alpha * sum(jnp.broadcast_to(w, shape_xyzf) for w in ws)
    l = {}
    for a in range(3):
        l[(a, a)] = lam - beta * jnp.broadcast_to(ws[a], shape_xyzf)
        for b in range(a):
            l[(a, b)] = beta * jnp.broadcast_to(ss[a] * ss[b], shape_xyzf)

    def lget(a, b):
        return l[(a, b)] if a >= b else l[(b, a)]

    L = {}
    for a in range(3):
        for b in range(a + 1):
            L[(a, b)] = sum(lget(a, c) * lget(c, b) for c in range(3))
    if not inverse:
        return L

    ooG00 = 1.0 / _safe_sqrt_jnp(L[(0, 0)])
    G10 = L[(1, 0)] * ooG00
    G20 = L[(2, 0)] * ooG00
    ooG11 = 1.0 / _safe_sqrt_jnp(L[(1, 1)] - G10 * G10)
    G21 = (L[(2, 1)] - G20 * G10) * ooG11
    ooG22 = 1.0 / _safe_sqrt_jnp(L[(2, 2)] - G20 * G20 - G21 * G21)

    def solve(b0, b1, b2):
        y0_ = b0 * ooG00
        y1 = (b1 - G10 * y0_) * ooG11
        y2 = (b2 - G20 * y0_ - G21 * y1) * ooG22
        x2 = y2 * ooG22
        x1 = (y1 - G21 * x2) * ooG11
        x0 = (y0_ - G10 * x1 - G20 * x2) * ooG00
        return x0, x1, x2

    one = jnp.ones(shape_xyzf, dtype)
    zero = jnp.zeros(shape_xyzf, dtype)
    c00, c10, c20 = solve(one, zero, zero)
    _, c11, c21 = solve(zero, one, zero)
    _, _, c22 = solve(zero, zero, one)
    return {(0, 0): c00, (1, 0): c10, (1, 1): c11,
            (2, 0): c20, (2, 1): c21, (2, 2): c22}


def _local_apply(local, params, inverse, axis_name, n_shards, Y, Z):
    """Body run per shard under shard_map; ``local``: (B, 3, X/P, Y, Z)."""
    dt = local.dtype
    F = jnp.fft.rfftn(local, axes=(3, 4), norm="ortho")  # (B,3,Xl,Y,Zf)
    # X-split -> Y-split (split Y frequencies, concatenate X shards)
    F = jax.lax.all_to_all(F, axis_name, split_axis=3, concat_axis=2,
                           tiled=True)  # (B,3,X,Y/P,Zf)
    F = jnp.fft.fft(F, axis=2, norm="ortho")

    X = F.shape[2]
    Yb = F.shape[3]
    Zf = F.shape[4]
    p = jax.lax.axis_index(axis_name)
    y0 = (p * Yb).astype(dt)
    M = _band_multiplier((X, Yb, Zf), y0, Y, Z, params, inverse, dt)

    def mget(a, b):
        return M[(a, b)] if a >= b else M[(b, a)]

    rows = []
    for a in range(3):
        acc = None
        for b in range(3):
            term = mget(a, b)[None] * F[:, b]
            acc = term if acc is None else acc + term
        rows.append(acc)
    F = jnp.stack(rows, axis=1)

    F = jnp.fft.ifft(F, axis=2, norm="ortho")
    F = jax.lax.all_to_all(F, axis_name, split_axis=2, concat_axis=3,
                           tiled=True)  # (B,3,Xl,Y,Zf)
    out = jnp.fft.irfftn(F, s=(Y, Z), axes=(3, 4), norm="ortho")
    return out.astype(dt)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _sharded_fluid_cvjp(mv, params, inverse, mesh_axis_and_mesh):
    return _sharded_apply(mv, params, inverse, mesh_axis_and_mesh)


def _sharded_apply(mv, params, inverse, mesh_axis_and_mesh):
    from jax.experimental.shard_map import shard_map

    mesh, axis_name = mesh_axis_and_mesh
    n = mesh.shape[axis_name]
    B, d, X, Y, Z = mv.shape
    if d != 3:
        raise ValueError("sharded fluid operator is 3D (d == 3) only")
    if X % n or Y % n:
        raise ValueError(f"X and Y must be divisible by the mesh axis size {n}")
    spec = P(None, None, axis_name, None, None)
    f = partial(_local_apply, params=params, inverse=inverse,
                axis_name=axis_name, n_shards=n, Y=Y, Z=Z)
    return shard_map(
        f, mesh=mesh, in_specs=(spec,), out_specs=spec, check_rep=False
    )(mv)


def _sfc_fwd(mv, params, inverse, mam):
    return _sharded_apply(mv, params, inverse, mam), None


def _sfc_bwd(params, inverse, mam, _res, g):
    # self-adjoint (same argument as ops/fluid.py): re-apply to the cotangent
    return (_sharded_apply(g, params, inverse, mam),)


_sharded_fluid_cvjp.defvjp(_sfc_fwd, _sfc_bwd)


def sharded_fluid_operator(mv, params, inverse, mesh, axis_name="data"):
    """Apply the fluid operator to an X-sharded ``(B, 3, X, Y, Z)`` field
    via the transpose-decomposed distributed rFFT.  Numerically equivalent
    to :func:`lagomorph_tpu.ops.fluid.fluid_operator` (same LUTs and
    floored-Cholesky solve; FFT association differs at the 1e-6 f32 level)."""
    return _sharded_fluid_cvjp(
        mv, tuple(float(p_) for p_ in params), bool(inverse), (mesh, axis_name)
    )


class ShardedFluidMetric:
    """Drop-in FluidMetric for spatially-sharded shooting: ``sharp``/``flat``
    run the distributed rFFT; everything else (stencils, warps) shards by
    halo exchange under GSPMD or shard_map."""

    def __init__(self, params, mesh, axis_name="data"):
        self.params = tuple(float(p_) for p_ in params)
        self.mesh = mesh
        self.axis_name = axis_name

    def operator(self, mv, inverse):
        return sharded_fluid_operator(
            mv, self.params, inverse, self.mesh, self.axis_name
        )

    def sharp(self, m):
        return self.operator(m, inverse=True)

    def flat(self, v):
        return self.operator(v, inverse=False)
