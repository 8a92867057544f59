"""Benchmark alternative XLA formulations of the trilinear gather and its
transpose (scatter-add) on TPU, to pick the fastest backend for interp."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from functools import partial

res = int(sys.argv[1]) if len(sys.argv) > 1 else 64
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
C = 3
K = 4
sp = (res, res, res)
nvox = res**3
rng = np.random.default_rng(0)


def measure(name, fn, make_inputs):
    runs = {}
    try:
        for reps in (1, K):
            def body(args, reps=reps):
                def step(c, _):
                    out = fn(*((c,) + args[1:]))
                    # fold the full output into the carry (tiny but nonzero
                    # coupling so nothing can be dead-code eliminated)
                    return c + 1e-30 * jnp.sum(out), None
                c, _ = jax.lax.scan(step, args[0], None, length=reps)
                return jnp.sum(c)
            runs[reps] = jax.jit(body)
            _ = float(runs[reps](make_inputs()))
        ts = {}
        for reps in (1, K):
            args = make_inputs()
            jax.block_until_ready(args)
            t0 = time.perf_counter()
            _ = float(runs[reps](args))
            ts[reps] = time.perf_counter() - t0
        per = (ts[K] - ts[1]) / (K - 1) * 1000
        print(f"{name:44s} {per:9.2f} ms", flush=True)
    except Exception as e:
        print(f"{name:44s} FAILED: {str(e)[:120]}", flush=True)


# ---- inputs: I (B,C,*sp), u coords etc.
def mk():
    I = jnp.asarray(rng.standard_normal((B, C) + sp), dtype=jnp.float32)
    coords = jnp.asarray(
        np.stack(np.meshgrid(*[np.arange(n) for n in sp], indexing="ij"))[None]
        + rng.standard_normal((B, 3) + sp) * 2,
        dtype=jnp.float32,
    )
    return (I, coords)


# 1. current: flat take per corner (8 gathers)
def gather_flat_take(I, coords):
    floor = jnp.floor(coords)
    frac = coords - floor
    fl = floor.astype(jnp.int32)
    strides = (res * res, res, 1)
    Iflat = I.reshape(B, C, -1)
    out = 0.0
    import itertools
    for corner in itertools.product((0, 1), repeat=3):
        lin = 0
        w = 1.0
        for d in range(3):
            idx = jnp.clip(fl[:, d] + corner[d], 0, res - 1)
            lin = lin + idx * strides[d]
            w = w * (frac[:, d] if corner[d] else 1 - frac[:, d])
        vals = jnp.take_along_axis(
            Iflat, lin.reshape(B, 1, -1), axis=2
        ).reshape((B, 1) + sp)
        out = out + w[:, None] * vals
    return out


# 2. z-pair gather: gather (1,1,2) slices, halving gather count (4 gathers)
def gather_zpair(I, coords):
    floor = jnp.floor(coords)
    frac = coords - floor
    fl = floor.astype(jnp.int32)
    out = 0.0
    import itertools
    Ipad = jnp.pad(I, ((0, 0), (0, 0), (0, 0), (0, 0), (0, 1)), mode="edge")
    Iflat = Ipad.reshape(B, C, -1)
    strides = (res * (res + 1), res + 1, 1)
    zc = jnp.clip(fl[:, 2], 0, res - 1)
    tz = frac[:, 2]
    for cx, cy in itertools.product((0, 1), repeat=2):
        ix = jnp.clip(fl[:, 0] + cx, 0, res - 1)
        iy = jnp.clip(fl[:, 1] + cy, 0, res - 1)
        lin = ix * strides[0] + iy * strides[1] + zc
        base = jnp.take_along_axis(Iflat, lin.reshape(B, 1, -1), axis=2).reshape((B, 1) + sp)
        nxt = jnp.take_along_axis(Iflat, (lin + 1).reshape(B, 1, -1), axis=2).reshape((B, 1) + sp)
        w = (frac[:, 0] if cx else 1 - frac[:, 0]) * (frac[:, 1] if cy else 1 - frac[:, 1])
        out = out + w[:, None] * (base * (1 - tz[:, None]) + nxt * tz[:, None])
    return out


# 3. multi-dim advanced indexing (XLA gather with 3 index vectors)
def gather_multidim(I, coords):
    floor = jnp.floor(coords)
    frac = coords - floor
    fl = floor.astype(jnp.int32)
    out = 0.0
    import itertools
    for corner in itertools.product((0, 1), repeat=3):
        idx = [jnp.clip(fl[:, d] + corner[d], 0, res - 1) for d in range(3)]
        w = 1.0
        for d in range(3):
            w = w * (frac[:, d] if corner[d] else 1 - frac[:, d])
        vals = jax.vmap(lambda Ib, i0, i1, i2: Ib[:, i0, i1, i2])(I, *idx)
        out = out + w[:, None] * vals
    return out


# 4. jax map_coordinates (library baseline)
def gather_mapcoords(I, coords):
    from jax.scipy.ndimage import map_coordinates

    def one(Ic, co):
        return map_coordinates(Ic, [co[0], co[1], co[2]], order=1, mode="nearest")

    return jax.vmap(lambda Ib, co: jax.vmap(one, (0, None))(Ib, co))(I, coords)


# 5. block gather: slice_sizes=(2,2,2) per point (1 gather call)
def gather_block(I, coords):
    floor = jnp.floor(coords)
    frac = coords - floor
    fl = floor.astype(jnp.int32)
    # clamp so the 2x2x2 block stays in bounds
    start = jnp.clip(fl, 0, res - 2)  # (B,3,*sp)
    delta = coords - start.astype(coords.dtype)  # in [0,2): generalized weights

    def one(Ic, st, dl):
        # Ic: (*sp,); st/dl: (3, P)
        idx = st.reshape(3, -1).T  # (P, 3)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3),
            collapsed_slice_dims=(),
            start_index_map=(0, 1, 2),
        )
        blocks = jax.lax.gather(
            Ic, idx, dn, slice_sizes=(2, 2, 2), mode="clip"
        )  # (P, 2, 2, 2)
        w = dl.reshape(3, -1)
        wx = jnp.stack([1 - w[0], w[0]], 1)  # (P,2) -- note weights may exceed [0,1] after clamp shift; emulate clamp semantics approximately
        wy = jnp.stack([1 - w[1], w[1]], 1)
        wz = jnp.stack([1 - w[2], w[2]], 1)
        return jnp.einsum("pxyz,px,py,pz->p", blocks, wx, wy, wz)

    return jax.vmap(
        lambda Ib, st, dl: jax.vmap(one, (0, None, None))(Ib, st, dl)
    )(I, start, delta).reshape(B, C, *sp)


# ---- scatters (transpose ops): d_I from g at coords
def mkg():
    I, coords = mk()
    g = jnp.asarray(rng.standard_normal((B, C) + sp), dtype=jnp.float32)
    return (g, coords)


def scatter_flat(g, coords):
    floor = jnp.floor(coords)
    frac = coords - floor
    fl = floor.astype(jnp.int32)
    strides = (res * res, res, 1)
    out = jnp.zeros((B, C, nvox), dtype=g.dtype)
    import itertools
    for corner in itertools.product((0, 1), repeat=3):
        lin = 0
        w = 1.0
        for d in range(3):
            idx = jnp.clip(fl[:, d] + corner[d], 0, res - 1)
            lin = lin + idx * strides[d]
            w = w * (frac[:, d] if corner[d] else 1 - frac[:, d])
        out = out.at[
            jnp.arange(B)[:, None, None], jnp.arange(C)[None, :, None],
            lin.reshape(B, 1, -1)
        ].add((w[:, None] * g).reshape(B, C, -1))
    return out.reshape(B, C, *sp)


def scatter_transpose_of_take(g, coords):
    # linear-transpose the fastest gather formulation
    I0 = jnp.zeros((B, C) + sp, dtype=g.dtype)
    _, vjp = jax.vjp(lambda I: gather_flat_take(I, coords), I0)
    return vjp(g)[0]


measure("gather flat take", gather_flat_take, mk)
measure("gather z-pair", gather_zpair, mk)
measure("gather multidim vmap", gather_multidim, mk)
measure("gather map_coordinates", gather_mapcoords, mk)
measure("gather block 2x2x2", gather_block, mk)
measure("scatter flat at-add", scatter_flat, mkg)
measure("scatter transpose-of-take", scatter_transpose_of_take, mkg)
