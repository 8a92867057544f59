"""Round 2 of gather/scatter formulation benchmarks (fixed reshapes, block
scatter, coordinate-clamped block gather with exact clamp semantics)."""
import os, sys, time, itertools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

res = int(sys.argv[1]) if len(sys.argv) > 1 else 64
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
C = 3
K = 4
sp = (res, res, res)
nvox = res**3
rng = np.random.default_rng(0)


def measure(name, fn, make_inputs, check=None):
    try:
        runs = {}
        for reps in (1, K):
            def body(args, reps=reps):
                def step(c, _):
                    out = fn(*((c,) + args[1:]))
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
        ok = ""
        if check is not None:
            args = make_inputs()
            got = np.asarray(jax.jit(fn)(*args))
            ref = np.asarray(check(*args))
            err = np.abs(got - ref).max()
            ok = f"   maxerr={err:.2e}"
        print(f"{name:40s} {per:9.2f} ms{ok}", flush=True)
    except Exception as e:
        print(f"{name:40s} FAILED: {str(e)[:130]}", flush=True)


def mk():
    I = jnp.asarray(rng.standard_normal((B, C) + sp), dtype=jnp.float32)
    coords = jnp.asarray(
        np.stack(np.meshgrid(*[np.arange(n) for n in sp], indexing="ij"))[None]
        + rng.standard_normal((B, 3) + sp) * 2,
        dtype=jnp.float32,
    )
    return (I, coords)


# reference implementation (current sampling.py)
def gather_ref(I, coords):
    from lagomorph_tpu.ops.sampling import sample_linear
    return sample_linear(I, coords)


# A. 8x flat take (fixed)
def gather_flat_take(I, coords):
    floor = jnp.floor(coords)
    frac = coords - floor
    fl = floor.astype(jnp.int32)
    strides = (res * res, res, 1)
    Iflat = I.reshape(B, C, -1)
    out = 0.0
    for corner in itertools.product((0, 1), repeat=3):
        lin = 0
        w = 1.0
        for d in range(3):
            idx = jnp.clip(fl[:, d] + corner[d], 0, res - 1)
            lin = lin + idx * strides[d]
            w = w * (frac[:, d] if corner[d] else 1 - frac[:, d])
        vals = jnp.take_along_axis(Iflat, lin.reshape(B, 1, -1), axis=2).reshape(
            (B, 1) + sp
        )
        out = out + w[:, None] * vals
    return out


# B. coordinate-clamped block gather (exact clamp values)
def gather_block2(I, coords):
    xc = jnp.clip(coords, 0.0, float(res - 1))
    start = jnp.clip(jnp.floor(xc).astype(jnp.int32), 0, res - 2)  # (B,3,*sp)
    delta = xc - start.astype(xc.dtype)

    def one(Ic, idxPT):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3),
            collapsed_slice_dims=(),
            start_index_map=(0, 1, 2),
        )
        return jax.lax.gather(Ic, idxPT, dn, slice_sizes=(2, 2, 2), mode="clip")

    idx = start.reshape(B, 3, -1).transpose(0, 2, 1)  # (B, P, 3)
    blocks = jax.vmap(lambda Ib, ix: jax.vmap(one, (0, None))(Ib, ix))(I, idx)
    # blocks: (B, C, P, 2, 2, 2)
    d = delta.reshape(B, 3, -1)
    wx = jnp.stack([1 - d[:, 0], d[:, 0]], -1)  # (B, P, 2)
    wy = jnp.stack([1 - d[:, 1], d[:, 1]], -1)
    wz = jnp.stack([1 - d[:, 2], d[:, 2]], -1)
    out = jnp.einsum("bcpxyz,bpx,bpy,bpz->bcp", blocks, wx, wy, wz)
    return out.reshape((B, C) + sp)


def mkg():
    I, coords = mk()
    g = jnp.asarray(rng.standard_normal((B, C) + sp), dtype=jnp.float32)
    return (g, coords)


# reference scatter (current _splat_one path)
def scatter_ref(g, coords):
    from lagomorph_tpu.ops.sampling import splat_linear
    return splat_linear(g, coords, sp)


# C. windowed scatter-add (one scatter with (2,2,2) updates)
def scatter_block(g, coords):
    xc = jnp.clip(coords, 0.0, float(res - 1))
    start = jnp.clip(jnp.floor(xc).astype(jnp.int32), 0, res - 2)
    delta = xc - start.astype(xc.dtype)
    d = delta.reshape(B, 3, -1)
    wx = jnp.stack([1 - d[:, 0], d[:, 0]], -1)  # (B,P,2)
    wy = jnp.stack([1 - d[:, 1], d[:, 1]], -1)
    wz = jnp.stack([1 - d[:, 2], d[:, 2]], -1)
    gflat = g.reshape(B, C, -1)
    upd = jnp.einsum("bcp,bpx,bpy,bpz->bcpxyz", gflat, wx, wy, wz)
    idx = start.reshape(B, 3, -1).transpose(0, 2, 1)  # (B,P,3)

    def one(idxPT, updP):
        dn = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2, 3),
            inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0, 1, 2),
        )
        return jax.lax.scatter_add(
            jnp.zeros(sp, g.dtype), idxPT, updP, dn,
            mode="clip", unique_indices=False,
        )

    out = jax.vmap(lambda ix, updC: jax.vmap(one, (None, 0))(ix, updC))(
        idx, upd.transpose(0, 1, 2, 3, 4, 5)
    )
    return out.reshape((B, C) + sp)


# D. 8x flat at-add (current) measured again for reference
measure("gather current sample_linear", gather_ref, mk)
measure("gather 8x flat take", gather_flat_take, mk, check=gather_ref)
measure("gather block+coordclamp", gather_block2, mk, check=gather_ref)
measure("scatter current splat_linear", scatter_ref, mkg)
measure("scatter block windows", scatter_block, mkg, check=scatter_ref)
