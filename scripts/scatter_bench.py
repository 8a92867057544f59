"""Minimal scatter formulation bench: 8x flat at-add vs one windowed
scatter-add vs sort+segment-sum.  Single channel to keep compiles small."""
import os, sys, time, itertools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

res = int(sys.argv[1]) if len(sys.argv) > 1 else 64
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
K = 3
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
            ok = f"   maxerr={np.abs(got-ref).max():.2e}"
        print(f"{name:36s} {per:9.2f} ms{ok}", flush=True)
    except Exception as e:
        print(f"{name:36s} FAILED: {str(e)[:120]}", flush=True)


def mk():
    g = jnp.asarray(rng.standard_normal((B, 1) + sp), dtype=jnp.float32)
    coords = jnp.asarray(
        np.stack(np.meshgrid(*[np.arange(n) for n in sp], indexing="ij"))[None]
        + rng.standard_normal((B, 3) + sp) * 2,
        dtype=jnp.float32,
    )
    return (g, coords)


def scatter_ref(g, coords):
    from lagomorph_tpu.ops.sampling import splat_linear
    return splat_linear(g, coords, sp)


def _weights(coords):
    xc = jnp.clip(coords, 0.0, float(res - 1))
    start = jnp.clip(jnp.floor(xc).astype(jnp.int32), 0, res - 2)
    d = xc - start.astype(xc.dtype)
    return start, d


def scatter_window(g, coords):
    start, d = _weights(coords)
    idx = start.reshape(B, 3, -1).transpose(0, 2, 1)  # (B,P,3)
    gf = g.reshape(B, -1)
    # updates (B,P,2,2,2) via explicit products
    w0 = 1 - d.reshape(B, 3, -1)
    w1 = d.reshape(B, 3, -1)
    upd = (
        gf[:, :, None, None, None]
        * jnp.stack([w0[:, 0], w1[:, 0]], -1)[:, :, :, None, None]
        * jnp.stack([w0[:, 1], w1[:, 1]], -1)[:, :, None, :, None]
        * jnp.stack([w0[:, 2], w1[:, 2]], -1)[:, :, None, None, :]
    )

    def one(ix, up):
        dn = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2, 3),
            inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0, 1, 2),
        )
        return jax.lax.scatter_add(
            jnp.zeros(sp, g.dtype), ix, up, dn, mode="clip"
        )

    return jax.vmap(one)(idx, upd)[:, None]


def scatter_sort_segsum(g, coords):
    floor = jnp.floor(coords)
    frac = coords - floor
    fl = floor.astype(jnp.int32)
    strides = (res * res, res, 1)
    out = jnp.zeros((B, nvox), dtype=g.dtype)
    gf = g.reshape(B, -1)
    for corner in itertools.product((0, 1), repeat=3):
        lin = 0
        w = 1.0
        for dd in range(3):
            idx = jnp.clip(fl[:, dd] + corner[dd], 0, res - 1)
            lin = lin + idx * strides[dd]
            w = w * (frac[:, dd] if corner[dd] else 1 - frac[:, dd])
        vals = (w.reshape(B, -1)) * gf
        lin = lin.reshape(B, -1)
        order = jnp.argsort(lin, axis=1)
        lin_s = jnp.take_along_axis(lin, order, axis=1)
        vals_s = jnp.take_along_axis(vals, order, axis=1)
        seg = jax.vmap(
            lambda l, v: jax.ops.segment_sum(
                v, l, num_segments=nvox, indices_are_sorted=True
            )
        )(lin_s, vals_s)
        out = out + seg
    return out.reshape((B, 1) + sp)


measure("scatter 8x at-add (current)", scatter_ref, mk)
measure("scatter windowed (1 call)", scatter_window, mk)
measure("scatter sort+segsum", scatter_sort_segsum, mk)
