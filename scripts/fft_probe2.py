"""Second FFT probe: alternative transform compositions for the fluid sharp.

Variants: rfftn (current), c2c fftn (full spectrum; 2x data but possibly a
better XLA path), rfft(Z)+fft(Y)+fft(X) manual composition.

Usage: python scripts/fft_probe2.py [res] [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import lagomorph_tpu as lm
from lagomorph_tpu.ops.fluid import _fluid_multiplier_traced

K = 6


def measure(name, fn, make_input):
    try:
        runs = {}
        for reps in (1, K):
            def body(x, reps=reps):
                def step(c, _):
                    out = fn(c)
                    leaf = jax.tree_util.tree_leaves(out)[0]
                    return c * (1.0 + 1e-30 * jnp.sum(leaf)), None
                c, _ = jax.lax.scan(step, x, None, length=reps)
                return jnp.sum(c)
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
        print(f"{name:42s} {per:9.2f} ms", flush=True)
        return per
    except Exception as e:
        print(f"{name:42s} FAILED {str(e)[:120]}", flush=True)


def sharp_c2c(m, params):
    spatial = tuple(m.shape[2:])
    axes = (2, 3, 4)
    F = jnp.fft.fftn(m, axes=axes, norm="ortho")
    M = _fluid_multiplier_traced(spatial, params, True, jnp.float32,
                                 full_spectrum=True)

    def mget(a, b):
        return M[(a, b)] if a >= b else M[(b, a)]

    rows = []
    for a in range(3):
        acc = None
        for b in range(3):
            t = mget(a, b)[None] * F[:, b]
            acc = t if acc is None else acc + t
        rows.append(acc)
    F = jnp.stack(rows, axis=1)
    return jnp.fft.ifftn(F, axes=axes, norm="ortho").real.astype(m.dtype)


def sharp_composed(m, params):
    spatial = tuple(m.shape[2:])
    F = jnp.fft.rfft(m, axis=4, norm="ortho")
    F = jnp.fft.fft(F, axis=3, norm="ortho")
    F = jnp.fft.fft(F, axis=2, norm="ortho")
    M = _fluid_multiplier_traced(spatial, params, True, jnp.float32)

    def mget(a, b):
        return M[(a, b)] if a >= b else M[(b, a)]

    rows = []
    for a in range(3):
        acc = None
        for b in range(3):
            t = mget(a, b)[None] * F[:, b]
            acc = t if acc is None else acc + t
        rows.append(acc)
    F = jnp.stack(rows, axis=1)
    F = jnp.fft.ifft(F, axis=2, norm="ortho")
    F = jnp.fft.ifft(F, axis=3, norm="ortho")
    return jnp.fft.irfft(F, n=spatial[2], axis=4, norm="ortho").astype(m.dtype)


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sp = (res,) * 3
    rng = np.random.default_rng(0)
    metric = lm.FluidMetric([0.1, 0.0, 0.01])
    params = (0.1, 0.0, 0.01)

    def mk_m():
        return jnp.asarray(rng.standard_normal((B, 3) + sp), dtype=jnp.float32)

    m = mk_m()
    ref = jax.jit(metric.sharp)(m)
    for name, fn in (("c2c", sharp_c2c), ("composed", sharp_composed)):
        got = jax.jit(lambda x, fn=fn: fn(x, params))(m)
        err = float(jnp.abs(got - ref).max())
        sc = float(jnp.abs(ref).max())
        print(f"{name} sharp rel err: {err / sc:.3e}", flush=True)

    measure("sharp rfftn (current)", metric.sharp, mk_m)
    measure("sharp c2c fftn", lambda x: sharp_c2c(x, params), mk_m)
    measure("sharp composed rfft+fft+fft", lambda x: sharp_composed(x, params), mk_m)


if __name__ == "__main__":
    main()
