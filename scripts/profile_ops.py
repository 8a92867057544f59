"""Per-op TPU microbenchmarks: time each hot op in isolation (N reps inside
one jitted scan, so dispatch latency doesn't pollute the numbers)."""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import lagomorph_tpu as lm
from lagomorph_tpu.ops.fluid import fluid_operator


def timeit(name, fn, *args, reps=10):
    run = jax.jit(lambda *a: jax.lax.scan(lambda c, _: (fn(*((c,) + a[1:])), None), a[0], None, length=reps)[0])
    out = run(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(*args)
    jax.block_until_ready(out)
    t1 = time.perf_counter()
    per = (t1 - t0) / reps * 1000
    print(f"{name:40s} {per:10.2f} ms/call")
    return per


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    rng = np.random.default_rng(0)
    sp = (res, res, res)
    m = jnp.asarray(rng.standard_normal((B, 3) + sp) * 1e-3, dtype=jnp.float32)
    I = jnp.asarray(rng.standard_normal((1, 1) + sp), dtype=jnp.float32)
    u = jnp.asarray(rng.standard_normal((B, 3) + sp), dtype=jnp.float32)
    metric = lm.FluidMetric([0.1, 0.0, 0.01])

    vol_gb = B * 3 * res**3 * 4 / 1e9
    print(f"res={res} B={B}  vector field = {vol_gb*1e3:.1f} MB")

    timeit("sharp (rfft+mul+irfft)", lambda x: metric.sharp(x), m)
    timeit("jtv (stencil)", lambda x: lm.jacobian_times_vectorfield(x, x), u)
    timeit("interp vec (3ch gather)", lambda x: lm.interp(x, x), u)
    timeit("interp img bcast", lambda x: lm.interp(I, x), u)
    timeit(
        "interp vjp (splat+lerpgrad)",
        lambda x: jax.grad(lambda y: jnp.sum(lm.interp(y, y)))(x),
        u,
    )
    timeit("Ad_star", lambda x: lm.Ad_star(x, x), u)
    timeit("EPDiff_step", lambda x: lm.EPDiff_step(metric, m, 0.1, x), u)
    timeit("expmap fwd 5", lambda x: lm.expmap(metric, x, num_steps=5), m, reps=3)

    def loss(mm):
        h = lm.expmap(metric, mm, num_steps=5)
        Idef = lm.interp(I, h)
        return jnp.sum(Idef**2)

    timeit("expmap fwd+bwd 5", lambda x: jax.grad(loss)(x), m, reps=3)


if __name__ == "__main__":
    main()
