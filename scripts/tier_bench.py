"""Measure tiered warp costs after the padded-slice restructure."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
import lagomorph_tpu as lm
from lagomorph_tpu.ops.sampling import (
    sample_displacement_unit,
    sample_displacement_bounded,
)
from lagomorph_tpu.ops.interp import interp

res = int(sys.argv[1]) if len(sys.argv) > 1 else 64
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
K = 4
sp = (res, res, res)
rng = np.random.default_rng(0)
metric = lm.FluidMetric([0.1, 0.0, 0.01])


def measure(name, fn, make_input):
    try:
        runs = {}
        for reps in (1, K):
            def body(x, reps=reps):
                def step(c, _):
                    return c + 1e-30 * jnp.sum(fn(c)), None
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
        print(f"{name:34s} {per:9.2f} ms", flush=True)
    except Exception as e:
        print(f"{name:34s} FAILED {str(e)[:110]}", flush=True)


def mk_small():
    return jnp.asarray(rng.uniform(-0.9, 0.9, (B, 3) + sp), dtype=jnp.float32)


def mk_mid():
    return jnp.asarray(rng.uniform(-3.9, 3.9, (B, 3) + sp), dtype=jnp.float32)


measure("tier1 fwd", lambda d: sample_displacement_unit(d, d * 0.5), mk_small)
measure("tier1 vjp", lambda d: jax.grad(lambda x: jnp.sum(sample_displacement_unit(x, x * 0.5)))(d), mk_small)
measure("tier2(R=4) fwd", lambda d: sample_displacement_bounded(d, d, 4), mk_mid)
measure("tier2(R=4) vjp", lambda d: jax.grad(lambda x: jnp.sum(sample_displacement_bounded(x, x, 4)))(d), mk_mid)
measure("sharp", lambda x: metric.sharp(x), mk_small)
measure("EPDiff fwd", lambda x: lm.EPDiff_step(metric, x * 1e-3, 0.2, x * 0.1), mk_small)
measure(
    "EPDiff f+b",
    lambda x: jax.grad(
        lambda y: jnp.sum(lm.EPDiff_step(metric, y * 1e-3, 0.2, y * 0.1))
    )(x),
    mk_small,
)
