"""Isolate unit-path performance: fwd and vjp of the 27-shift stencil vs the
general gather, and the lax.cond wrapper, on TPU."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
import lagomorph_tpu as lm
from lagomorph_tpu.ops.interp import interp, interp_auto
from lagomorph_tpu.ops.sampling import sample_displacement_unit

res = int(sys.argv[1]) if len(sys.argv) > 1 else 64
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
K = 4
sp = (res, res, res)
rng = np.random.default_rng(0)


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
        print(f"{name:36s} {per:9.2f} ms  (t1={ts[1]*1e3:.0f} tK={ts[K]*1e3:.0f})", flush=True)
    except Exception as e:
        print(f"{name:36s} FAILED {str(e)[:110]}", flush=True)


def mk():
    return jnp.asarray(rng.uniform(-0.9, 0.9, (B, 3) + sp), dtype=jnp.float32)


measure("unit fwd", lambda d: sample_displacement_unit(d, d * 0.5), mk)
measure("general fwd", lambda d: interp(d, d * 0.5), mk)
measure("auto(cond) fwd", lambda d: interp_auto(d, d * 0.5), mk)
measure("unit vjp", lambda d: jax.grad(lambda x: jnp.sum(sample_displacement_unit(x, x * 0.5)))(d), mk)
measure("general vjp", lambda d: jax.grad(lambda x: jnp.sum(interp(x, x * 0.5)))(d), mk)
measure("auto(cond) vjp", lambda d: jax.grad(lambda x: jnp.sum(interp_auto(x, x * 0.5)))(d), mk)
