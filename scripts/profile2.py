import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
import lagomorph_tpu as lm

res, B = 64, 4
rng = np.random.default_rng(0)
sp = (res, res, res)
m = jnp.asarray(rng.standard_normal((B, 3) + sp) * 1e-3, dtype=jnp.float32)
metric = lm.FluidMetric([0.1, 0.0, 0.01])

def scan_run(fn, reps):
    return jax.jit(lambda x: jax.lax.scan(lambda c, _: (fn(c), None), x, None, length=reps)[0])

for reps in (1, 10, 100):
    run = scan_run(lambda x: metric.sharp(x), reps)
    out = run(m); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = run(m); jax.block_until_ready(out); t1 = time.perf_counter()
    print(f"sharp reps={reps}: total {1000*(t1-t0):.2f} ms, per {1000*(t1-t0)/reps:.3f} ms")

u = jnp.asarray(rng.standard_normal((B, 3) + sp), dtype=jnp.float32)
for reps in (1, 10, 100):
    run = scan_run(lambda x: lm.interp(x, x), reps)
    out = run(u); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = run(u); jax.block_until_ready(out); t1 = time.perf_counter()
    print(f"interp reps={reps}: total {1000*(t1-t0):.2f} ms, per {1000*(t1-t0)/reps:.3f} ms")

# fwd+bwd interp
g = jax.jit(lambda x: jax.grad(lambda y: jnp.sum(lm.interp(y, y)))(x))
for reps in (1, 10):
    run = scan_run(lambda x: jax.grad(lambda y: jnp.sum(lm.interp(y, y)))(x), reps)
    out = run(u); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = run(u); jax.block_until_ready(out); t1 = time.perf_counter()
    print(f"interp f+b reps={reps}: total {1000*(t1-t0):.2f} ms, per {1000*(t1-t0)/reps:.3f} ms")

# one EPDiff step fwd
for reps in (1, 10):
    run = scan_run(lambda x: lm.EPDiff_step(metric, m, 0.1, x), reps)
    out = run(u); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = run(u); jax.block_until_ready(out); t1 = time.perf_counter()
    print(f"EPDiff fwd reps={reps}: total {1000*(t1-t0):.2f} ms, per {1000*(t1-t0)/reps:.3f} ms")
