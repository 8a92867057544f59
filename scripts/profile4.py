"""Fetch-forced TPU timing: every timed call uses fresh inputs AND ends with
a tiny host fetch so async scheduling can't fake completion."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
import lagomorph_tpu as lm

res = int(sys.argv[1]) if len(sys.argv) > 1 else 64
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
K = 4
rng = np.random.default_rng(0)
sp = (res, res, res)
metric = lm.FluidMetric([0.1, 0.0, 0.01])


def measure(name, fn, make_input):
    runs = {}
    for reps in (1, K):
        def body(x, reps=reps):
            out = jax.lax.scan(lambda c, _: (fn(c), None), x, None, length=reps)[0]
            return jnp.sum(out)  # scalar output forces full execution
        runs[reps] = jax.jit(body)
        _ = float(runs[reps](make_input()))  # compile+run
    ts = {}
    for reps in (1, K):
        x = make_input()
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        _ = float(runs[reps](x))  # fetch scalar -> must complete
        ts[reps] = time.perf_counter() - t0
    per = (ts[K] - ts[1]) / (K - 1) * 1000
    print(f"{name:32s} {per:10.2f} ms/call   (t1={ts[1]*1e3:.1f}ms tK={ts[K]*1e3:.1f}ms)", flush=True)


def fresh_m():
    return jnp.asarray(rng.standard_normal((B, 3) + sp) * 1e-3, dtype=jnp.float32)


I = jnp.asarray(np.random.default_rng(1).standard_normal((1, 1) + sp), dtype=jnp.float32)

measure("sharp", lambda x: metric.sharp(x), fresh_m)
measure("jtv", lambda x: lm.jacobian_times_vectorfield(x, x), fresh_m)
measure("interp vec", lambda x: lm.interp(x, x), fresh_m)
measure("interp vjp", lambda x: jax.grad(lambda y: jnp.sum(lm.interp(y, y)))(x), fresh_m)
measure("EPDiff_step", lambda x: lm.EPDiff_step(metric, x, 0.1, x), fresh_m)
