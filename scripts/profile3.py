"""Truthful TPU timing: the remote runtime caches identical dispatches, so
every timed call uses fresh input data, and cost is measured as
time(reps=K) - time(reps=1) to cancel dispatch/transfer overhead."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
import lagomorph_tpu as lm

res = int(sys.argv[1]) if len(sys.argv) > 1 else 64
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
K = 8
rng = np.random.default_rng(0)
sp = (res, res, res)
metric = lm.FluidMetric([0.1, 0.0, 0.01])


def measure(name, fn, make_input):
    runs = {}
    for reps in (1, K):
        runs[reps] = jax.jit(
            lambda x, reps=reps: jax.lax.scan(
                lambda c, _: (fn(c), None), x, None, length=reps
            )[0]
        )
        out = runs[reps](make_input())  # compile
        jax.block_until_ready(out)
    ts = {}
    for reps in (1, K):
        x = make_input()
        t0 = time.perf_counter()
        out = runs[reps](x)
        jax.block_until_ready(out)
        ts[reps] = time.perf_counter() - t0
    per = (ts[K] - ts[1]) / (K - 1) * 1000
    print(f"{name:32s} {per:10.2f} ms/call   (t1={ts[1]*1e3:.1f}ms tK={ts[K]*1e3:.1f}ms)")
    return per


def fresh_m():
    return jnp.asarray(rng.standard_normal((B, 3) + sp) * 1e-3, dtype=jnp.float32)


def fresh_u():
    return jnp.asarray(rng.standard_normal((B, 3) + sp), dtype=jnp.float32)


I = jnp.asarray(rng.standard_normal((1, 1) + sp), dtype=jnp.float32)

measure("sharp", lambda x: metric.sharp(x), fresh_m)
measure("jtv", lambda x: lm.jacobian_times_vectorfield(x, x), fresh_u)
measure("interp vec", lambda x: lm.interp(x, x), fresh_u)
measure("interp img bcast 3ch-out",
        lambda x: lm.interp(I, x) + x, fresh_u)
measure("interp vjp", lambda x: jax.grad(lambda y: jnp.sum(lm.interp(y, y)))(x), fresh_u)
measure("compose_disp_vel", lambda x: lm.compose_disp_vel(x, x, dt=-0.2), fresh_u)
measure("Ad_star", lambda x: lm.Ad_star(x, x), fresh_u)
measure("EPDiff_step", lambda x: lm.EPDiff_step(metric, x, 0.1, x), fresh_m)
