"""Diagnose the scan-wrapper cliff: time scan-N of the atlas step under
different warp modes vs a chained Python loop of single jitted steps."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
import lagomorph_tpu as lm
from lagomorph_tpu.lddmm import make_lddmm_atlas_step
import importlib
interp_mod = importlib.import_module('lagomorph_tpu.ops.interp')

res = int(sys.argv[1]) if len(sys.argv) > 1 else 48
B = int(sys.argv[2]) if len(sys.argv) > 2 else 2
N = 4
sp = (res, res, res)
rng = np.random.default_rng(0)
metric = lm.FluidMetric([0.1, 0.0, 0.01])


def fresh():
    I = jnp.asarray(rng.standard_normal((1, 1) + sp), dtype=jnp.float32)
    m = jnp.asarray(rng.standard_normal((B, 3) + sp) * 2e-6, dtype=jnp.float32)
    img = jnp.asarray(rng.standard_normal((B, 1) + sp), dtype=jnp.float32)
    return I, m, img


def time_mode(mode):
    prev = interp_mod.set_warp_mode(mode)
    try:
        step = make_lddmm_atlas_step(metric, reg_weight=0.1,
                                     learning_rate_pose=1e-6, integration_steps=5)

        def many(I, m, img):
            def body(carry, _):
                m, acc = carry
                m, gI, loss, reg = step(I, m, img)
                return (m, acc + gI), loss
            (m, acc), losses = jax.lax.scan(body, (m, jnp.zeros_like(I)), None, length=N)
            return m, acc, losses

        run = jax.jit(many)
        I, m, img = fresh()
        out = run(I, m, img); _ = float(out[2][-1])
        I, m, img = fresh()
        t0 = time.perf_counter()
        out = run(I, m, img); _ = float(out[2][-1])
        t1 = time.perf_counter()
        print(f"scan-{N} mode={mode:8s}: {(t1-t0)/N*1000:9.1f} ms/step", flush=True)

        jstep = jax.jit(step)
        I, m, img = fresh()
        out = jstep(I, m, img); _ = float(out[2])
        I, m, img = fresh()
        t0 = time.perf_counter()
        for _i in range(N):
            m, gI, loss, reg = jstep(I, m, img)
        _ = float(loss)
        t1 = time.perf_counter()
        print(f"loop-{N} mode={mode:8s}: {(t1-t0)/N*1000:9.1f} ms/step", flush=True)
    finally:
        interp_mod.set_warp_mode(prev)


time_mode("unit")
time_mode("auto")
