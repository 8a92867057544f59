"""Decompose the FULL atlas step at a given res: auto vs static tiers,
forward-only vs fwd+bwd, with/without the atlas-warp term — to find where
time goes beyond the EPDiff substeps.

Usage: python scripts/step_decomp.py [res] [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import lagomorph_tpu as lm
from lagomorph_tpu.lddmm import make_lddmm_atlas_step

K = 5


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
        print(f"{name:46s} {per:9.2f} ms", flush=True)
        return per
    except Exception as e:
        print(f"{name:46s} FAILED {str(e)[:120]}", flush=True)


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sp = (res,) * 3
    rng = np.random.default_rng(0)
    metric = lm.FluidMetric([0.1, 0.0, 0.01])
    I = jnp.asarray(rng.standard_normal((1, 1) + sp), dtype=jnp.float32)
    img = jnp.asarray(rng.standard_normal((B, 1) + sp), dtype=jnp.float32)

    def mk_m():
        return jnp.asarray(
            rng.standard_normal((B, 3) + sp) * 2e-6, dtype=jnp.float32
        )

    def loss(m, tm, cm, with_warp=True):
        v = metric.sharp(m)
        h = lm.expmap(metric, m, num_steps=5, v0=v,
                      transport_mode=tm, compose_mode=cm)
        reg = 0.1 * jnp.sum(v * m) / img.size
        if with_warp:
            Idef = lm.interp_auto(I, h, mode=(cm if cm else None))
            return jnp.sum((Idef - img) ** 2) / img.size + reg
        return jnp.sum(h * h) / img.size + reg

    def loss_I(m, II):
        v = metric.sharp(m)
        h = lm.expmap(metric, m, num_steps=5, v0=v)
        reg = 0.1 * jnp.sum(v * m) / img.size
        Idef = lm.interp_auto(II, h)
        return jnp.sum((Idef - img) ** 2) / img.size + reg

    for tm, cm, tag in ((None, None, "auto"), ("unit", "unit", "static")):
        measure(f"shoot fwd only ({tag})",
                lambda m, tm=tm, cm=cm: lm.expmap(
                    metric, m, num_steps=5, transport_mode=tm, compose_mode=cm),
                mk_m)
        measure(f"loss fwd ({tag})",
                lambda m, tm=tm, cm=cm: loss(m, tm, cm), mk_m)
        measure(f"loss fwd+bwd ({tag})",
                lambda m, tm=tm, cm=cm: jax.grad(
                    lambda mm: loss(mm, tm, cm))(m), mk_m)
        measure(f"loss fwd+bwd no-atlas-warp ({tag})",
                lambda m, tm=tm, cm=cm: jax.grad(
                    lambda mm: loss(mm, tm, cm, with_warp=False))(m), mk_m)

    # isolate the atlas-image gradient path: grad wrt m only vs (m, I)
    measure("loss grad wrt m only (auto)",
            lambda m: jax.grad(lambda mm: loss(mm, None, None))(m), mk_m)
    measure("loss grad wrt (m, I) (auto)",
            lambda m: jax.grad(
                lambda mm, II: loss_I(mm, II), argnums=(0, 1))(m, I)[0],
            mk_m)

    step = make_lddmm_atlas_step(
        metric, reg_weight=0.1, learning_rate_pose=1e-6,
        lddmm_steps=1, integration_steps=5,
    )
    measure("FULL atlas step (auto, as bench.py)",
            lambda m: step(I, m, img)[0], mk_m)

    # dispatch-amortized: the measure() harness scans the step on-device,
    # so this line minus the previous one isolates the remote-relay
    # dispatch overhead bench.py pays per Python-loop iteration.
    def step_m_only(m):
        return step(I, m, img)[0]

    measure("FULL step (on-device 3-step scan)",
            lambda m: jax.lax.scan(
                lambda c, _: (step_m_only(c), None), m, None, length=3)[0],
            mk_m)


if __name__ == "__main__":
    main()
