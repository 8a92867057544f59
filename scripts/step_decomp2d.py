"""Decompose the 2D atlas step at a given res (VERDICT r3 #7: 2D is ~14x
off its HBM roofline and nobody has profiled where the step goes).

Times, scan-amortized with chained inputs (the relay memoizes identical
executions — see CLAUDE.md): fused Ad*2d fwd / fwd+bwd, fluid sharp fwd /
fwd+bwd, fused compose2d fwd / fwd+bwd, one EPDiff substep fwd+bwd, the
5-step shooting, and the full atlas step.

Usage: python scripts/step_decomp2d.py [res] [batch]
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
import lagomorph_tpu.ops.pallas.epdiff2d as e2

K = 8


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
        ms = (ts[K] - ts[1]) / (K - 1) * 1000
        print(f"{name:38s}: {ms:8.3f} ms", flush=True)
        return ms
    except Exception as e:
        print(f"{name:38s}: FAIL {str(e)[:120]}", flush=True)
        return None


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    sp = (res, res)
    rng = np.random.default_rng(0)
    metric = lm.FluidMetric([0.1, 0.0, 0.01])

    m0 = jnp.asarray(rng.standard_normal((B, 2) + sp), dtype=jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, 2) + sp), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, 2) + sp), dtype=jnp.float32)

    def mk_p():
        return jnp.asarray(
            rng.uniform(-0.9, 0.9, (B, 2) + sp), dtype=jnp.float32
        )

    def mk_m():
        # IN-REGIME momenta: sharp amplifies by 1/gamma^2 = 1e4, so 1e-3
        # momenta produce ~10-voxel displacements, trip the validity flag
        # and time the GENERAL-TIER fallback (the round-4 "906 ms expmap"
        # mystery).  2e-6 matches bench2d's production regime.
        return jnp.asarray(
            rng.standard_normal((B, 2) + sp) * 2e-6, dtype=jnp.float32
        )

    print(f"=== 2D step decomposition @ {res}^2 b{B} (K={K}) ===", flush=True)

    measure("adstar2d fwd", lambda p: e2.ad_star2d_pallas(p, m0), mk_p)
    measure(
        "adstar2d fwd+bwd",
        jax.grad(lambda p: jnp.sum(jnp.sin(e2.ad_star2d_pallas(p, m0)))),
        mk_p,
    )
    measure("sharp fwd", lambda m: metric.sharp(m), mk_m)
    measure(
        "sharp fwd+bwd",
        jax.grad(lambda m: jnp.sum(jnp.sin(metric.sharp(m)))),
        mk_m,
    )
    measure("compose2d fwd", lambda p: e2.compose2d_pallas(p, v, 0.2), mk_p)
    measure(
        "compose2d fwd+bwd",
        jax.grad(
            lambda p: jnp.sum(jnp.sin(e2.compose2d_pallas(p, v, 0.2)))
        ),
        mk_p,
    )

    from lagomorph_tpu.lddmm import expmap

    for nsteps in (1, 5):
        measure(
            f"expmap({nsteps}) fwd",
            lambda m, n=nsteps: expmap(metric, m, num_steps=n),
            mk_m,
        )
        measure(
            f"expmap({nsteps}) fwd+bwd",
            jax.grad(
                lambda m, n=nsteps: jnp.sum(
                    jnp.sin(expmap(metric, m, num_steps=n))
                )
            ),
            mk_m,
        )

    # the shoot2d mega-kernels in isolation (what expmap(5) dispatches to)
    import lagomorph_tpu.ops.pallas.shoot2d as s2

    dt = 1.0 / 5

    def mk_pp():
        m = np.asarray(mk_m())
        v0 = np.asarray(metric.sharp(jnp.asarray(m)))
        return (-dt) * jnp.asarray(v0)

    m5 = mk_m()
    measure(
        "shoot2d(5) kernel fwd",
        lambda pp: s2.shoot2d(pp, m5, metric.params, -dt, 5)[0],
        mk_pp,
    )
    pp5 = mk_pp()
    measure(
        "shoot2d(5) kernel fwd+bwd",
        jax.grad(
            lambda m: jnp.sum(
                jnp.sin(s2.shoot2d(pp5, m, metric.params, -dt, 5)[0])
            )
        ),
        mk_m,
    )

    I = jnp.asarray(rng.standard_normal((1, 1) + sp), dtype=jnp.float32)
    img = jnp.asarray(rng.standard_normal((B, 1) + sp), dtype=jnp.float32)
    step = make_lddmm_atlas_step(
        metric, reg_weight=0.1, learning_rate_pose=1e-6,
        integration_steps=5,
    )
    measure("full atlas step", lambda m: step(I, m, img), mk_m)


if __name__ == "__main__":
    main()
