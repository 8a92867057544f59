"""Decompose the atlas-step cost: time each EPDiff substep component with
reps amortized INSIDE one executable (lax.scan with chained inputs), so the
remote-tunnel per-dispatch latency (~20 ms) doesn't pollute per-op numbers.

Usage: python scripts/step_profile.py [res] [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import lagomorph_tpu as lm
from lagomorph_tpu import adjrep, deform
from lagomorph_tpu.ops import diff as odiff
from lagomorph_tpu.lddmm import make_lddmm_atlas_step

K = 6  # amortization reps


def measure(name, fn, make_input):
    """Report ((time at K reps) - (time at 1 rep)) / (K-1): pure per-call
    cost with dispatch+transfer subtracted.  The scan carry chains a tiny
    function of the output into the next input, defeating memoization."""
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
            _ = float(runs[reps](make_input()))  # compile+warm exact program
        ts = {}
        for reps in (1, K):
            x = make_input()
            jax.block_until_ready(x)
            t0 = time.perf_counter()
            _ = float(runs[reps](x))
            ts[reps] = time.perf_counter() - t0
        per = (ts[K] - ts[1]) / (K - 1) * 1000
        print(f"{name:44s} {per:9.2f} ms", flush=True)
        return per
    except Exception as e:
        print(f"{name:44s} FAILED {str(e)[:140]}", flush=True)
        return None


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sp = (res, res, res)
    rng = np.random.default_rng(0)
    metric = lm.FluidMetric([0.1, 0.0, 0.01])

    m0 = jnp.asarray(rng.standard_normal((B, 3) + sp) * 2e-6, dtype=jnp.float32)
    I = jnp.asarray(rng.standard_normal((1, 1) + sp), dtype=jnp.float32)
    img = jnp.asarray(rng.standard_normal((B, 1) + sp), dtype=jnp.float32)

    def mk_phi():
        return jnp.asarray(rng.uniform(-0.9, 0.9, (B, 3) + sp), dtype=jnp.float32)

    def mk_m():
        return jnp.asarray(
            rng.standard_normal((B, 3) + sp) * 2e-6, dtype=jnp.float32
        )

    v = jnp.asarray(rng.uniform(-0.15, 0.15, (B, 3) + sp), dtype=jnp.float32)

    print(f"=== res {res}^3 batch {B} (scan-amortized) ===", flush=True)

    # forward components
    measure("warp tier1 (pallas) fwd",
            lambda p: lm.interp_auto(m0, p, mode="unit"), mk_phi)
    measure("jtv displacement fwd",
            lambda p: odiff.jacobian_times_vectorfield(p, m0, displacement=True),
            mk_phi)
    measure("Ad_star fwd (warp+jtv)",
            lambda p: adjrep.Ad_star(p, m0, mode="unit"), mk_phi)
    measure("sharp (fft) fwd", lambda m: metric.sharp(m), mk_m)
    measure("compose fwd",
            lambda p: deform.compose_disp_vel(p, v, dt=-0.2, mode="unit"), mk_phi)

    def substep(p):
        return lm.EPDiff_step(metric, m0, 0.2, p,
                              transport_mode="unit", compose_mode="unit")

    measure("EPDiff substep fwd (static unit)", substep, mk_phi)

    def substep_auto(p):
        return lm.EPDiff_step(metric, m0, 0.2, p)

    measure("EPDiff substep fwd (auto tiers)", substep_auto, mk_phi)

    # fwd+bwd components
    def g(fn):
        return lambda *a: jax.grad(lambda *b: jnp.sum(jnp.sin(fn(*b))))(*a)

    measure("warp tier1 fwd+bwd",
            g(lambda p: lm.interp_auto(m0, p, mode="unit")), mk_phi)
    measure("jtv fwd+bwd",
            g(lambda p: odiff.jacobian_times_vectorfield(p, m0, displacement=True)),
            mk_phi)
    measure("Ad_star fwd+bwd",
            g(lambda p: adjrep.Ad_star(p, m0, mode="unit")), mk_phi)
    measure("sharp fwd+bwd", g(lambda m: metric.sharp(m)), mk_m)
    measure("compose fwd+bwd",
            g(lambda p: deform.compose_disp_vel(p, v, dt=-0.2, mode="unit")),
            mk_phi)
    measure("EPDiff substep fwd+bwd (static)", g(substep), mk_phi)
    measure("EPDiff substep fwd+bwd (auto)", g(substep_auto), mk_phi)

    measure("atlas warp bcast fwd+bwd",
            g(lambda h: lm.interp_auto(I, h, mode="unit")), mk_phi)

    # full atlas step as in bench.py
    step = make_lddmm_atlas_step(
        metric, reg_weight=0.1, learning_rate_pose=1e-6,
        lddmm_steps=1, integration_steps=5,
    )
    measure("FULL atlas step (auto tiers)",
            lambda m: step(I, m, img)[0], mk_m)

    def loss_static(m):
        h = lm.expmap(metric, m, num_steps=5,
                      transport_mode="unit", compose_mode="unit")
        Idef = lm.interp_auto(I, h, mode="unit")
        vv = metric.sharp(m)
        sq = jnp.sum((Idef - img) ** 2)
        return sq / img.size + 0.1 * jnp.sum(vv * m) / img.size

    def step_static(m):
        _, gm = jax.value_and_grad(loss_static)(m)
        return m - 1e-6 * gm

    measure("FULL atlas step (static unit)", step_static, mk_m)


if __name__ == "__main__":
    main()
