"""Locate the ~23 ms/step of expmap wrapper overhead at 128^3 b4.

padres_decomp (round 5) measured substep fwd+bwd = 12.67 ms but production
expmap fwd+bwd = 76.68 ms; peel + 4 substeps only accounts for ~53 ms.
Suspects: lax.scan residual stacking (dynamic-update-slice per step),
the final general-tier fallback cond, pad/unpad VJP folds, the reg term.

Variants timed (fwd+bwd of sum(phiinv^2), scan-amortized, chained inputs):
  scan    — _expmap_fast_padres as shipped (lax.scan over substeps)
  unroll  — same math, Python-unrolled substep loop (no scan stacking)
  +cond   — expmap proper (adds the validity cond + general fallback trace)
  +reg    — expmap + the 0.1*sum(v*m) regularizer (adds shared sharp)

Usage: python scripts/expmap_probe.py [res] [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import lagomorph_tpu as lm
from lagomorph_tpu import lddmm
from lagomorph_tpu.ops.pallas import padres as pr

K = 6


def measure(name, fn, make_input, samples=3):
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
        vals = []
        for _s in range(samples):
            ts = {}
            for reps in (1, K):
                x = make_input()
                jax.block_until_ready(x)
                t0 = time.perf_counter()
                _ = float(runs[reps](x))
                ts[reps] = time.perf_counter() - t0
            vals.append((ts[K] - ts[1]) / (K - 1) * 1000)
        vals.sort()
        per = vals[len(vals) // 2]
        print(f"{name:52s} {per:9.2f} ms", flush=True)
        return per
    except Exception as e:
        print(f"{name:52s} FAILED {str(e)[:160]}", flush=True)


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    X = Y = Z = res
    T = 5
    dt = 1.0 / T
    rng = np.random.default_rng(0)
    metric = lm.FluidMetric([0.1, 0.0, 0.01])

    def mk_m():
        return jnp.asarray(
            rng.standard_normal((B, 3, X, Y, Z)) * 2e-6, dtype=jnp.float32
        )

    def fast_scan(m0, length):
        """_expmap_fast_padres inlined: peel (phiinv1 = -dt*v0) + scan."""
        v0 = metric.sharp(m0)
        phiinv = (-dt) * v0
        out, ok = lddmm._expmap_fast_padres(
            metric, m0, dt, length, phiinv, None, False
        )
        return out

    def fast_unroll(m0, length):
        """Same math, Python-unrolled (no lax.scan residual stacking)."""
        v0 = metric.sharp(m0)
        phiinv = (-dt) * v0
        mpad = pr.pad_carry(m0)
        ppad = pr.pad_carry(phiinv)
        for _ in range(length):
            m, f1 = pr.ad_star_pr(ppad, mpad, X, Y, Z)
            v = metric.sharp(m)
            ppad, f2 = pr.compose_pr(ppad, v, -dt, X, Y, Z)
        return pr.unpad_carry(ppad, X, Y, Z)

    for name, fn in (("scan", fast_scan), ("unroll", fast_unroll)):
        measure(f"fast path fwd [{name}]",
                lambda m, fn=fn: fn(m, T - 1), mk_m)
        measure(f"fast path fwd+bwd [{name}]",
                lambda m, fn=fn: jax.grad(
                    lambda mm: jnp.sum(fn(mm, T - 1) ** 2)
                )(m), mk_m)

    measure("expmap fwd+bwd (+cond, production)",
            lambda m: jax.grad(
                lambda mm: jnp.sum(lm.expmap(metric, mm, num_steps=T) ** 2)
            )(m), mk_m)

    def with_reg(m0):
        v = metric.sharp(m0)
        h = lm.expmap(metric, m0, num_steps=T, v0=v)
        return jnp.sum(h ** 2) + 0.1 * jnp.sum(v * m0)

    measure("expmap fwd+bwd (+cond +reg, shared v0)",
            lambda m: jax.grad(with_reg)(m), mk_m)


if __name__ == "__main__":
    main()
