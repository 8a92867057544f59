"""Decompose the PRODUCTION padres shooting path kernel by kernel.

Round-4's isolated bwd_sweep wins (Ad* bwd 4.49 ms, compose bwd 3.17 ms
@128^3 b4) never showed up in the driver metric (11.95 -> 12.02 scan
steps/s).  bwd_sweep times `eu._adstar_bwd_fused_dispatch` (the UNPADDED
dispatch); the bench runs `padres._adstar_bwd_pr` (the padded-resident
wrappers).  This script times the padres wrappers themselves, plus every
other stage of the production substep, scan-amortized with chained inputs
(CLAUDE.md methodology), so the two can finally be reconciled.

Usage: python scripts/padres_decomp.py [res] [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import lagomorph_tpu as lm
from lagomorph_tpu.ops.pallas import padres as pr
import lagomorph_tpu.ops.pallas.epdiff_unit as eu  # noqa: F401

K = 6


def measure(name, fn, make_input, rest=(), samples=3):
    """Per-call ms of fn(x, *rest): ((K reps) - (1 rep)) / (K - 1),
    scan-amortized, median over `samples` interleaved pairs."""
    try:
        runs = {}
        for reps in (1, K):
            def body(x, rest, reps=reps):
                def step(c, _):
                    out = fn(c, *rest)
                    leaf = jax.tree_util.tree_leaves(out)[0]
                    return jax.tree_util.tree_map(
                        lambda t: t * (1.0 + 1e-30 * jnp.sum(leaf)), c
                    ), None
                c, _ = jax.lax.scan(step, x, None, length=reps)
                return sum(jnp.sum(t) for t in jax.tree_util.tree_leaves(c))
            runs[reps] = jax.jit(body)
            _ = float(runs[reps](make_input(), rest))
        vals = []
        for _s in range(samples):
            ts = {}
            for reps in (1, K):
                x = make_input()
                jax.block_until_ready(x)
                t0 = time.perf_counter()
                _ = float(runs[reps](x, rest))
                ts[reps] = time.perf_counter() - t0
            vals.append((ts[K] - ts[1]) / (K - 1) * 1000)
        vals.sort()
        per = vals[len(vals) // 2]
        print(f"{name:46s} {per:9.2f} ms", flush=True)
        return per
    except Exception as e:
        print(f"{name:46s} FAILED {str(e)[:140]}", flush=True)


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    X = Y = Z = res
    rng = np.random.default_rng(0)
    metric = lm.FluidMetric([0.1, 0.0, 0.01])

    def f32(*shape, scale=1.0):
        return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)

    m0 = f32(B, 3, X, Y, Z, scale=0.3)
    mpad = pr.pad_carry(m0)

    def mk_ppad():
        return pr.pad_carry(f32(B, 3, X, Y, Z, scale=0.3))

    def mk_m():
        return f32(B, 3, X, Y, Z, scale=0.3)

    dt = -0.2

    print(f"=== padres production kernels (res {res}, b{B}) ===", flush=True)

    # ---- individual padres wrappers ------------------------------------
    measure("adstar_pr fwd (no mw)",
            lambda p, mp: pr.ad_star_pr(p, mp, X, Y, Z), mk_ppad, (mpad,))
    measure("adstar_pr fwd (mw residual variant)",
            lambda p, mp: pr._adstar_fwd_pr(p, mp, X, Y, Z, want_mw=True),
            mk_ppad, (mpad,))
    measure("adstar_pr fwd+bwd (VJP)",
            lambda p, mp: jax.grad(
                lambda pp: jnp.sum(pr.ad_star_pr(pp, mp, X, Y, Z)[0])
            )(p), mk_ppad, (mpad,))

    # backward kernel alone, stand-in residuals (values don't change time)
    gpad = pr._zero_pad_g(f32(B, 3, X, Y, Z))
    mwpad = pr._zero_pad_g(f32(B, 3, X, Y, Z))
    measure("adstar_bwd_pr kernel alone",
            lambda p, mp, gp, mw: pr._adstar_bwd_pr(p, mp, gp, mw, X, Y, Z),
            mk_ppad, (mpad, gpad, mwpad))

    measure("compose_pr fwd",
            lambda p, v: pr.compose_pr(p, v, dt, X, Y, Z), mk_ppad, (mk_m(),))
    measure("compose_pr fwd+bwd (VJP)",
            lambda p, v: jax.grad(
                lambda pp: jnp.sum(pr.compose_pr(pp, v, dt, X, Y, Z)[0])
            )(p), mk_ppad, (mk_m(),))
    vpad = pr.pad_carry(f32(B, 3, X, Y, Z, scale=0.3))
    measure("compose_bwd_pr kernel alone",
            lambda p, vp, gp: pr._compose_bwd_pr(p, vp, gp, dt, X, Y, Z),
            mk_ppad, (vpad, gpad))

    measure("sharp fwd", lambda m: metric.sharp(m), mk_m)
    measure("sharp fwd+bwd",
            lambda m: jax.grad(lambda mm: jnp.sum(metric.sharp(mm)))(m),
            mk_m)

    # ---- one full padres substep ---------------------------------------
    def substep(ppad):
        m, f1 = pr.ad_star_pr(ppad, mpad, X, Y, Z)
        v = metric.sharp(m)
        ppad2, f2 = pr.compose_pr(ppad, v, dt, X, Y, Z)
        return ppad2

    measure("padres substep fwd", substep, mk_ppad)
    measure("padres substep fwd+bwd",
            lambda p: jax.grad(lambda pp: jnp.sum(substep(pp)))(p), mk_ppad)

    # ---- the full production expmap (hoisted, padres scan, cond) -------
    measure("expmap fwd (production, 5 steps)",
            lambda m: lm.expmap(metric, m, num_steps=5),
            lambda: mk_m() * 1e-5)
    measure("expmap fwd+bwd (production, 5 steps)",
            lambda m: jax.grad(
                lambda mm: jnp.sum(lm.expmap(metric, mm, num_steps=5) ** 2)
            )(m), lambda: mk_m() * 1e-5)


if __name__ == "__main__":
    main()
