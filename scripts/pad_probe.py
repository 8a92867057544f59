"""Quantify the hidden XLA pad copies around the fused Pallas kernels and
the hoisted-flag/cond overhead of the fast shooting path.

Hypotheses (round 3):
  * every fused-kernel dispatch pays 1-3 `jnp.pad` copies (~0.27 ms each at
    128^3 b4) because the kernels consume edge-padded, lane-flattened slabs
    that XLA cannot fuse into pallas_call inputs;
  * the trajectory-validity flag + lax.cond of `_expmap_hoisted` costs
    ~4 ms/step over the static-tier scan.

Rows measured (scan-amortized, chained inputs — CLAUDE.md methodology):
  adstar fwd (dispatch)        - ad_star_unit_pallas(p, m0), pads inside
  adstar fwd (prepadded)       - the inner pallas_call on pre-padded slabs
  compose fwd (dispatch/prepad)- same pair for the fused composition
  expmap static fwd+bwd        - transport/compose_mode="unit" scan
  expmap flagged fwd+bwd       - static scan + in-unit flags, no cond
  expmap auto fwd+bwd          - full hoisted path (flags + final cond)

Usage: python scripts/pad_probe.py [res] [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import lagomorph_tpu as lm
import lagomorph_tpu.ops.pallas.warp_unit as wu
import lagomorph_tpu.ops.pallas.epdiff_unit as eu
from lagomorph_tpu import lddmm as L

K = 6


def measure(name, fn, make_input):
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


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sp = (res,) * 3
    X = Y = Z = res
    rng = np.random.default_rng(0)

    p = jnp.asarray(rng.uniform(-1.0, 0.999, (B, 3) + sp), dtype=jnp.float32)
    m0 = jnp.asarray(rng.standard_normal((B, 3) + sp), dtype=jnp.float32)

    def mk_p():
        return jnp.asarray(
            rng.uniform(-1.0, 0.999, (B, 3) + sp), dtype=jnp.float32
        )

    # --- pad-cost isolation on the forward kernels ---
    measure("adstar fwd (dispatch, pads inside)",
            lambda x: eu.ad_star_unit_pallas(x, m0), mk_p)

    if wu.yblocked_supported(m0.shape, p.shape, p.dtype):
        w1 = [(0, 0), (0, 0), (8, 8), (1, 1), (0, 0)]
        mpad = jnp.pad(m0, w1, mode="edge").reshape(B, 3, X + 16, (Y + 2) * Z)

        def mk_ppad():
            return jnp.pad(mk_p(), w1, mode="edge").reshape(
                B, 3, X + 16, (Y + 2) * Z
            )

        measure("adstar fwd (pre-padded slabs)",
                lambda xp: eu._adstar_fwd_yb(xp, mpad, X, Y, Z), mk_ppad)
    elif wu.supported(m0.shape, p.shape, p.dtype):
        w1 = [(0, 0), (0, 0), (8, 8), (0, 0), (0, 0)]
        mpad = jnp.pad(m0, w1, mode="edge").reshape(B, 3, X + 16, Y * Z)

        def mk_ppad():
            return jnp.pad(mk_p(), w1, mode="edge").reshape(
                B, 3, X + 16, Y * Z
            )

        measure("adstar fwd (pre-padded slabs)",
                lambda xp: eu._adstar_fwd_wholey(xp, mpad, X, Y, Z), mk_ppad)

    v = jnp.asarray(rng.standard_normal((B, 3) + sp), dtype=jnp.float32)
    measure("compose fwd (dispatch, pads inside)",
            lambda x: eu.compose_disp_vel_pallas(x, v, -0.2), mk_p)

    # --- flag/cond isolation on the full shooting fwd+bwd ---
    metric = lm.FluidMetric([0.1, 0.0, 0.01])

    def mk_m():
        return jnp.asarray(
            rng.standard_normal((B, 3) + sp) * 2e-6, dtype=jnp.float32
        )

    def shoot_loss_static(m):
        h = lm.expmap(metric, m, num_steps=5,
                      transport_mode="unit", compose_mode="unit")
        return jnp.sum(h * h)

    def shoot_loss_flagged(m):
        v0 = metric.sharp(m)
        phiinv = (-0.2) * v0
        fused = L._hoisted_fused_pair(m)
        h, ok = L._expmap_fast_flagged(
            metric, m, 0.2, 4, phiinv, None, False, fused
        )
        # consume ok without a cond so only the flag cost is measured
        return jnp.sum(h * h) + 1e-30 * ok.astype(jnp.float32)

    def shoot_loss_auto(m):
        h = lm.expmap(metric, m, num_steps=5)
        return jnp.sum(h * h)

    measure("expmap(5) static fwd+bwd",
            jax.grad(shoot_loss_static), mk_m)
    measure("expmap(5) flagged-no-cond fwd+bwd",
            jax.grad(shoot_loss_flagged), mk_m)
    measure("expmap(5) auto (flags+cond) fwd+bwd",
            jax.grad(shoot_loss_auto), mk_m)


if __name__ == "__main__":
    main()
