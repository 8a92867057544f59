"""Split the fused yb Ad* backward's time between its two halves:
the d_p weight-gradient/divergence work and the d_m0 transpose work
(LAGO_BWD_PROBE-gated dead-code variants of the same kernel).  Outputs are
wrong by design in the probe variants — timing only.

Usage: python scripts/bwd_split_probe.py [res] [batch] [preroll_level]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import lagomorph_tpu.ops.pallas.warp_unit as wu  # noqa: F401
import lagomorph_tpu.ops.pallas.epdiff_unit as eu

K = 6


def measure(fn, make_input, rest, samples=3):
    runs = {}
    for reps in (1, K):
        def body(x, rest, reps=reps):
            def step(c, _):
                out = fn(c, *rest)
                leaf = jax.tree_util.tree_leaves(out)[0]
                return c * (1.0 + 1e-30 * jnp.sum(leaf)), None
            c, _ = jax.lax.scan(step, x, None, length=reps)
            return jnp.sum(c)
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
    return vals[len(vals) // 2]


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    lvl = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    eu._BWD_PREROLL_ADSTAR = lvl
    sp = (res,) * 3
    rng = np.random.default_rng(0)
    m0 = jnp.asarray(rng.standard_normal((B, 3) + sp), dtype=jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, 3) + sp), dtype=jnp.float32)
    mw = jnp.asarray(rng.standard_normal((B, 3) + sp), dtype=jnp.float32)

    def mk_p():
        return jnp.asarray(
            rng.uniform(-0.9, 0.9, (B, 3) + sp), dtype=jnp.float32
        )

    print(f"=== adstar bwd split probe (res {res}, b{B}, lvl {lvl}) ===",
          flush=True)
    for probe in ("", "dp", "dm"):
        eu._BWD_PROBE = probe
        t = measure(
            lambda x, m0, g, mw: eu._adstar_bwd_fused_dispatch(x, m0, g, mw),
            mk_p, (m0, g, mw),
        )
        name = {"": "full", "dp": "d_p only", "dm": "d_m0 only"}[probe]
        print(f"{name:10s}: {t:7.2f} ms", flush=True)
    eu._BWD_PROBE = ""


if __name__ == "__main__":
    main()
