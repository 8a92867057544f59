"""Sweep Pallas block sizes (BX, BY) for the fused Ad* kernels at a given
resolution; prints per-combo timings.  Monkeypatches the block pickers so
each combo traces a fresh kernel.

Usage: python scripts/block_sweep.py [res] [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import lagomorph_tpu.ops.pallas.warp_unit as wu
import lagomorph_tpu.ops.pallas.epdiff_unit as eu

K = 6


def measure(fn, make_input):
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
        return (ts[K] - ts[1]) / (K - 1) * 1000
    except Exception as e:
        return f"FAIL {str(e)[:80]}"


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sp = (res,) * 3
    rng = np.random.default_rng(0)
    m0 = jnp.asarray(rng.standard_normal((B, 3) + sp), dtype=jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, 3) + sp), dtype=jnp.float32)

    def mk_p():
        return jnp.asarray(rng.uniform(-0.9, 0.9, (B, 3) + sp), dtype=jnp.float32)

    orig_pick_block = wu._pick_block
    orig_pick_by = wu._pick_by
    orig_pick_by_bwd = eu._pick_by_bwd

    orig_fwd_blocks = eu._fwd_blocks

    def set_blocks(bx, by_fwd, by_bwd):
        wu._pick_block = lambda X, YZ=0: bx if X % bx == 0 else 0
        wu._pick_by = lambda Y, Z: by_fwd if Y % by_fwd == 0 else 0
        eu._pick_bx_bwd = lambda X: bx if X % bx == 0 else 0
        eu._pick_by_bwd = (
            lambda Y, Z, BX=16: by_bwd if Y % by_bwd == 0 else 0
        )
        # the fused fwd kernels pick their own (BX, BY) — patch it too
        # (round-3 fix: earlier sweeps left the fwd geometry unpatched)
        eu._fwd_blocks = lambda X, Y, Z: (
            (bx, by_fwd) if (X % bx == 0 and Y % by_fwd == 0) else None
        )

    ref = jnp.asarray(rng.standard_normal((B, 3) + sp), dtype=jnp.float32)

    print(f"=== adstar fused fwd (res {res}, b{B}) ===", flush=True)
    for bx in (8, 16, 32):
        for by in (8, 16, 32, 64):
            if res % bx or res % by:
                continue
            set_blocks(bx, by, 8)
            t = measure(lambda x: eu.ad_star_unit_pallas(x, m0), mk_p)
            val = jax.jit(eu.ad_star_unit_pallas)(mk_p(), m0)
            print(f"BX={bx:3d} BY={by:3d}: {t if isinstance(t, str) else f'{t:7.2f} ms'}",
                  flush=True)

    print(f"=== adstar fused bwd only (res {res}, b{B}) ===", flush=True)
    for bx in (8, 16, 32):
        for by in (4, 8, 16, 32):
            if res % bx or res % by:
                continue
            set_blocks(bx, 32 if res % 32 == 0 else 8, by)
            # fixed stand-in mw residual: keeps the timed region bwd-only
            # (values don't affect kernel runtime)
            def bwd(x, mw=g * 0.5):
                return eu._adstar_bwd_fused_dispatch(x, m0, g, mw)
            t = measure(bwd, mk_p)
            print(f"BX={bx:3d} BYb={by:3d}: {t if isinstance(t, str) else f'{t:7.2f} ms'}",
                  flush=True)

    print(f"=== compose fused bwd only (res {res}, b{B}) ===", flush=True)
    orig_pick_by_cbwd = eu._pick_by_cbwd
    orig_pick_bx_bwd = eu._pick_bx_bwd
    for bx in (8, 16, 32):
        for by in (8, 16, 32):
            if res % bx or res % by:
                continue
            wu._pick_block = lambda X, YZ=0, bx=bx: bx if X % bx == 0 else 0
            eu._pick_bx_bwd = lambda X, bx=bx: bx if X % bx == 0 else 0
            eu._pick_by_cbwd = (
                lambda Y, Z, BX=16, by=by: by if Y % by == 0 else 0
            )

            def cbwd(x):
                return eu._compose_bwd_fused_dispatch(x, m0, 0.2, g)

            t = measure(cbwd, mk_p)
            print(f"BX={bx:3d} BYc={by:3d}: {t if isinstance(t, str) else f'{t:7.2f} ms'}",
                  flush=True)
    eu._pick_by_cbwd = orig_pick_by_cbwd
    eu._pick_bx_bwd = orig_pick_bx_bwd

    wu._pick_block = orig_pick_block
    wu._pick_by = orig_pick_by
    eu._pick_by_bwd = orig_pick_by_bwd
    eu._fwd_blocks = orig_fwd_blocks


if __name__ == "__main__":
    main()
