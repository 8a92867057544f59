"""Focused bwd-only block sweep for the fused Ad*/compose backwards with
the round-4 mw-residual kernels.  Times ONLY the backward dispatch (fixed
stand-in mw residual — values don't change kernel runtime), scan-amortized.

Usage: python scripts/bwd_sweep.py [res] [batch] [which]
  which: adstar | compose | both (default)
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
    """Per-call ms of ``fn(p, *rest)``: ((K reps) - (1 rep)) / (K-1),
    scan-amortized with chained inputs.  ``rest`` is passed as jit
    ARGUMENTS (closed-over 100MB fields become baked program constants and
    blow the relay's program-size limit).  Median over ``samples``
    interleaved (1, K) pairs — single pairs of small kernels go negative
    under the relay's ±25% drift."""
    try:
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
    except Exception as e:
        return f"FAIL {str(e)[:100]}"


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    which = sys.argv[3] if len(sys.argv) > 3 else "both"
    sp = (res,) * 3
    rng = np.random.default_rng(0)
    m0 = jnp.asarray(rng.standard_normal((B, 3) + sp), dtype=jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, 3) + sp), dtype=jnp.float32)
    mw = jnp.asarray(rng.standard_normal((B, 3) + sp), dtype=jnp.float32)

    def mk_p():
        return jnp.asarray(
            rng.uniform(-0.9, 0.9, (B, 3) + sp), dtype=jnp.float32
        )

    if which in ("adstar", "both"):
        print(f"=== adstar fused bwd only (res {res}, b{B}) ===", flush=True)
        for bx, by in ((32, 8), (32, 16), (16, 16), (16, 8), (32, 4),
                       (32, 2), (16, 4), (8, 8)):
            if res % bx or res % by:
                continue
            eu._pick_bx_bwd = lambda X, bx=bx: bx if X % bx == 0 else 0
            eu._pick_by_bwd = (
                lambda Y, Z, BX=16, by=by: by if Y % by == 0 else 0
            )
            t = measure(
                lambda x, m0, g, mw: eu._adstar_bwd_fused_dispatch(
                    x, m0, g, mw
                ),
                mk_p, (m0, g, mw),
            )
            msg = t if isinstance(t, str) else f"{t:7.2f} ms"
            print(f"BX={bx:3d} BY={by:3d}: {msg}", flush=True)

    if which == "preroll":
        # A/B the _BWD_PREROLL restructure levels at the default block
        print(f"=== adstar bwd preroll A/B (res {res}, b{B}) ===", flush=True)
        for lvl in (1, 4):
            eu._BWD_PREROLL_ADSTAR = eu._BWD_PREROLL_COMPOSE = lvl
            t = measure(
                lambda x, m0, g, mw: eu._adstar_bwd_fused_dispatch(
                    x, m0, g, mw
                ),
                mk_p, (m0, g, mw),
            )
            msg = t if isinstance(t, str) else f"{t:7.2f} ms"
            print(f"preroll={lvl}: {msg}", flush=True)

    if which == "db":
        # A/B the slab double-buffering of the adstar yb backward
        print(f"=== adstar bwd DMA pipeline A/B (res {res}, b{B}) ===",
              flush=True)
        for on in (False, True):
            wu.set_pipeline_slabs(on)
            t = measure(
                lambda x, m0, g, mw: eu._adstar_bwd_fused_dispatch(
                    x, m0, g, mw
                ),
                mk_p, (m0, g, mw),
            )
            msg = t if isinstance(t, str) else f"{t:7.2f} ms"
            print(f"pipeline={'on' if on else 'off'}: {msg}", flush=True)
        wu.set_pipeline_slabs(True)

    if which == "cpreroll":
        print(f"=== compose bwd preroll A/B (res {res}, b{B}) ===", flush=True)
        for lvl in (0, 3):
            eu._BWD_PREROLL_ADSTAR = eu._BWD_PREROLL_COMPOSE = lvl
            t = measure(
                lambda x, m0, g: eu._compose_bwd_fused_dispatch(
                    x, m0, 0.1, g
                ),
                mk_p, (m0, g),
            )
            msg = t if isinstance(t, str) else f"{t:7.2f} ms"
            print(f"preroll={lvl}: {msg}", flush=True)

    if which in ("compose", "both"):
        print(f"=== compose fused bwd only (res {res}, b{B}) ===", flush=True)
        for bx, by in ((32, 8), (16, 16), (32, 16), (16, 32)):
            if res % bx or res % by:
                continue
            eu._pick_bx_bwd = lambda X, bx=bx: bx if X % bx == 0 else 0
            eu._pick_by_cbwd = (
                lambda Y, Z, BX=16, by=by: by if Y % by == 0 else 0
            )
            t = measure(
                lambda x, m0, g: eu._compose_bwd_fused_dispatch(
                    x, m0, 0.1, g
                ),
                mk_p, (m0, g),
            )
            msg = t if isinstance(t, str) else f"{t:7.2f} ms"
            print(f"BX={bx:3d} BY={by:3d}: {msg}", flush=True)


if __name__ == "__main__":
    main()
