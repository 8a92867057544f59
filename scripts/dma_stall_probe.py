"""Quantify the exposed (non-overlapped) DMA latency of the manual-copy
Pallas kernels: time each kernel normally vs with its async copies elided
at trace time (compute runs on uninitialized VMEM slabs — results are
garbage, timing is valid).  The difference bounds what manual
double-buffering could recover.

Usage: python scripts/dma_stall_probe.py [res] [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import lagomorph_tpu.ops.pallas.epdiff_unit as eu
import lagomorph_tpu.ops.pallas.warp_unit as wu

K = 6


class _NoCopy:
    def start(self):
        pass

    def wait(self):
        pass


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
        print(f"{name:40s} {per:9.2f} ms", flush=True)
        return per
    except Exception as e:
        print(f"{name:40s} FAILED {str(e)[:140]}", flush=True)
        return None


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sp = (res,) * 3
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.uniform(-0.9, 0.9, (B, 3) + sp), dtype=jnp.float32)
    m0 = jnp.asarray(rng.standard_normal((B, 3) + sp), dtype=jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, 3) + sp), dtype=jnp.float32)

    def mk_p():
        return jnp.asarray(
            rng.uniform(-0.9, 0.9, (B, 3) + sp), dtype=jnp.float32
        )

    cases = [
        ("adstar fwd", lambda pp: eu._adstar_fwd_dispatch(pp, m0)),
        ("adstar bwd", lambda pp: eu._adstar_bwd_fused_dispatch(
            pp, m0, g, eu._adstar_fwd_dispatch(pp, m0, want_mw=True)[1])),
        ("compose fwd", lambda pp: eu._compose_fwd_dispatch(pp, m0, 0.2)),
        ("compose bwd",
         lambda pp: eu._compose_bwd_fused_dispatch(pp, m0, 0.2, g)),
    ]

    results = {}
    for nodma in (False, True):
        if nodma:
            # elide every async copy at trace time (fresh traces per jit)
            real = eu.pltpu.make_async_copy
            eu.pltpu.make_async_copy = lambda *a, **k: _NoCopy()
        tag = "nodma" if nodma else "dma"
        for name, fn in cases:
            results[(name, tag)] = measure(f"{name} [{tag}]", fn, mk_p)
        if nodma:
            eu.pltpu.make_async_copy = real

    for name, _ in cases:
        a, b = results.get((name, "dma")), results.get((name, "nodma"))
        if a and b:
            print(f"{name:40s} exposed DMA ~ {a - b:6.2f} ms "
                  f"({100 * (a - b) / a:4.1f}%)")


if __name__ == "__main__":
    main()
