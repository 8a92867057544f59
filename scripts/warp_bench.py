"""Isolate the atlas-warp + loss stage of the atlas step: the image warp
``interp_auto(I, h)`` with a batch-broadcast atlas, its backward wrt the
deformation, and the extra cost of the atlas-image gradient (the d_I
splat-transpose kernel + batch reduction).

Usage: python scripts/warp_bench.py [res] [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if os.environ.get("LM_CPU", "0") == "1":
    # smoke-test mode (the sitecustomize force-registers the remote TPU;
    # env var alone is ignored — must be a config update after import)
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import lagomorph_tpu as lm
from lagomorph_tpu.ops import interp as interp_mod

K = 6


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
        print(f"{name:52s} {per:9.2f} ms", flush=True)
        return per
    except Exception as e:
        print(f"{name:52s} FAILED {str(e)[:140]}", flush=True)


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sp = (res,) * 3
    rng = np.random.default_rng(0)
    I = jnp.asarray(rng.standard_normal((1, 1) + sp), dtype=jnp.float32)
    img = jnp.asarray(rng.standard_normal((B, 1) + sp), dtype=jnp.float32)

    def mk_h():
        # unit-regime deformation field (tier-1 validity)
        return jnp.asarray(
            rng.uniform(-0.999, 0.999, (B, 3) + sp), dtype=jnp.float32
        )

    warp = lambda h, II=I: lm.interp_auto(II, h, mode="unit")

    measure("atlas warp fwd (broadcast I)", warp, mk_h)
    measure("warp fwd+bwd wrt h only",
            lambda h: jax.grad(lambda hh: jnp.sum(warp(hh) ** 2))(h), mk_h)
    measure("warp fwd+bwd wrt (h, I)",
            lambda h: jax.grad(
                lambda hh, II: jnp.sum(warp(hh, II) ** 2), argnums=(0, 1)
            )(h, I)[0], mk_h)

    def mse_stage(h, with_gI):
        def f(hh, II):
            Idef = lm.interp_auto(II, hh, mode="unit")
            return jnp.sum((Idef - img) ** 2) / img.size
        if with_gI:
            return jax.grad(f, argnums=(0, 1))(h, I)[0]
        return jax.grad(f)(h, I)

    measure("MSE stage fwd+bwd wrt h", lambda h: mse_stage(h, False), mk_h)
    measure("MSE stage fwd+bwd wrt (h, I)", lambda h: mse_stage(h, True), mk_h)

    # non-broadcast baseline: I already batch-sized
    Ib = jnp.broadcast_to(I, (B,) + I.shape[1:])
    measure("warp fwd (batch-sized I)", lambda h: warp(h, Ib), mk_h)
    measure("warp fwd+bwd wrt (h, I) batch-sized",
            lambda h: jax.grad(
                lambda hh, II: jnp.sum(warp(hh, II) ** 2), argnums=(0, 1)
            )(h, Ib)[0], mk_h)


if __name__ == "__main__":
    main()
