"""2D registration/atlas benchmark: pairwise LDDMM iterations/sec at 256^2
(batch 8) and one atlas step at 512^2 — the 2D figure for BASELINE.md.

Usage: python scripts/bench2d.py [res] [batch]
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


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rng = np.random.default_rng(0)
    sp = (res, res)
    metric = lm.FluidMetric([0.1, 0.0, 0.01])

    I = jnp.asarray(rng.standard_normal((1, 1) + sp), dtype=jnp.float32)
    img = jnp.asarray(rng.standard_normal((B, 1) + sp), dtype=jnp.float32)
    m = jnp.asarray(rng.standard_normal((B, 2) + sp) * 2e-6, dtype=jnp.float32)

    step = make_lddmm_atlas_step(
        metric, reg_weight=0.1, learning_rate_pose=1e-6,
        lddmm_steps=1, integration_steps=5,
    )
    jstep = jax.jit(step, donate_argnums=(1,))
    m, gI, loss, reg = jstep(I, m, img)
    _ = float(loss)
    iters = 20
    t0 = time.perf_counter()
    for _i in range(iters):
        m, gI, loss, reg = jstep(I, m, img)
    _ = float(loss)
    t1 = time.perf_counter()
    sps = iters / (t1 - t0)
    print(f"2D LDDMM atlas steps/sec @ {res}^2 b{B}: {sps:.2f} "
          f"({1000 / sps:.1f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
