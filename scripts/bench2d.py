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
    if os.environ.get("LM_SHOOT2D", "1") == "0":  # A/B: per-op 2D path
        from lagomorph_tpu.ops.pallas import shoot2d as _s2

        _s2.set_shoot2d(False)
        print("shoot2d mega-kernel DISABLED (per-op path)", flush=True)

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

    # scan-amortized on-device rate (relay dispatch excluded) + roofline row
    K = 50

    def k_steps(I, m, img):
        def body(m, _):
            m, _gI, loss, _reg = step(I, m, img)
            return m, loss
        m, losses = jax.lax.scan(body, m, None, length=K)
        return m, losses[-1]

    jscan = jax.jit(k_steps, donate_argnums=(1,))
    m, loss = jscan(I, m, img)
    _ = float(loss)
    t0 = time.perf_counter()
    m, loss = jscan(I, m, img)
    _ = float(loss)
    t1 = time.perf_counter()
    ms = (t1 - t0) / K * 1000
    # traffic model: ~8 field volumes per substep fwd+bwd (p, v, m, grads)
    # + image warp; one V = B*2*res^2*4 bytes
    V = B * 2 * res * res * 4
    ideal_ms = 5 * 8 * V / 819e9 * 1e3
    print(f"2D scan-amortized @ {res}^2 b{B}: {K / (t1 - t0):.2f} steps/s "
          f"({ms:.2f} ms/step; HBM-roofline ~{ideal_ms:.3f} ms -> "
          f"{ms / ideal_ms:.0f}x off)", flush=True)

    # 2D FFT health at this batch (the 3D rfftn/irfftn pipeline is broken
    # for >= 12 batched 128^3 transforms on this backend — check 2D too)
    x = jnp.asarray(rng.standard_normal((B * 2,) + sp), dtype=jnp.float32)
    rt = jax.jit(
        lambda x: jnp.fft.irfftn(jnp.fft.rfftn(x, axes=(1, 2)), s=sp, axes=(1, 2))
    )(x)
    print(f"2D rfftn roundtrip err @ {res}^2 x{B * 2}: "
          f"{float(jnp.abs(rt - x).max()):.3e}", flush=True)


if __name__ == "__main__":
    main()
