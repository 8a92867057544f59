"""On-TPU correctness checks for the Pallas fast-path kernels (the pytest
suite runs on a CPU mesh where these kernels are bypassed; run this script
on real TPU hardware after kernel changes).

Usage: python scripts/tpu_checks.py [res] [batch]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import lagomorph_tpu as lm
import lagomorph_tpu.ops.pallas.warp_unit as wu
from lagomorph_tpu.ops.sampling import sample_displacement_unit


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    rng = np.random.default_rng(0)
    sp = (res,) * 3
    ok = True

    assert wu.pallas_warp_enabled(), "pallas warp not enabled on this backend"

    I = jnp.asarray(rng.standard_normal((B, 3) + sp), dtype=jnp.float32)
    d = jnp.asarray(rng.uniform(-1.0, 0.999, (B, 3) + sp), dtype=jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, 3) + sp), dtype=jnp.float32)

    got = wu.sample_displacement_unit_pallas(I, d)
    ref = sample_displacement_unit(I, d)
    err = float(jnp.abs(got - ref).max())
    print(f"fwd maxerr: {err:.3e}")
    ok &= err < 1e-5

    _, vjp_p = jax.vjp(wu.sample_displacement_unit_pallas, I, d)
    _, vjp_x = jax.vjp(sample_displacement_unit, I, d)
    gp, gx = vjp_p(g), vjp_x(g)
    for name, a, b in (("d_I", gp[0], gx[0]), ("d_disp", gp[1], gx[1])):
        err = float(jnp.abs(a - b).max())
        print(f"bwd {name} maxerr: {err:.3e}")
        ok &= err < 1e-4

    # broadcast image batch
    I1 = jnp.asarray(rng.standard_normal((1, 1) + sp), dtype=jnp.float32)
    got = wu.sample_displacement_unit_pallas(I1, d)
    ref = sample_displacement_unit(I1, d)
    err = float(jnp.abs(got - ref).max())
    print(f"bcast fwd maxerr: {err:.3e}")
    ok &= err < 1e-5
    _, vjp_p = jax.vjp(wu.sample_displacement_unit_pallas, I1, d)
    _, vjp_x = jax.vjp(sample_displacement_unit, I1, d)
    g1 = jnp.asarray(rng.standard_normal((B, 1) + sp), dtype=jnp.float32)
    gp, gx = vjp_p(g1), vjp_x(g1)
    for name, a, b in (("d_I", gp[0], gx[0]), ("d_disp", gp[1], gx[1])):
        err = float(jnp.abs(a - b).max())
        print(f"bcast bwd {name} maxerr: {err:.3e}")
        ok &= err < 1e-4

    # end-to-end expmap consistency: pallas on vs off
    metric = lm.FluidMetric([0.05, 0.0, 0.05])
    m = jnp.asarray(rng.standard_normal((B, 3) + sp) * 1e-6, dtype=jnp.float32)

    def shoot_loss(m):
        h = lm.expmap(metric, m, num_steps=3)
        return jnp.sum(h * h)

    v1, g1_ = jax.value_and_grad(shoot_loss)(m)
    prev = wu.set_pallas_warp(False)
    try:
        v0, g0_ = jax.value_and_grad(shoot_loss)(m)
    finally:
        wu.set_pallas_warp(prev)
    verr = abs(float(v1) - float(v0)) / max(abs(float(v0)), 1e-30)
    gerr = float(jnp.abs(g1_ - g0_).max())
    print(f"expmap value relerr: {verr:.3e}, grad maxerr: {gerr:.3e}")
    ok &= verr < 1e-5

    print("ALL OK" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
