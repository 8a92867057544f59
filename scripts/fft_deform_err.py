"""End-to-end deformation error of the MXU-DFT fluid path.

The fluid solve's relative error (4.1e-5 at HIGHEST precision, vs 1.8e-6
for the packed-fftn path; scripts/fft_probe5.py) bounds the velocity
field; what users care about is the integrated deformation.  This probe
shoots the full expmap (5 Euler steps, bench momenta scale) with each
fluid transform and reports the max per-voxel displacement difference
vs the packed-fftn reference — the number to hold against the <1e-5
voxel parity bar (BASELINE.md targets).

Usage: python scripts/fft_deform_err.py [res] [batch]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import lagomorph_tpu as lm
from lagomorph_tpu.ops import fluid as fl
from lagomorph_tpu.ops.pallas import fft_unit


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sp = (res,) * 3
    rng = np.random.default_rng(3)
    metric = lm.FluidMetric([0.1, 0.0, 0.01])
    # bench-scale momenta: smooth random field, O(1) resulting displacements
    m0 = jnp.asarray(rng.standard_normal((B, 3) + sp), dtype=jnp.float32)
    m0 = metric.sharp(m0)  # smooth it like a real momenta iterate
    # scale so the resulting velocity peaks at ~0.5 voxel — the unit-
    # displacement regime the bench runs in (stable shooting, fused tier)
    v0 = metric.sharp(m0)
    m0 = m0 * (0.5 / float(jnp.abs(v0).max()))

    def shoot():
        return jax.jit(lambda m: lm.expmap(metric, m, num_steps=5))(m0)

    fl.set_fluid_fft_kernel(False)
    ref = np.asarray(shoot())
    mag = np.abs(ref).max()
    print(f"packed-fftn reference: max|phiinv| = {mag:.3f} voxels", flush=True)
    for name, kmode, prec in (("mxu-highest", "mxu", "highest"),
                              ("mxu-3pass", "mxu", "3pass")):
        fl.set_fluid_fft_kernel(kmode)
        fft_unit.set_fft_mxu_precision(prec)
        try:
            got = np.asarray(shoot())
            err = np.abs(got - ref).max()
            print(f"{name:12s}: max per-voxel deformation diff = {err:.3e} "
                  f"voxels ({err / mag:.3e} rel)", flush=True)
        except Exception as e:  # pragma: no cover
            print(f"{name:12s}: FAILED {str(e)[:160]}", flush=True)
    fft_unit.set_fft_mxu_precision("highest")
    fl.set_fluid_fft_kernel("auto")


if __name__ == "__main__":
    main()
