"""Headline benchmark: 3D LDDMM shooting-and-update steps/sec/chip at 128^3.

One full step = geodesic shooting (5 Euler EPDiff integration steps:
interp + jacobian-times-vectorfield + FFT fluid sharp + compose), atlas
warp, MSE + regularity loss, reverse-mode gradients for momenta and atlas,
and the momenta SGD update — i.e. the hot loop of `lagomorph lddmm atlas`
(reference lddmm.py:300-325).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
The reference publishes no numbers (BASELINE.md), so vs_baseline is null.

Methodology (see CLAUDE.md): the headline `value` is a Python loop of jitted
steps with chained inputs — kept identical across rounds for comparability,
but it includes ~15-20 ms/step of dev-relay dispatch artifact.  The extra
`steps_per_sec_scan` field is the honest on-device chip rate: K steps inside
ONE `lax.scan` dispatch, so relay latency amortizes away.

Before timing, a quick subset of scripts/tpu_checks.py runs in a subprocess
(TPU backend only; LM_SKIP_CHECKS=1 skips): a Pallas kernel regression fails
the bench loudly instead of shipping a silently-wrong number.  After timing,
`shooting_regime_ok` asserts the fused fast path (not the silent general-tier
fallback) was the path measured.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np


def run_kernel_checks():
    """Run the quick Pallas bit-exactness gate (scripts/tpu_checks.py --quick)
    in a subprocess.  Fail LOUDLY on check failure; warn and continue on
    timeout (the bench itself still runs)."""
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "tpu_checks.py")
    try:
        r = subprocess.run(
            [sys.executable, script, "--quick"],
            timeout=1500, capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        sys.stderr.write("WARNING: tpu_checks --quick timed out; benching "
                         "without the kernel gate\n")
        return
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-4000:] + r.stderr[-2000:])
        sys.stderr.write("FATAL: Pallas kernel checks FAILED — refusing to "
                         "produce a bench number from broken kernels\n")
        sys.exit(1)
    sys.stderr.write("tpu_checks --quick: ALL OK\n")


def bench(res=128, batch=4, integration_steps=5, iters=None, warmup=None,
          checkpoints=None, scan_iters=None):
    if iters is None:
        iters = 4 if res >= 128 else 10
    if warmup is None:
        warmup = 1 if res >= 128 else 2
    if scan_iters is None:
        scan_iters = 8 if res >= 128 else 20
    if checkpoints is None:
        # round 1 needed rematerialized shooting at 256^3; the round-2 fused
        # kernels store only their inputs as residuals, so the full tape
        # fits and is ~1.2x faster (2.34 vs 1.94 steps/s at 256^3 b1) —
        # main() still falls back to checkpoints=True on OOM
        checkpoints = False
    import jax
    import jax.numpy as jnp
    import lagomorph_tpu as lm
    from lagomorph_tpu.lddmm import make_lddmm_atlas_step, shooting_regime_ok

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

    # honest chip rate: K chained steps inside ONE dispatch (lax.scan), so
    # the ~15-20 ms/dispatch relay artifact amortizes to ~nothing
    sps_scan = None
    try:
        def k_steps(I, m, img):
            def body(m, _):
                m, _gI, loss, _reg = step(I, m, img)
                return m, loss
            m, losses = jax.lax.scan(body, m, None, length=scan_iters)
            return m, losses[-1]

        jscan = jax.jit(k_steps, donate_argnums=(1,))
        m, loss = jscan(I, m, img)     # compile + warm the exact executable
        _ = float(loss)
        t0 = time.perf_counter()
        m, loss = jscan(I, m, img)     # fresh inputs: m is the prior output
        _ = float(loss)
        t1 = time.perf_counter()
        sps_scan = scan_iters / (t1 - t0)
    except Exception as e:  # pragma: no cover - program-size/memory limits
        sys.stderr.write(f"scan-amortized variant unavailable: {str(e)[:200]}\n")

    # regime probe: the timed loop must have run the fused fast path, not
    # the silent general-tier fallback (VERDICT r2 #6)
    ok = bool(jax.jit(
        lambda mm: shooting_regime_ok(metric, mm, num_steps=integration_steps)
    )(m))
    if not ok:
        sys.stderr.write(
            "FATAL: bench momenta left the unit regime — the measured path "
            "was the general-tier fallback, not the fused kernels\n"
        )
        sys.exit(1)
    sys.stderr.write("shooting_regime_ok: fused fast path confirmed\n")

    return steps_per_sec, sps_scan, batch


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    want_checks = os.environ.get("LM_SKIP_CHECKS", "0") != "1"
    if want_checks:
        import jax

        if jax.default_backend() == "tpu":
            run_kernel_checks()

    sps = sps_scan = None
    checkpoints = False
    while True:
        try:
            sps, sps_scan, batch = bench(res=res, batch=batch,
                                         checkpoints=checkpoints)
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
                "steps_per_sec_scan": (
                    round(sps_scan, 4) if sps_scan is not None else None
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
