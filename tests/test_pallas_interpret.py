"""Pallas fused-kernel coverage in CI via interpret mode.

The pytest suite runs on a CPU mesh where the Mosaic kernels are bypassed
(every *_supported() gate is False), so kernel regressions used to be
invisible until someone ran scripts/tpu_checks.py on hardware (round-1/2
finding).  This test runs scripts/kernel_interp_check.py in a subprocess:
``pl.pallas_call(interpret=True)`` executes every fused kernel variant
(Ad*/compose, 2D/3D, whole-Y/y-blocked, fwd + both backwards) against the
composed XLA reference at ~f32 roundoff.

Interpret mode is NOT Mosaic — bit-exactness and the scoped-vmem envelope
are still only established on hardware (tpu_checks runs before every
bench) — but roll/mask/index algebra bugs now fail CI.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "kernel_interp_check.py")


def test_fused_kernels_interpret_mode():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, SCRIPT], capture_output=True, text=True,
        timeout=1500, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stdout[-4000:] + r.stderr[-2000:]
    assert "ALL OK" in r.stdout
