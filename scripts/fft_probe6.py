"""Sixth FFT probe: the whole-volume one-kernel MXU-DFT fluid path
(fft_unit.fluid_flat_mxu_whole) vs the three-kernel MXU pipeline and the
packed-fftn fallback — correctness vs a float64 numpy oracle, then
scan-amortized same-run timings.

Also covers the round-4 gate relaxation (Z % 64): at 64^3 the MXU paths
were previously unreachable (Z=64 failed the Z % 128 gate) and the sharp
ran through XLA fftn.

Usage: python scripts/fft_probe6.py [res] [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import lagomorph_tpu as lm
from lagomorph_tpu.ops import fluid as fl
from lagomorph_tpu.ops.pallas import fft_unit

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
        print(f"{name:46s} {per:9.2f} ms", flush=True)
        return per
    except Exception as e:
        print(f"{name:46s} FAILED {str(e)[:200]}", flush=True)


def oracle_sharp(mv, params):
    a, b, g = params
    sp = mv.shape[2:]
    ks = [np.fft.fftfreq(n) * n for n in sp]
    w = [2.0 * (1.0 - np.cos(2 * np.pi * k / n)) for k, n in zip(ks, sp)]
    lam = g + a * (
        w[0][:, None, None] + w[1][None, :, None] + w[2][None, None, :]
    )
    L = lam * lam
    L = np.where(L < 1e-8, 1e-4, np.sqrt(np.maximum(L, 1e-8))) ** 2
    M = 1.0 / L
    X = np.fft.fftn(mv.astype(np.float64), axes=(2, 3, 4))
    return np.real(np.fft.ifftn(M[None, None] * X, axes=(2, 3, 4)))


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sp = (res,) * 3
    rng = np.random.default_rng(0)
    params = (0.1, 0.0, 0.01)
    print(f"=== whole-volume MXU fluid probe @ {res}^3 b{B} ===", flush=True)
    print(f"mxu 3-kernel supported: "
          f"{fft_unit.mxu_kernel_supported(sp, jnp.float32)}  "
          f"whole supported: "
          f"{fft_unit.mxu_whole_supported(sp, jnp.float32)}", flush=True)

    def mk():
        return jnp.asarray(
            rng.standard_normal((B, 3) + sp), dtype=jnp.float32
        )

    mv = mk()
    ref = oracle_sharp(np.asarray(mv), params)
    scale = np.abs(ref).max()
    variants = [
        ("fftn", False, None),
        ("mxu-3kernel", "mxu", False),
        ("mxu-whole", "mxu", True),
    ]
    for name, kmode, whole in variants:
        fl.set_fluid_fft_kernel(kmode)
        if whole is not None:
            fl.set_fluid_mxu_whole(whole)
        try:
            out = np.asarray(fl._fluid_apply(mv, params, True))
            print(f"{name:12s} vs f64 oracle : "
                  f"{np.abs(out - ref).max() / scale:.3e} rel", flush=True)
        except Exception as e:
            print(f"{name:12s} FAILED {str(e)[:200]}", flush=True)

    m = lm.FluidMetric(list(params))
    for name, kmode, whole in variants:
        fl.set_fluid_fft_kernel(kmode)
        if whole is not None:
            fl.set_fluid_mxu_whole(whole)
        measure(f"sharp fwd [{name}]",
                lambda mm: fl.fluid_operator(mm, params, True), mk)
        measure(f"sharp fwd+bwd [{name}]",
                lambda mm: jax.grad(lambda x: jnp.sum(m.sharp(x) ** 2))(mm),
                mk)
    fl.set_fluid_mxu_whole("auto")
    fl.set_fluid_fft_kernel("auto")


if __name__ == "__main__":
    main()
