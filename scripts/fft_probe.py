"""FFT deep-dive: decompose the fluid sharp cost and prototype a
DFT-by-MXU-matmul alternative.

On TPU the MXU turns a 1D DFT along a 128-length axis into a 128x128(x2)
matmul — potentially much faster than XLA's FFT lowering.  This probe
validates a pure-jnp matmul-DFT sharp against the rfftn-based fluid
operator and times: rfftn, irfftn, full sharp, matmul-DFT sharp.

Usage: python scripts/fft_probe.py [res] [batch]
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import lagomorph_tpu as lm
from lagomorph_tpu.ops.fluid import _fluid_multiplier_traced

K = 6
HI = jax.lax.Precision.HIGHEST


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
        print(f"{name:40s} FAILED {str(e)[:120]}", flush=True)


def _dft_mats(N, dtype=jnp.float32):
    """Forward DFT cos/sin matrices from iota (no baked constants)."""
    n = jnp.arange(N, dtype=dtype)
    k = jnp.arange(N, dtype=dtype)
    ang = -2.0 * jnp.pi * n[:, None] * k[None, :] / N
    return jnp.cos(ang), jnp.sin(ang)


def _idft_mats(N, dtype=jnp.float32):
    n = jnp.arange(N, dtype=dtype)
    k = jnp.arange(N, dtype=dtype)
    ang = 2.0 * jnp.pi * k[:, None] * n[None, :] / N
    return jnp.cos(ang) / N, jnp.sin(ang) / N


def dft_sharp_matmul(m, params):
    """sharp(m) via per-axis DFT matmuls (full complex spectrum along Y/Z
    kept; the multiplier is Hermitian-even so applying its full-spectrum
    extension is equivalent).  f32 with HIGHEST precision."""
    B, d, X, Y, Z = m.shape
    # full-spectrum multiplier entries (extend the half-spectrum formula to
    # all k: the cos/sin LUTs are defined for any k)
    spatial = (X, Y, Z)
    dt = m.dtype

    ws, ss = [], []
    for a, N in enumerate(spatial):
        kk = jnp.arange(N, dtype=dt)
        ang = 2.0 * jnp.pi * kk / N
        shape = [1, 1, 1]
        shape[a] = N
        ws.append((2.0 * (1.0 - jnp.cos(ang))).reshape(shape))
        ss.append(jnp.sin(ang).reshape(shape))
    alpha, beta, gamma = params
    fs = spatial
    lam = gamma + alpha * sum(jnp.broadcast_to(w, fs) for w in ws)
    l = {}
    for a in range(3):
        l[(a, a)] = lam - beta * jnp.broadcast_to(ws[a], fs)
        for b in range(a):
            l[(a, b)] = beta * jnp.broadcast_to(ss[a] * ss[b], fs)

    def lget(a, b):
        return l[(a, b)] if a >= b else l[(b, a)]

    L = {}
    for a in range(3):
        for b in range(a + 1):
            L[(a, b)] = sum(lget(a, c) * lget(c, b) for c in range(3))

    def _ss(x):
        return jnp.where(x < 1e-8, 1e-4, jnp.sqrt(jnp.maximum(x, 1e-8)))

    ooG00 = 1.0 / _ss(L[(0, 0)])
    G10 = L[(1, 0)] * ooG00
    G20 = L[(2, 0)] * ooG00
    ooG11 = 1.0 / _ss(L[(1, 1)] - G10 * G10)
    G21 = (L[(2, 1)] - G20 * G10) * ooG11
    ooG22 = 1.0 / _ss(L[(2, 2)] - G20 * G20 - G21 * G21)

    def solve(b0, b1, b2):
        y0 = b0 * ooG00
        y1 = (b1 - G10 * y0) * ooG11
        y2 = (b2 - G20 * y0 - G21 * y1) * ooG22
        x2 = y2 * ooG22
        x1 = (y1 - G21 * x2) * ooG11
        x0 = (y0 - G10 * x1 - G20 * x2) * ooG00
        return x0, x1, x2

    # forward DFT along each spatial axis (complex as (re, im) pairs)
    re, im = m, jnp.zeros_like(m)
    for axis, N in ((2, X), (3, Y), (4, Z)):
        C, S = _dft_mats(N, dt)
        def t(x, M):
            return jnp.moveaxis(
                jnp.tensordot(jnp.moveaxis(x, axis, -1), M, axes=([4], [0]),
                              precision=HI),
                -1, axis,
            )
        re, im = t(re, C) - t(im, S), t(re, S) + t(im, C)

    c0r, c1r, c2r = solve(re[:, 0], re[:, 1], re[:, 2])
    c0i, c1i, c2i = solve(im[:, 0], im[:, 1], im[:, 2])
    re = jnp.stack([c0r, c1r, c2r], axis=1)
    im = jnp.stack([c0i, c1i, c2i], axis=1)

    for axis, N in ((2, X), (3, Y), (4, Z)):
        C, S = _idft_mats(N, dt)
        def t(x, M):
            return jnp.moveaxis(
                jnp.tensordot(jnp.moveaxis(x, axis, -1), M, axes=([4], [0]),
                              precision=HI),
                -1, axis,
            )
        re, im = t(re, C) - t(im, S), t(re, S) + t(im, C)
    return re


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sp = (res,) * 3
    rng = np.random.default_rng(0)
    metric = lm.FluidMetric([0.1, 0.0, 0.01])
    params = (0.1, 0.0, 0.01)

    def mk_m():
        return jnp.asarray(rng.standard_normal((B, 3) + sp), dtype=jnp.float32)

    m = mk_m()
    # validation
    ref = jax.jit(metric.sharp)(m)
    got = jax.jit(lambda x: dft_sharp_matmul(x, params))(m)
    err = float(jnp.abs(got - ref).max())
    scale = float(jnp.abs(ref).max())
    print(f"matmul-DFT sharp maxerr: {err:.3e} (scale {scale:.2e}, "
          f"rel {err / scale:.3e})", flush=True)

    axes = (2, 3, 4)
    measure("rfftn", lambda x: jnp.fft.rfftn(x, axes=axes, norm='ortho').real, mk_m)
    measure("rfftn+irfftn",
            lambda x: jnp.fft.irfftn(
                jnp.fft.rfftn(x, axes=axes, norm='ortho'), s=sp, axes=axes,
                norm='ortho'), mk_m)
    measure("sharp (fluid_operator)", metric.sharp, mk_m)
    measure("sharp (matmul DFT f32-HI)",
            lambda x: dft_sharp_matmul(x, params), mk_m)


if __name__ == "__main__":
    main()
