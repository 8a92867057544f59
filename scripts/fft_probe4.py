"""Fourth FFT probe: DFT-by-MXU-matmul at reduced precisions.

The matmul-DFT fluid transform at f32-HIGHEST measured 9.1 ms (slower than
XLA FFT) because HIGHEST costs ~6 bf16 MXU passes per matmul.  This probe
times the same pipeline at DEFAULT / HIGH / HIGHEST and quantifies the
error vs a float64 numpy oracle — including the 1/gamma^2 amplification at
low frequencies — to decide whether a reduced-precision DFT is a viable
opt-in speed mode (the CLAUDE.md roadmap's "bf16 ~1.6 ms but precision
risk" row).

Usage: python scripts/fft_probe4.py [res] [batch]
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
        print(f"{name:46s} FAILED {str(e)[:140]}", flush=True)


_PREC = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def dft_sharp(m, params, precision):
    """sharp via per-axis DFT matmuls (same math as fl._fluid_apply_dft but
    with a configurable matmul precision)."""
    hi = _PREC[precision] if isinstance(precision, str) else precision
    dim = m.shape[1]
    spatial = tuple(m.shape[2:])
    dt = m.dtype
    M = fl._fluid_multiplier_traced(spatial, params, True, dt,
                                    full_spectrum=True)

    def mget(a, b):
        return M[(a, b)] if a >= b else M[(b, a)]

    def transform(re, im, invdir):
        for ax_off, N in enumerate(spatial):
            axis = 2 + ax_off
            C, S = fl._dft_pair(N, dt, invdir)

            def t(x, Mx):
                moved = jnp.moveaxis(x, axis, -1)
                out = jnp.tensordot(moved, Mx, axes=([moved.ndim - 1], [0]),
                                    precision=hi)
                return jnp.moveaxis(out, -1, axis)

            re, im = t(re, C) - t(im, S), t(re, S) + t(im, C)
        return re, im

    re, im = transform(m, jnp.zeros_like(m), False)
    rows_re, rows_im = [], []
    for a in range(dim):
        acc_r = acc_i = None
        for b in range(dim):
            mab = mget(a, b)[None]
            tr = mab * re[:, b]
            ti = mab * im[:, b]
            acc_r = tr if acc_r is None else acc_r + tr
            acc_i = ti if acc_i is None else acc_i + ti
        rows_re.append(acc_r)
        rows_im.append(acc_i)
    re = jnp.stack(rows_re, axis=1)
    im = jnp.stack(rows_im, axis=1)
    re, _ = transform(re, im, True)
    return re.astype(m.dtype)


def dft_sharp_packed(m, params, precision):
    """Packed-pair DFT-matmul sharp: pack two real fields per complex value
    (multiplier even in k), so every matmul lane carries real data — half
    the matmul work of dft_sharp's re + zero-im formulation."""
    hi = _PREC[precision] if isinstance(precision, str) else precision
    B, d = m.shape[:2]
    spatial = tuple(m.shape[2:])
    dt = m.dtype
    n = B * d
    x = m.reshape((n,) + spatial)
    pad = n % 2
    if pad:
        x = jnp.concatenate([x, jnp.zeros((1,) + spatial, dt)], axis=0)
    half = x.shape[0] // 2
    re, im = x[:half], x[half:]
    M = fl._fluid_multiplier_traced(spatial, params, True, dt,
                                    full_spectrum=True)[(0, 0)]

    def transform(re, im, invdir):
        for ax_off, N in enumerate(spatial):
            axis = 1 + ax_off
            C, S = fl._dft_pair(N, dt, invdir)

            def t(xx, Mx):
                moved = jnp.moveaxis(xx, axis, -1)
                out = jnp.tensordot(moved, Mx, axes=([moved.ndim - 1], [0]),
                                    precision=hi)
                return jnp.moveaxis(out, -1, axis)

            re, im = t(re, C) - t(im, S), t(re, S) + t(im, C)
        return re, im

    re, im = transform(re, im, False)
    re, im = re * M[None], im * M[None]
    re, im = transform(re, im, True)
    out = jnp.concatenate([re, im], axis=0)
    if pad:
        out = out[:n]
    return out.reshape(m.shape).astype(dt)


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sp = (res,) * 3
    rng = np.random.default_rng(0)
    params = (0.1, 0.0, 0.01)
    metric = lm.FluidMetric(list(params))

    def mk_m():
        return jnp.asarray(rng.standard_normal((B, 3) + sp), dtype=jnp.float32)

    m = mk_m()
    # float64 numpy oracle on one channel (beta=0 -> scalar multiplier)
    import numpy.fft as nf

    Mnp = fl.fluid_multiplier(sp, params, True, np.float64)[0, 0]
    x64 = np.asarray(m[0, 0], dtype=np.float64)
    want = nf.irfftn(nf.rfftn(x64) * Mnp, s=sp, axes=(0, 1, 2))
    wsc = np.abs(want).max()

    got = np.asarray(jax.jit(metric.sharp)(m)[0, 0], dtype=np.float64)
    print(f"packed-fftn (default) vs f64: {np.abs(got - want).max() / wsc:.3e}",
          flush=True)
    for prec in ("default", "high", "highest"):
        try:
            out = jax.jit(lambda x, p=prec: dft_sharp(x, params, p))(m)
            err = np.abs(np.asarray(out[0, 0], np.float64) - want).max() / wsc
            print(f"dft-matmul {prec:8s} vs f64: {err:.3e}", flush=True)
        except Exception as e:
            print(f"dft-matmul {prec}: FAILED {str(e)[:120]}", flush=True)

    for prec in ("highest", "default"):
        out = jax.jit(lambda x, p=prec: dft_sharp_packed(x, params, p))(m)
        err = np.abs(np.asarray(out[0, 0], np.float64) - want).max() / wsc
        print(f"dft-packed {prec:8s} vs f64: {err:.3e}", flush=True)

    # run order: dft variants FIRST, fftn last (counterbalance relay drift
    # vs the earlier probe which ran fftn first)
    for prec in ("highest", "default"):
        measure(f"sharp dft-packed {prec}",
                lambda x, p=prec: dft_sharp_packed(x, params, p), mk_m)
    for prec in ("highest",):
        measure(f"sharp dft-matmul {prec}",
                lambda x, p=prec: dft_sharp(x, params, p), mk_m)
    measure("sharp packed-fftn (default)", metric.sharp, mk_m)


if __name__ == "__main__":
    main()
