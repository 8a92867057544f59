"""Third FFT probe: PACKED-PAIR complex transforms for the fluid sharp.

Key identity: the fluid multiplier M(k) is real and EVEN under k -> -k
(cos-built diagonal; sin*sin off-diagonals flip sign twice), so for real
fields x1, x2 packed as c = x1 + i*x2:

    ifftn(M . fftn(c)) = sharp(x1) + i * sharp(x2)

exactly — no hermitian unpacking, no flip-gathers.  One complex FFT per TWO
real fields, vs one rfftn per field today.

Variants:
  packed-batch : pack batch pairs (works for any beta; d x d mixing applies
                 per packed complex component)
  packed-flat  : beta == 0 -> multiplier is one scalar field; flatten (B, d)
                 and pack across all B*d slabs (handles B=1)
Also times raw fftn/ifftn/rfftn building blocks for a lowering cost model.

Usage: python scripts/fft_probe3.py [res] [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import lagomorph_tpu as lm
from lagomorph_tpu.ops.fluid import _fluid_multiplier_traced

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


def _mul_rows(F, M, d):
    def mget(a, b):
        return M[(a, b)] if a >= b else M[(b, a)]

    rows = []
    for a in range(d):
        acc = None
        for b in range(d):
            t = mget(a, b)[None] * F[:, b]
            acc = t if acc is None else acc + t
        rows.append(acc)
    return jnp.stack(rows, axis=1)


def sharp_packed_batch(m, params):
    B, d = m.shape[:2]
    spatial = tuple(m.shape[2:])
    axes = (2, 3, 4)
    half = B // 2
    c = jax.lax.complex(m[:half], m[half:])
    F = jnp.fft.fftn(c, axes=axes)
    M = _fluid_multiplier_traced(spatial, params, True, jnp.float32,
                                 full_spectrum=True)
    F = _mul_rows(F, M, d)
    y = jnp.fft.ifftn(F, axes=axes)
    return jnp.concatenate([y.real, y.imag], axis=0).astype(m.dtype)


def sharp_packed_flat(m, params):
    """beta == 0: scalar multiplier; pack across flattened (B*d) slabs."""
    B, d = m.shape[:2]
    spatial = tuple(m.shape[2:])
    n = B * d
    x = m.reshape((n,) + spatial)
    pad = n % 2
    if pad:
        x = jnp.concatenate([x, jnp.zeros((1,) + spatial, m.dtype)], axis=0)
    half = x.shape[0] // 2
    c = jax.lax.complex(x[:half], x[half:])
    F = jnp.fft.fftn(c, axes=(1, 2, 3))
    M = _fluid_multiplier_traced(spatial, params, True, jnp.float32,
                                 full_spectrum=True)
    F = F * M[(0, 0)][None]
    y = jnp.fft.ifftn(F, axes=(1, 2, 3))
    out = jnp.concatenate([y.real, y.imag], axis=0)
    if pad:
        out = out[:n]
    return out.reshape(m.shape).astype(m.dtype)


def _rfftn_sharp(m, params):
    """Legacy unpacked rfftn path (packing force-disabled).  NOTE: on this
    backend it is numerically broken for >= 12 batched 128^3 transforms —
    kept here for timing comparison only."""
    from lagomorph_tpu.ops.fluid import set_fluid_packing, fluid_operator

    prev = set_fluid_packing(False)
    try:
        return fluid_operator(m, params, True)
    finally:
        set_fluid_packing(prev)


def sharp_packed_flat_composed(m, params):
    """packed-flat with manually composed per-axis ffts (z, y, x separately)
    instead of one fftn call — probes whether XLA's fftn lowering leaves
    per-axis scheduling on the table."""
    B, d = m.shape[:2]
    spatial = tuple(m.shape[2:])
    n = B * d
    x = m.reshape((n,) + spatial)
    pad = n % 2
    if pad:
        x = jnp.concatenate([x, jnp.zeros((1,) + spatial, m.dtype)], axis=0)
    half = x.shape[0] // 2
    c = jax.lax.complex(x[:half], x[half:])
    F = jnp.fft.fft(c, axis=3)
    F = jnp.fft.fft(F, axis=2)
    F = jnp.fft.fft(F, axis=1)
    M = _fluid_multiplier_traced(spatial, params, True, jnp.float32,
                                 full_spectrum=True)
    F = F * M[(0, 0)][None]
    F = jnp.fft.ifft(F, axis=1)
    F = jnp.fft.ifft(F, axis=2)
    y = jnp.fft.ifft(F, axis=3)
    out = jnp.concatenate([y.real, y.imag], axis=0)
    if pad:
        out = out[:n]
    return out.reshape(m.shape).astype(m.dtype)


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
    ref = jax.jit(metric.sharp)(m)
    sc = float(jnp.abs(ref).max())
    for name, fn in (("packed-batch", sharp_packed_batch),
                     ("packed-flat", sharp_packed_flat)):
        got = jax.jit(lambda x, fn=fn: fn(x, params))(m)
        err = float(jnp.abs(got - ref).max())
        print(f"{name} sharp rel err: {err / sc:.3e}", flush=True)

    measure("sharp rfftn (legacy unpacked)",
            lambda x: _rfftn_sharp(x, params), mk_m)
    measure("sharp packed-batch fftn", lambda x: sharp_packed_batch(x, params), mk_m)
    measure("sharp packed-flat fftn", lambda x: sharp_packed_flat(x, params), mk_m)
    measure("sharp packed-flat composed-axis",
            lambda x: sharp_packed_flat_composed(x, params), mk_m)

    # raw transform building blocks (per call, at the stated array shape)
    axes = (2, 3, 4)
    half = B // 2

    def mk_c():
        return jnp.asarray(
            rng.standard_normal((half, 3) + sp)
            + 1j * rng.standard_normal((half, 3) + sp),
            dtype=jnp.complex64,
        )

    measure(f"rfftn ({B},3) real", lambda x: jnp.fft.rfftn(x, axes=axes).real, mk_m)
    measure(f"fftn ({half},3) complex", lambda c: jnp.fft.fftn(c, axes=axes).real, mk_c)
    measure(f"ifftn ({half},3) complex", lambda c: jnp.fft.ifftn(c, axes=axes).real, mk_c)
    measure(f"fft 1axis Z ({half},3) cpx", lambda c: jnp.fft.fft(c, axis=4).real, mk_c)
    measure(f"fft 1axis X ({half},3) cpx", lambda c: jnp.fft.fft(c, axis=2).real, mk_c)


if __name__ == "__main__":
    main()
