"""Radix-2 FFT built from rolls and selects — the reference implementation
for the Pallas fluid-FFT kernels (ops/pallas/fft_unit.py).

Why not ``jnp.fft``: XLA's TPU FFT lowering measures ~3.2x off HBM
traffic-ideal for the fluid solve (BASELINE.md roofline), and the fluid
operator never needs frequencies in natural order — it is a convolution:

    v = ifftn(M . fftn(c))

A decimation-in-frequency (DIF) radix-2 FFT produces output in BIT-REVERSED
order without any reordering pass, and a decimation-in-time (DIT) inverse
consumes bit-reversed input and produces natural order — so the pipeline

    DIF forward  ->  multiply by bit-reversed M  ->  DIT inverse

needs no permutation anywhere (the classic FFT-convolution trick).  The
multiplier is built with bit-reversed per-axis frequency LUTs (a tiny
constant permutation per axis).

Every butterfly stage is two rolls + elementwise ops per complex plane:

    DIF stage (s = n/2 .. 1, L = 2s, e = j mod s, top = (j mod L) < s):
        out[j] = where(top, a[j] + a[j+s], W_L^e * (a[j-s] - a[j]))
    DIT stage (s = 1 .. n/2):
        w[j]   = W_L^{-e} * where(top, a[j+s], a[j])
        out[j] = where(top, a[j] + w, a[j-s] - w)

with W_L^e = exp(-2*pi*i*e/L).  ``a[j+s]``/``a[j-s]`` are cyclic rolls;
the mask arithmetic keeps partners inside each length-n segment, so the
transforms vectorize over any leading/trailing axes — and, in the Pallas
kernels, over a flattened (Y, Z) lane axis.

Pure JAX, power-of-two lengths only.  Used directly as a CPU/GPU-correct
fallback oracle in tests and interpret-mode checks; the production TPU path
runs the same math inside VMEM (one HBM round trip per axis group).

Reference counterpart: the cuFFT calls in lagomorph/metric.py:11-19 — the
reference delegates its transforms to cuFFT; this module is the TPU-native
equivalent of that library layer.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def is_pow2(n: int) -> bool:
    return n >= 2 and (n & (n - 1)) == 0


def bitrev_perm(n: int) -> np.ndarray:
    """Bit-reversal permutation of range(n) (n a power of two): the
    frequency order produced by the DIF stages below."""
    assert is_pow2(n)
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros_like(idx)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


def _axis_iota(x_ndim: int, axis: int, n: int):
    shape = [1] * x_ndim
    shape[axis] = n
    return jnp.arange(n, dtype=jnp.int32).reshape(shape)


def _twiddle(j, s, dtype, sign):
    """cos/sin of sign * 2*pi*(j mod s)/(2s) as arrays broadcastable
    against the data."""
    e = jnp.remainder(j, s).astype(dtype)
    ang = (sign * np.pi / s) * e
    return jnp.cos(ang), jnp.sin(ang)


def fft_dif(re, im, axis, inverse=False):
    """Radix-2 DIF transform along ``axis`` (length must be a power of 2).

    Natural-order input -> BIT-REVERSED-order output.  ``inverse`` flips
    the twiddle sign and applies the 1/n scale (use for an inverse whose
    *input* is natural and whose output is bit-reversed)."""
    n = re.shape[axis]
    assert is_pow2(n), n
    j = _axis_iota(re.ndim, axis, n)
    sign = 1.0 if inverse else -1.0
    s = n // 2
    while s >= 1:
        top = jnp.remainder(j, 2 * s) < s
        tr, ti = _twiddle(j, s, re.dtype, sign)
        ure = jnp.roll(re, -s, axis)
        uim = jnp.roll(im, -s, axis)
        dre = jnp.roll(re, s, axis) - re
        dim_ = jnp.roll(im, s, axis) - im
        pre = tr * dre - ti * dim_
        pim = tr * dim_ + ti * dre
        re = jnp.where(top, re + ure, pre)
        im = jnp.where(top, im + uim, pim)
        s //= 2
    if inverse:
        re = re / n
        im = im / n
    return re, im


def fft_dit(re, im, axis, inverse=True):
    """Radix-2 DIT transform along ``axis``: BIT-REVERSED-order input ->
    natural-order output.  Default is the inverse transform (twiddle sign
    +1, 1/n scale); ``inverse=False`` gives the forward transform from
    bit-reversed input."""
    n = re.shape[axis]
    assert is_pow2(n), n
    j = _axis_iota(re.ndim, axis, n)
    sign = 1.0 if inverse else -1.0
    s = 1
    while s <= n // 2:
        top = jnp.remainder(j, 2 * s) < s
        tr, ti = _twiddle(j, s, re.dtype, sign)
        bre = jnp.where(top, jnp.roll(re, -s, axis), re)
        bim = jnp.where(top, jnp.roll(im, -s, axis), im)
        wre = tr * bre - ti * bim
        wim = tr * bim + ti * bre
        are = jnp.where(top, re, jnp.roll(re, s, axis))
        aim = jnp.where(top, im, jnp.roll(im, s, axis))
        re = jnp.where(top, are + wre, are - wre)
        im = jnp.where(top, aim + wim, aim - wim)
        s *= 2
    if inverse:
        re = re / n
        im = im / n
    return re, im


def fftn_br(re, im, axes):
    """Forward FFT along ``axes``; every transformed axis comes out in
    bit-reversed frequency order."""
    for ax in axes:
        re, im = fft_dif(re, im, ax, inverse=False)
    return re, im


def ifftn_br(re, im, axes):
    """Inverse FFT along ``axes`` from bit-reversed frequency order back to
    natural spatial order (includes the 1/N scale)."""
    for ax in axes:
        re, im = fft_dit(re, im, ax, inverse=True)
    return re, im


def fluid_apply_radix_ref(mv, params, inverse):
    """Fluid operator via the radix pipeline — the pure-JAX oracle the
    Pallas kernels are validated against.  Packs real fields in pairs
    exactly like ops/fluid.py::_fluid_apply_packed "flat"/"batch" modes,
    but with bit-reversed-order spectra throughout."""
    from . import fluid as fl

    B, d = mv.shape[:2]
    spatial = tuple(mv.shape[2:])
    dim = len(spatial)
    assert all(is_pow2(n) for n in spatial)
    M = fl._fluid_multiplier_traced(
        spatial, tuple(float(p) for p in params), bool(inverse),
        jnp.float32, full_spectrum=True,
    )
    perms = [jnp.asarray(bitrev_perm(n)) for n in spatial]

    def brev(A):
        for a, p in enumerate(perms):
            A = jnp.take(A, p, axis=a)
        return A

    beta = float(params[1])
    if beta == 0.0 and B * d >= 2:
        n = B * d
        x = mv.reshape((n,) + spatial)
        if n % 2:
            x = jnp.concatenate([x, jnp.zeros((1,) + spatial, mv.dtype)], 0)
        half = x.shape[0] // 2
        axes = tuple(range(1, 1 + dim))
        re, im = fftn_br(x[:half], x[half:], axes)
        Mbr = brev(M[(0, 0)])[None]
        re, im = ifftn_br(re * Mbr, im * Mbr, axes)
        out = jnp.concatenate([re, im], axis=0)[:n]
        return out.reshape(mv.shape).astype(mv.dtype)

    # batch packing (d x d mixing per packed complex value)
    Bp = B
    x = mv
    if B % 2:
        x = jnp.concatenate([x, jnp.zeros((1,) + x.shape[1:], mv.dtype)], 0)
        Bp = B + 1
    half = Bp // 2
    axes = tuple(range(2, 2 + dim))
    re, im = fftn_br(x[:half], x[half:], axes)

    def mget(a, b):
        return M[(a, b)] if a >= b else M[(b, a)]

    rows_re, rows_im = [], []
    for a in range(d):
        acc_r = acc_i = None
        for b in range(d):
            mab = brev(mget(a, b))[None]
            tr, ti = mab * re[:, b], mab * im[:, b]
            acc_r = tr if acc_r is None else acc_r + tr
            acc_i = ti if acc_i is None else acc_i + ti
        rows_re.append(acc_r)
        rows_im.append(acc_i)
    re = jnp.stack(rows_re, axis=1)
    im = jnp.stack(rows_im, axis=1)
    re, im = ifftn_br(re, im, axes)
    out = jnp.concatenate([re, im], axis=0)[:B]
    return out.astype(mv.dtype)
