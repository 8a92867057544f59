"""Fourier-domain fluid (Helmholtz-type) vector operator.

TPU-native equivalent of the reference's ``fluid_operator`` CUDA kernel
(reference: lagomorph/extension/cuda/metric.cu:162-355) and its LUT setup
(lagomorph/metric.py:53-75).

The operator ``L'L`` with ``L'L = (-alpha * Laplacian - beta * grad div +
gamma)^2`` acts per spatial frequency ``k`` as a small real symmetric
``d x d`` matrix built from the discrete eigenvalues

    w_a = 2 * (1 - cos(2 pi k_a / N_a))        (cos LUT)
    s_a = sin(2 pi k_a / N_a)                  (sin LUT)

    lambda = gamma + alpha * sum_a w_a
    l[a][a] = lambda - beta * w_a
    l[a][b] = beta * s_a * s_b                 (a != b)
    L = l @ l                                   (matrix square)

``flat`` multiplies Fourier coefficients by ``L``; ``sharp`` solves ``L x =
b`` via a Cholesky factorization whose pivots are floored by ``safe_sqrt``
(metric.cu:14-18: ``sqrt(x)`` but ``1e-4`` whenever ``x < 1e-8``), which
regularizes the zero-frequency mode when ``gamma == 0``.

Instead of a per-frequency in-register solve, we precompute the entire
effective multiplier tensor ``M`` of shape ``(d, d, *freq_shape)`` once per
(shape, params, inverse, dtype) and apply it as one einsum between rFFT and
irFFT — a bandwidth-bound fused elementwise contraction, ideal for TPU.
Applying the *same* floored-Cholesky solve to the d unit vectors reproduces
the reference's sharp results bit-for-bit in exact arithmetic.
"""
from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp


def _safe_sqrt(x):
    return np.where(x < 1e-8, 1e-4, np.sqrt(np.maximum(x, 1e-8)))


def _lut_freqs(spatial):
    """Per-axis (w, s) LUT arrays broadcast to the rFFT half-spectrum grid.

    The last axis is halved to ``N//2 + 1`` (reference metric.py:60-62).
    """
    d = len(spatial)
    freq_shape = tuple(spatial[:-1]) + (spatial[-1] // 2 + 1,)
    ws, ss = [], []
    for a in range(d):
        Nf = freq_shape[a]
        N = spatial[a]
        k = np.arange(Nf, dtype=np.float64)
        w = 2.0 * (1.0 - np.cos(2.0 * np.pi * k / N))
        s = np.sin(2.0 * np.pi * k / N)
        shape = [1] * d
        shape[a] = Nf
        ws.append(w.reshape(shape))
        ss.append(s.reshape(shape))
    return freq_shape, ws, ss


@lru_cache(maxsize=64)
def fluid_multiplier(spatial: tuple, params: tuple, inverse: bool, dtype=np.float32):
    """Concrete (numpy, float64) per-frequency multiplier tensor
    ``M[d, d, *freq]`` — the *reference implementation* that the live traced
    builder :func:`_fluid_multiplier_traced` is cross-checked against
    (tests/test_metric.py); the shipped compute path never bakes this
    constant into a program (see the traced builder's docstring).

    ``params = (alpha, beta, gamma)``.  For ``inverse=False`` this is the
    squared operator ``L``; for ``inverse=True`` it is the matrix that the
    reference's floored Cholesky solve effectively applies.
    """
    alpha, beta, gamma = params
    d = len(spatial)
    freq_shape, ws, ss = _lut_freqs(spatial)

    lam = gamma + alpha * sum(np.broadcast_to(w, freq_shape).astype(np.float64) for w in ws)
    l = np.zeros((d, d) + freq_shape, dtype=np.float64)
    for a in range(d):
        l[a, a] = lam - beta * np.broadcast_to(ws[a], freq_shape)
        for b in range(a):
            lab = beta * np.broadcast_to(ss[a] * ss[b], freq_shape)
            l[a, b] = lab
            l[b, a] = lab
    # L = l @ l (symmetric square), per frequency
    L = np.einsum("ab...,bc...->ac...", l, l)

    if not inverse:
        # cache pure numpy: a device array created inside a jit trace would
        # be a tracer and leak through the lru_cache into later traces
        return L.astype(dtype)

    # Floored-Cholesky inverse, matching metric.cu:20-130 exactly.
    if d == 2:
        L00, L10, L11 = L[0, 0], L[1, 0], L[1, 1]
        ooG00 = 1.0 / _safe_sqrt(L00)
        G10 = L10 * ooG00
        ooG11 = 1.0 / _safe_sqrt(L11 - G10 * G10)

        def solve(b0, b1):
            y0 = b0 * ooG00
            y1 = (b1 - G10 * y0) * ooG11
            x1 = y1 * ooG11
            x0 = (y0 - G10 * x1) * ooG00
            return x0, x1

        c00, c10 = solve(np.ones_like(L00), np.zeros_like(L00))
        c01, c11 = solve(np.zeros_like(L00), np.ones_like(L00))
        M = np.stack([np.stack([c00, c01]), np.stack([c10, c11])])
    elif d == 3:
        L00, L10, L11 = L[0, 0], L[1, 0], L[1, 1]
        L20, L21, L22 = L[2, 0], L[2, 1], L[2, 2]
        ooG00 = 1.0 / _safe_sqrt(L00)
        G10 = L10 * ooG00
        G20 = L20 * ooG00
        ooG11 = 1.0 / _safe_sqrt(L11 - G10 * G10)
        G21 = (L21 - G20 * G10) * ooG11
        ooG22 = 1.0 / _safe_sqrt(L22 - G20 * G20 - G21 * G21)

        def solve(b0, b1, b2):
            y0 = b0 * ooG00
            y1 = (b1 - G10 * y0) * ooG11
            y2 = (b2 - G20 * y0 - G21 * y1) * ooG22
            x2 = y2 * ooG22
            x1 = (y1 - G21 * x2) * ooG11
            x0 = (y0 - G10 * x1 - G20 * x2) * ooG00
            return x0, x1, x2

        one = np.ones_like(L00)
        zero = np.zeros_like(L00)
        cols = [solve(one, zero, zero), solve(zero, one, zero), solve(zero, zero, one)]
        M = np.stack([np.stack([cols[j][i] for j in range(3)]) for i in range(3)])
    else:
        raise ValueError("Only 2D and 3D fluid operators are supported")
    return M.astype(dtype)


def _safe_sqrt_jnp(x):
    return jnp.where(x < 1e-8, 1e-4, jnp.sqrt(jnp.maximum(x, 1e-8)))


def _fluid_multiplier_traced(spatial, params, inverse, dtype,
                             full_spectrum=False, bitrev=False):
    """Traced (jnp) construction of the per-frequency multiplier entries.

    Same math as :func:`fluid_multiplier`, but built from iota inside the
    compiled program — a few dozen elementwise ops on the half-spectrum grid,
    negligible next to the FFTs, instead of a multi-hundred-MB baked
    constant (which at 256^3 exceeds program-size limits and wastes HBM).

    ``full_spectrum``: build entries for ALL frequencies of the last axis
    (used by the matmul-DFT path, which keeps the full complex spectrum);
    the cos/sin LUT formulas extend verbatim.

    ``bitrev``: permute each axis LUT into radix-2 bit-reversed frequency
    order (requires full_spectrum and power-of-two axes) — the order the
    Pallas DIF/DIT pipeline (ops/pallas/fft_unit.py) keeps spectra in.

    Returns a dict {(a, b): array} of the symmetric matrix entries
    (a >= b), each of shape ``freq_shape``.
    """
    alpha, beta, gamma = params
    d = len(spatial)
    freq_shape = (
        tuple(spatial)
        if full_spectrum
        else tuple(spatial[:-1]) + (spatial[-1] // 2 + 1,)
    )
    if bitrev:
        from .fft_radix import bitrev_perm

        assert full_spectrum
    ws, ss = [], []
    for a in range(d):
        Nf = freq_shape[a]
        N = spatial[a]
        if bitrev:
            k = jnp.asarray(bitrev_perm(Nf), dtype=dtype)
        else:
            k = jnp.arange(Nf, dtype=dtype)
        shape = [1] * d
        shape[a] = Nf
        ang = 2.0 * jnp.pi * k / N
        ws.append((2.0 * (1.0 - jnp.cos(ang))).reshape(shape))
        ss.append(jnp.sin(ang).reshape(shape))

    lam = gamma + alpha * sum(jnp.broadcast_to(w, freq_shape) for w in ws)
    l = {}
    for a in range(d):
        l[(a, a)] = lam - beta * jnp.broadcast_to(ws[a], freq_shape)
        for b in range(a):
            l[(a, b)] = beta * jnp.broadcast_to(ss[a] * ss[b], freq_shape)

    def lget(a, b):
        return l[(a, b)] if a >= b else l[(b, a)]

    # L = l @ l (symmetric square)
    L = {}
    for a in range(d):
        for b in range(a + 1):
            acc = None
            for c in range(d):
                term = lget(a, c) * lget(c, b)
                acc = term if acc is None else acc + term
            L[(a, b)] = acc

    if not inverse:
        return L

    # floored-Cholesky inverse (metric.cu:20-130)
    if d == 2:
        ooG00 = 1.0 / _safe_sqrt_jnp(L[(0, 0)])
        G10 = L[(1, 0)] * ooG00
        ooG11 = 1.0 / _safe_sqrt_jnp(L[(1, 1)] - G10 * G10)

        def solve(b0, b1):
            y0 = b0 * ooG00
            y1 = (b1 - G10 * y0) * ooG11
            x1 = y1 * ooG11
            x0 = (y0 - G10 * x1) * ooG00
            return x0, x1

        one = jnp.ones(freq_shape, dtype)
        zero = jnp.zeros(freq_shape, dtype)
        c00, c10 = solve(one, zero)
        _, c11 = solve(zero, one)
        return {(0, 0): c00, (1, 0): c10, (1, 1): c11}
    elif d == 3:
        ooG00 = 1.0 / _safe_sqrt_jnp(L[(0, 0)])
        G10 = L[(1, 0)] * ooG00
        G20 = L[(2, 0)] * ooG00
        ooG11 = 1.0 / _safe_sqrt_jnp(L[(1, 1)] - G10 * G10)
        G21 = (L[(2, 1)] - G20 * G10) * ooG11
        ooG22 = 1.0 / _safe_sqrt_jnp(L[(2, 2)] - G20 * G20 - G21 * G21)

        def solve(b0, b1, b2):
            y0 = b0 * ooG00
            y1 = (b1 - G10 * y0) * ooG11
            y2 = (b2 - G20 * y0 - G21 * y1) * ooG22
            x2 = y2 * ooG22
            x1 = (y1 - G21 * x2) * ooG11
            x0 = (y0 - G10 * x1 - G20 * x2) * ooG00
            return x0, x1, x2

        one = jnp.ones(freq_shape, dtype)
        zero = jnp.zeros(freq_shape, dtype)
        c00, c10, c20 = solve(one, zero, zero)
        _, c11, c21 = solve(zero, one, zero)
        _, _, c22 = solve(zero, zero, one)
        return {(0, 0): c00, (1, 0): c10, (1, 1): c11,
                (2, 0): c20, (2, 1): c21, (2, 2): c22}
    raise ValueError("Only 2D and 3D fluid operators are supported")


def fluid_operator(mv: jnp.ndarray, params, inverse: bool) -> jnp.ndarray:
    """Apply the fluid operator (or its inverse) to a batch of vector fields.

    ``mv``: ``(N, dim, *spatial)``.  The operator is self-adjoint in the
    real L2 inner product (the multiplier is real, symmetric in the
    component indices, and even under k -> N-k), so the backward pass
    re-applies the same operator to the cotangent — exactly the reference's
    hand-written backward (lagomorph/metric.py:21-34) and cheaper than
    autodiff's transposed-FFT chain (which pays hermitian-redundancy
    masking/scaling fixups on the half spectrum).
    """
    return _fluid_cvjp(mv, tuple(float(p) for p in params), bool(inverse))


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _fluid_cvjp(mv, params, inverse):
    return _fluid_apply(mv, params, inverse)


def _fluid_cvjp_fwd(mv, params, inverse):
    return _fluid_apply(mv, params, inverse), None


def _fluid_cvjp_bwd(params, inverse, _res, g):
    return (_fluid_apply(g, params, inverse),)


_fluid_cvjp.defvjp(_fluid_cvjp_fwd, _fluid_cvjp_bwd)


# Matmul-DFT path: on TPU, a 1D DFT along an axis of length N is two N x N
# real matmuls — MXU work instead of XLA's FFT lowering.  Validated to
# ~2e-7 relative on v5e, but MEASURED SLOWER than XLA's FFT at 128^3 b4
# (sharp 9.1 ms vs 5.4 ms, scripts/fft_probe.py) — f32 HIGHEST-precision
# matmuls pay a 3x pass penalty that eats the theoretical win.  Kept as an
# opt-in (set_fluid_dft(True)) and as the substrate for a future bf16
# experiment; "auto" currently resolves to the FFT path everywhere.
_DFT_MATMUL = "auto"
_DFT_AUTO_ENABLED = False  # flip after a measurement shows DFT winning


def set_fluid_dft(mode):
    """Select the fluid-transform implementation: True (matmul-DFT), False
    (XLA FFT), or "auto".  Trace-time flag — retrace after changing."""
    global _DFT_MATMUL
    prev = _DFT_MATMUL
    assert mode in (True, False, "auto")
    _DFT_MATMUL = mode
    return prev


def _use_dft(spatial, dtype) -> bool:
    if _DFT_MATMUL is True:
        return True
    if _DFT_MATMUL is False or not _DFT_AUTO_ENABLED:
        return False
    if dtype != jnp.float32:
        return False
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover
        return False
    return (
        backend in ("tpu", "axon")
        and len(spatial) == 3
        and all(n <= 192 for n in spatial)
    )


def _dft_pair(N, dtype, inverse):
    """Symmetric cos/sin DFT (or normalized inverse-DFT) matrices, built
    from iota (no baked constants)."""
    n = jnp.arange(N, dtype=dtype)
    sign = 2.0 if inverse else -2.0
    ang = sign * jnp.pi * n[:, None] * n[None, :] / N
    scale = (1.0 / N) if inverse else 1.0
    return jnp.cos(ang) * scale, jnp.sin(ang) * scale


def _fluid_apply_dft(mv, params, inverse):
    """Fluid operator via per-axis DFT matmuls on the full complex spectrum
    (kept as separate re/im real tensors).

    Round 3: PACKED pairs — two real fields per complex value (valid since
    the multiplier is even in k), so both matmul lanes carry real data.
    Measured at 128^3 b4 (fft_probe4, f32-HIGHEST): 4.24 ms vs 9.4 ms for
    the round-2 re+zero-im formulation, vs 5.1 ms for the default packed
    fftn path; error vs a float64 oracle 3.8e-5 (fftn: 2e-6) — which is why
    this stays an opt-in (set_fluid_dft) rather than the default.  Packing
    follows _fluid_apply_packed: "flat" across B*d slabs when beta == 0,
    batch pairs (zero-padding odd B) otherwise."""
    B, dim = mv.shape[:2]
    spatial = tuple(mv.shape[2:])
    dt = mv.dtype
    hi = jax.lax.Precision.HIGHEST
    params = tuple(float(p) for p in params)
    M = _fluid_multiplier_traced(
        spatial, params, bool(inverse), dt, full_spectrum=True
    )

    def transform(re, im, invdir, axis0):
        for ax_off, N in enumerate(spatial):
            axis = axis0 + ax_off
            C, S = _dft_pair(N, dt, invdir)

            def t(x, Mx):
                moved = jnp.moveaxis(x, axis, -1)
                out = jnp.tensordot(moved, Mx, axes=([moved.ndim - 1], [0]),
                                    precision=hi)
                return jnp.moveaxis(out, -1, axis)

            re, im = t(re, C) - t(im, S), t(re, S) + t(im, C)
        return re, im

    if params[1] == 0.0 and B * dim >= 2:
        # scalar multiplier: pack across all B*d slabs
        n = B * dim
        x = mv.reshape((n,) + spatial)
        pad = n % 2
        if pad:
            x = jnp.concatenate([x, jnp.zeros((1,) + spatial, dt)], axis=0)
        half = x.shape[0] // 2
        re, im = transform(x[:half], x[half:], False, 1)
        m00 = M[(0, 0)][None]
        re, im = re * m00, im * m00
        re, _im = transform(re, im, True, 1)
        out = jnp.concatenate([re, _im], axis=0)
        if pad:
            out = out[:n]
        return out.reshape(mv.shape).astype(dt)

    # general multiplier: pack batch pairs (zero-pad odd B)
    x = mv
    Bp = B
    if B % 2:
        x = jnp.concatenate([x, jnp.zeros((1,) + x.shape[1:], dt)], axis=0)
        Bp = B + 1
    half = Bp // 2
    re, im = transform(x[:half], x[half:], False, 2)

    def mget(a, b):
        return M[(a, b)] if a >= b else M[(b, a)]

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
    re, im = transform(re, im, True, 2)
    out = jnp.concatenate([re, im], axis=0)
    return out[:B].astype(dt)


# Packed-pair complex transforms: the fluid multiplier M(k) is real and
# EVEN under k -> -k (cos-built diagonal; sin*sin off-diagonals flip sign
# twice), so for real fields x1, x2 packed as c = x1 + i*x2,
#     ifftn(M . fftn(c)) = apply(x1) + i * apply(x2)
# exactly — one complex FFT serves TWO real fields with no hermitian
# unpacking.  vs rfftn per field this does 3 full-spectrum axis passes per
# 2 fields instead of ~2 per field.
#
# Default ON for TPU backends, for two measured reasons (2026-08-17, v5e):
#  * speed: sharp 128^3 b4 drops 6.65 -> 4.92 ms (scripts/fft_probe3.py);
#  * CORRECTNESS: XLA's TPU rfftn->irfftn round trip is numerically BROKEN
#    for >= 12 batched 128^3 transforms on this backend (max roundtrip
#    error ~1.7 vs ~2e-6 at <= 6 transforms or at 64^3 any batch) — i.e.
#    the unpacked path silently produces garbage exactly at the headline
#    128^3 b4 shape.  The packed C2C path measures ~2e-6 at every tested
#    (res, batch).  Guarded by scripts/tpu_checks.py ground-truth checks.
_PACKED_FFT = "auto"
_PACKED_AUTO_ENABLED = True


def set_fluid_packing(mode):
    """Select packed-pair complex transforms: True, False, or "auto".
    Trace-time flag — retrace after changing."""
    global _PACKED_FFT
    assert mode in (True, False, "auto")
    prev = _PACKED_FFT
    _PACKED_FFT = mode
    return prev


def _packing_mode(shape, params, dtype):
    """Packing strategy for a (B, d, *spatial) field, or None.

    "flat": beta == 0 -> the multiplier is one scalar field applied to every
    component identically, so pack across all B*d slabs (works for any B).
    "batch": beta != 0 mixes components per frequency, which still applies
    per packed complex value, so pack pairs of batch elements (B even).
    """
    if _PACKED_FFT is False:
        return None
    if _PACKED_FFT == "auto":
        if not _PACKED_AUTO_ENABLED:
            return None
        try:
            backend = jax.default_backend()
        except Exception:  # pragma: no cover
            return None
        if backend not in ("tpu", "axon"):
            return None
    if dtype not in (jnp.float32, np.float32):
        return None
    B, d = shape[0], shape[1]
    beta = float(params[1])
    if beta == 0.0:
        return "flat" if B * d >= 2 else None
    # beta != 0 mixes components: pack batch pairs; odd B pads one zero
    # batch row (one half-wasted transform, still fewer passes than rfftn —
    # and on TPU the rfftn path is numerically unsafe at large batches)
    return "batch" if B % 2 == 0 else "batch_pad"


# Pallas radix-2 FFT kernels (ops/pallas/fft_unit.py): the whole
# DIF -> multiply -> DIT convolution runs in VMEM, three HBM round trips
# per packed field vs XLA FFT's per-stage materializations.
_FFT_KERNEL = "auto"
_FFT_KERNEL_AUTO_ENABLED = True


def set_fluid_fft_kernel(mode):
    """Select the Pallas fluid-FFT path: "auto" (MXU-DFT kernels where
    supported), True/"mxu" (force MXU-DFT), "radix" (force the radix-2
    reference kernels — measured slower, probe surface), or False (XLA
    fftn).  Trace-time flag — retrace after changing."""
    global _FFT_KERNEL
    assert mode in (True, False, "auto", "mxu", "radix")
    prev = _FFT_KERNEL
    _FFT_KERNEL = mode
    return prev


_MXU_WHOLE = False  # measured SLOWER than the 3-kernel pipeline (below)


def set_fluid_mxu_whole(mode):
    """Select the whole-volume one-kernel MXU-DFT fluid path: True, False,
    or "auto" (use when fft_unit.mxu_whole_supported).  Trace-time flag.

    Default False: on v5e the one-kernel path LOST to the three-kernel
    pipeline at its own target shape (64^3 b4, same-run scan-amortized:
    sharp fwd 0.78 vs 0.15 ms, fwd+bwd 1.44 vs 0.63 — scripts/fft_probe6.py)
    — the per-y-plane x-stage loop serializes small matmuls where the
    three-kernel pipeline batches whole (Y*Z)-merged panels onto the MXU.
    Kept as an opt-in probe surface for backends with higher kernel-launch
    cost."""
    global _MXU_WHOLE
    assert mode in (True, False, "auto")
    prev = _MXU_WHOLE
    _MXU_WHOLE = mode
    return prev


def _use_mxu_whole(spatial, dtype):
    if _MXU_WHOLE is False:
        return False
    if _MXU_WHOLE is True:  # forced (probe surface) — bypasses the gate
        return True
    try:
        from .pallas import fft_unit
    except Exception:  # pragma: no cover
        return False
    return fft_unit.mxu_whole_supported(tuple(spatial), dtype)


def _fft_kernel_mode(spatial, dtype):
    """Which Pallas fluid-FFT kernel to use: "mxu", "radix", or None."""
    if _FFT_KERNEL is False:
        return None
    if _FFT_KERNEL == "auto" and not _FFT_KERNEL_AUTO_ENABLED:
        return None
    try:
        from .pallas import fft_unit
    except Exception:  # pragma: no cover
        return None
    spatial = tuple(spatial)
    if _FFT_KERNEL == "radix":
        return "radix" if fft_unit.fft_kernel_supported(spatial, dtype) else None
    if fft_unit.mxu_kernel_supported(spatial, dtype):
        return "mxu"
    return None


def _fluid_apply_packed(mv, params, inverse, mode):
    B, d = mv.shape[:2]
    spatial = tuple(mv.shape[2:])
    dim = len(spatial)
    kmode = _fft_kernel_mode(spatial, mv.dtype) if mode == "flat" else None
    if kmode is not None:
        from .pallas import fft_unit

        n = B * d
        x = mv.reshape((n,) + spatial)
        pad = n % 2
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((1,) + spatial, mv.dtype)], axis=0
            )
        half = x.shape[0] // 2
        if kmode == "mxu":
            Mn = _fluid_multiplier_traced(
                spatial, params, inverse, jnp.float32, full_spectrum=True
            )[(0, 0)]
            fwd = tuple(_dft_pair(nn, jnp.float32, False) for nn in spatial)
            inv = tuple(_dft_pair(nn, jnp.float32, True) for nn in spatial)
            if _use_mxu_whole(spatial, mv.dtype):
                re, im = fft_unit.fluid_flat_mxu_whole(
                    x[:half], x[half:], Mn, fwd, inv
                )
            else:
                re, im = fft_unit.fluid_flat_mxu(
                    x[:half], x[half:], Mn, fwd, inv
                )
        else:
            Mbr = _fluid_multiplier_traced(
                spatial, params, inverse, jnp.float32,
                full_spectrum=True, bitrev=True,
            )[(0, 0)]
            re, im = fft_unit.fluid_flat_pallas(x[:half], x[half:], Mbr)
        out = jnp.concatenate([re, im], axis=0)
        if pad:
            out = out[:n]
        return out.reshape(mv.shape).astype(mv.dtype)
    M = _fluid_multiplier_traced(
        spatial, params, inverse, jnp.float32, full_spectrum=True
    )
    if mode == "flat":
        n = B * d
        x = mv.reshape((n,) + spatial)
        pad = n % 2
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((1,) + spatial, mv.dtype)], axis=0
            )
        half = x.shape[0] // 2
        axes = tuple(range(1, 1 + dim))
        c = jax.lax.complex(x[:half], x[half:])
        F = jnp.fft.fftn(c, axes=axes) * M[(0, 0)][None]
        y = jnp.fft.ifftn(F, axes=axes)
        out = jnp.concatenate([y.real, y.imag], axis=0)
        if pad:
            out = out[:n]
        return out.reshape(mv.shape).astype(mv.dtype)
    # "batch"/"batch_pad": pack batch halves; d x d mixing per packed value
    Bp = B
    if mode == "batch_pad":
        mv = jnp.concatenate(
            [mv, jnp.zeros((1,) + mv.shape[1:], mv.dtype)], axis=0
        )
        Bp = B + 1
    half = Bp // 2
    axes = tuple(range(2, 2 + dim))
    c = jax.lax.complex(mv[:half], mv[half:])
    F = jnp.fft.fftn(c, axes=axes)

    def mget(a, b):
        return M[(a, b)] if a >= b else M[(b, a)]

    rows = []
    for a in range(d):
        acc = None
        for b in range(d):
            term = mget(a, b)[None] * F[:, b]
            acc = term if acc is None else acc + term
        rows.append(acc)
    F = jnp.stack(rows, axis=1)
    y = jnp.fft.ifftn(F, axes=axes)
    out = jnp.concatenate([y.real, y.imag], axis=0)
    return out[:B].astype(mv.dtype)


def _fluid_apply(mv: jnp.ndarray, params, inverse: bool) -> jnp.ndarray:
    dim = mv.shape[1]
    spatial = tuple(mv.shape[2:])
    if dim != len(spatial):
        raise ValueError("Vector field has incorrect shape for dimension")
    if _use_dft(spatial, mv.dtype):
        return _fluid_apply_dft(mv, params, inverse)
    pmode = _packing_mode(mv.shape, params, mv.dtype)
    if pmode is not None:
        return _fluid_apply_packed(mv, params, inverse, pmode)
    axes = tuple(range(2, 2 + dim))
    F = jnp.fft.rfftn(mv, axes=axes, norm="ortho")
    rdtype = jnp.real(F).dtype
    M = _fluid_multiplier_traced(
        spatial, tuple(float(p) for p in params), bool(inverse), rdtype
    )

    def mget(a, b):
        return M[(a, b)] if a >= b else M[(b, a)]

    # Apply the small d x d per-frequency matrix as unrolled elementwise
    # multiply-adds over the component axis.  (An einsum/dot_general here
    # puts the tiny contraction dims minormost, which TPU pads to full
    # (8,128) tiles — a 40x memory blowup at 3D shapes.)
    rows = []
    for a in range(dim):
        acc = None
        for b in range(dim):
            term = mget(a, b)[None] * F[:, b]
            acc = term if acc is None else acc + term
        rows.append(acc)
    F = jnp.stack(rows, axis=1)
    return jnp.fft.irfftn(F, s=spatial, axes=axes, norm="ortho").astype(mv.dtype)
