"""Fused Pallas fluid solvers: MXU per-axis DFT (production) and a
radix-2 FFT reference pipeline.

XLA's TPU FFT measures ~3.2x off HBM traffic-ideal for the fluid solve
(BASELINE.md roofline).  Both paths here compute the whole solve

    v = ifftn(M . fftn(x1 + i*x2))        (packed-pair, multiplier even)

in three Pallas kernels = three HBM round trips of the packed complex
field (~6 field volumes) instead of XLA's per-stage materializations.
Measured at 128^3 b4 (scripts/fft_probe5.py, scan-amortized): sharp fwd
5.01 (XLA fftn) vs 2.99 ms (MXU-DFT, 3pass) vs 4.27 (MXU HIGHEST) vs
9.70 (radix rolls); fwd+bwd 10.01 vs 6.15 vs 7.53 vs 18.80.  The MXU
3-pass path wins and is the TPU default; the radix pipeline stays as a
validated VPU-only reference.  Accuracy: fluid solve 4.09e-5 rel vs a
float64 oracle (f32-accumulation-limited — HIGHEST measures the same);
end-to-end 5-step shooting differs from packed-fftn by 2.9e-5 voxels
(scripts/fft_deform_err.py).

Radix-2 structure (fluid_flat_pallas):

  kernel A  (grid: field x X-blocks)   : radix-2 DIF stages along z then y
                                         (both live on the flattened (Y,Z)
                                         lane axis; partner taps are lane
                                         rolls by s and s*Z)
  kernel B  (grid: field x lane-blocks): DIF stages along x (sublane rolls),
                                         multiply by the bit-reversed
                                         multiplier, DIT stages back (1/X)
  kernel C  (grid: field x X-blocks)   : DIT stages along y then z (1/(YZ))

DIF produces bit-reversed frequency order and DIT consumes it, so no
reordering pass exists anywhere; the multiplier M is built with
bit-reversed per-axis LUTs (ops/fluid.py::_fluid_multiplier_traced with
``bitrev=True``).  All radix math is f32 on the VPU — no MXU precision
caveats, but 42 roll-based butterfly stages are VPU-expensive, which is
why the MXU-DFT kernels below beat it ~2.7x.

Butterfly algebra (s = half-block, L = 2s, j = index along the axis,
top <=> (j & s) == 0, e = j & (s-1), W = exp(sign*i*pi*e/s)):

    DIF: out = where(top, a[j] + a[j+s], W * (a[j-s] - a[j]))
    DIT: w   = W * where(top, a[j+s], a[j])
         out = where(top, a[j] + w,    a[j-s] - w)

Validated bit-for-bit shapes/semantics against ops/fft_radix.py (pure JAX)
in interpret mode and against a float64 numpy oracle on hardware
(scripts/tpu_checks.py).  Reference counterpart: the cuFFT pipeline of
lagomorph/metric.py:11-19 / metric.cu:162-355.
"""
from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

try:  # pragma: no cover - exercised only on TPU installs
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

from .warp_unit import pallas_warp_enabled
from ..fft_radix import is_pow2


def _supported_backend() -> bool:
    if not (_PALLAS_OK and pallas_warp_enabled()):
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def fft_kernel_supported(spatial, dtype) -> bool:
    """Gate: 3D, power-of-two axes, f32, lane/sublane-aligned."""
    if len(spatial) != 3:
        return False
    if dtype not in (jnp.float32, np.float32):
        return False
    X, Y, Z = spatial
    if not (is_pow2(X) and is_pow2(Y) and is_pow2(Z)):
        return False
    if X % 8 or (Y * Z) % 128:
        return False
    # kernel B holds full-X slabs; keep them comfortably inside VMEM
    if X > 512:
        return False
    return _supported_backend()


# ---------------------------------------------------------------------------
# stage helpers (shared by kernels; also run under interpret mode)
# ---------------------------------------------------------------------------


def _roll(A, shift, axis, size):
    return pltpu.roll(A, shift % size, axis)


def _dif_stages(re, im, n, step, idx, axis, size, sign):
    """All radix-2 DIF stages of one axis.  ``idx``: int32 iota of the
    transform index at each position (broadcastable against the slabs);
    ``step``: positions per unit index along ``axis`` of physical size
    ``size``."""
    s = n // 2
    while s >= 1:
        top = (idx & s) == 0
        e = (idx & (s - 1)).astype(re.dtype)
        ang = (sign * math.pi / s) * e
        tr = jnp.cos(ang)
        ti = jnp.sin(ang)
        u_re = _roll(re, -s * step, axis, size)
        u_im = _roll(im, -s * step, axis, size)
        d_re = _roll(re, s * step, axis, size) - re
        d_im = _roll(im, s * step, axis, size) - im
        p_re = tr * d_re - ti * d_im
        p_im = tr * d_im + ti * d_re
        re = jnp.where(top, re + u_re, p_re)
        im = jnp.where(top, im + u_im, p_im)
        s //= 2
    return re, im


def _dit_stages(re, im, n, step, idx, axis, size, sign, scale):
    """All radix-2 DIT stages of one axis (bit-reversed input -> natural),
    folding ``scale`` (e.g. 1/n for an inverse) into the last stage."""
    s = 1
    while s <= n // 2:
        last = s == n // 2
        top = (idx & s) == 0
        e = (idx & (s - 1)).astype(re.dtype)
        ang = (sign * math.pi / s) * e
        tr = jnp.cos(ang)
        ti = jnp.sin(ang)
        b_re = jnp.where(top, _roll(re, -s * step, axis, size), re)
        b_im = jnp.where(top, _roll(im, -s * step, axis, size), im)
        w_re = tr * b_re - ti * b_im
        w_im = tr * b_im + ti * b_re
        a_re = jnp.where(top, re, _roll(re, s * step, axis, size))
        a_im = jnp.where(top, im, _roll(im, s * step, axis, size))
        sgn = jnp.where(top, re.dtype.type(1.0), re.dtype.type(-1.0))
        re = a_re + sgn * w_re
        im = a_im + sgn * w_im
        if last and scale != 1.0:
            re = re * re.dtype.type(scale)
            im = im * im.dtype.type(scale)
        s *= 2
    return re, im


# ---------------------------------------------------------------------------
# kernel A: DIF along z then y (lane axis), one (field, x-block) per step
# ---------------------------------------------------------------------------


def _zy_fwd_kernel(Y, Z, re_ref, im_ref, ore_ref, oim_ref):
    re = re_ref[0]  # (BX, Y*Z)
    im = im_ref[0]
    YZ = Y * Z
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, YZ), 1)
    jz = lane & (Z - 1)
    jy = lane >> (Z.bit_length() - 1)
    re, im = _dif_stages(re, im, Z, 1, jz, 1, YZ, -1.0)
    re, im = _dif_stages(re, im, Y, Z, jy, 1, YZ, -1.0)
    ore_ref[0] = re
    oim_ref[0] = im


def _zy_inv_kernel(Y, Z, re_ref, im_ref, ore_ref, oim_ref):
    re = re_ref[0]
    im = im_ref[0]
    YZ = Y * Z
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, YZ), 1)
    jz = lane & (Z - 1)
    jy = lane >> (Z.bit_length() - 1)
    re, im = _dit_stages(re, im, Y, Z, jy, 1, YZ, 1.0, 1.0 / Y)
    re, im = _dit_stages(re, im, Z, 1, jz, 1, YZ, 1.0, 1.0 / Z)
    ore_ref[0] = re
    oim_ref[0] = im


# ---------------------------------------------------------------------------
# kernel B: DIF along x (sublane axis), multiplier, DIT back
# ---------------------------------------------------------------------------


def _x_mul_kernel(X, re_ref, im_ref, m_ref, ore_ref, oim_ref):
    re = re_ref[0]  # (X, BL)
    im = im_ref[0]
    M = m_ref[...]  # (X, BL) bit-reversed multiplier slab
    jx = jax.lax.broadcasted_iota(jnp.int32, (X, 1), 0)
    re, im = _dif_stages(re, im, X, 1, jx, 0, X, -1.0)
    re = re * M
    im = im * M
    re, im = _dit_stages(re, im, X, 1, jx, 0, X, 1.0, 1.0 / X)
    ore_ref[0] = re
    oim_ref[0] = im


# ---------------------------------------------------------------------------
# drivers
# ---------------------------------------------------------------------------


def _pick_bx(X: int, YZ: int) -> int:
    """x-block rows for kernels A/C: ~2 MB in-slabs, %8, divides X."""
    for bx in (32, 16, 8):
        if X % bx == 0 and 4 * bx * YZ * 4 <= 4 * 1024 * 1024:
            return bx
    return 8


def _pick_bl(X: int, YZ: int) -> int:
    """lane-block for kernel B: full-X columns, ~0.5-1 MB per plane."""
    for bl in (2048, 1024, 512, 256, 128):
        if YZ % bl == 0 and X * bl * 4 <= 1 * 1024 * 1024:
            return bl
    return 128


def _zy_call(kernel, Y, Z, re, im):
    F, X, YZ = re.shape
    BX = _pick_bx(X, YZ)
    spec = pl.BlockSpec((1, BX, YZ), lambda f, xb: (f, xb, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(kernel, Y, Z),
        out_shape=(
            jax.ShapeDtypeStruct((F, X, YZ), re.dtype),
            jax.ShapeDtypeStruct((F, X, YZ), re.dtype),
        ),
        grid=(F, X // BX),
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        # the 14 butterfly stages keep ~8 live planes; Mosaic's stack
        # accounting wants more than the 16M default at YZ=16384
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
    )(re, im)


def _x_mul_call(re, im, Mbr):
    F, X, YZ = re.shape
    BL = _pick_bl(X, YZ)
    spec = pl.BlockSpec((1, X, BL), lambda f, lb: (f, 0, lb),
                        memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((X, BL), lambda f, lb: (0, lb),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_x_mul_kernel, X),
        out_shape=(
            jax.ShapeDtypeStruct((F, X, YZ), re.dtype),
            jax.ShapeDtypeStruct((F, X, YZ), re.dtype),
        ),
        grid=(F, YZ // BL),
        in_specs=[spec, spec, mspec],
        out_specs=(spec, spec),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
    )(re, im, Mbr)


def fluid_flat_pallas(x1, x2, Mbr):
    """Packed-pair scalar-multiplier fluid apply via the radix-2 kernels:
    returns ``(apply(x1), apply(x2))`` for real fields ``x1``/``x2`` of
    shape ``(F, X, Y, Z)`` and a bit-reversed multiplier ``Mbr`` of shape
    ``(X, Y, Z)`` (beta == 0 => one scalar field for every component).

    MEASURED SLOWER than both XLA fftn and the MXU-DFT kernels below
    (8.8 ms vs 4.7 / see fft_probe5 at 128^3 b4): 42 roll-based butterfly
    stages are VPU-expensive even in VMEM.  Kept as a validated reference
    pipeline; production uses :func:`fluid_flat_mxu`."""
    F, X, Y, Z = x1.shape
    re = x1.reshape(F, X, Y * Z)
    im = x2.reshape(F, X, Y * Z)
    M = Mbr.reshape(X, Y * Z)
    re, im = _zy_call(_zy_fwd_kernel, Y, Z, re, im)
    re, im = _x_mul_call(re, im, M)
    re, im = _zy_call(_zy_inv_kernel, Y, Z, re, im)
    return re.reshape(F, X, Y, Z), im.reshape(F, X, Y, Z)


# ===========================================================================
# MXU per-axis DFT kernels.
#
# A 1D DFT along an axis of length N is a complex N x N matmul.  Inside
# Pallas the three axes land on the MXU with NO relayouts (the reason the
# XLA-level matmul-DFT lost at 9.1 ms — moveaxis/tensordot materialize
# transposed copies between passes):
#
#   kernel A (grid: field x X-slices; block (Y, Z)):
#       z-DFT = A @ Wz   (contract lanes),  y-DFT = Wy @ A  (contract rows)
#   kernel B (grid: field x lane-blocks; block (X, BL)):
#       x-DFT = Wx @ A, multiply by M (natural order!), inverse x-DFT
#   kernel C: inverse y- and z-DFTs on (Y, Z) blocks (1/N folded into the
#       inverse matrices).
#
# DFT matrices are built traced (ops/fluid.py::_dft_pair) and passed as
# inputs; complex arithmetic stays as two real planes (4 real matmuls per
# axis).  Matmul precision is HIGHEST by default: bf16-pass error is
# amplified by the 1/gamma^2 low-frequency gain (measured 6e-3 end-to-end
# at DEFAULT — unusable; see scripts/fft_probe4.py).
# ===========================================================================

_MXU_PRECISION = "3pass"


def set_fft_mxu_precision(p):
    """Matmul precision for the MXU-DFT kernels — trace-time flag.

    "3pass" (default): manual hi/lo bf16 operand split with the lo x lo
    term dropped — half the MXU passes of HIGHEST at the same measured
    accuracy (fluid solve 4.09e-5 rel vs the f64 oracle for BOTH, i.e.
    f32-accumulation-limited; end-to-end 5-step shooting differs from the
    packed-fftn path by 2.9e-5 voxels at 128^3, scripts/fft_deform_err.py;
    sharp fwd 2.99 vs 4.27 ms, fft_probe5).  "highest": XLA 6-pass bf16
    emulation of f32.  "default": single bf16 pass (measured 6.5e-3
    end-to-end under the 1/gamma^2 low-frequency gain — probe only,
    unusable)."""
    global _MXU_PRECISION
    assert p in ("highest", "3pass", "default")
    prev = _MXU_PRECISION
    _MXU_PRECISION = p
    return prev


def _split_bf16(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(u, v):
    """f32 matmul as three bf16 passes (hi@hi + hi@lo + lo@hi)."""
    uh, ul = _split_bf16(u)
    vh, vl = _split_bf16(v)

    def d(x, y):
        return jnp.dot(x, y, preferred_element_type=jnp.float32)

    return d(uh, vh) + d(uh, vl) + d(ul, vh)


def _cdot(ar, ai, br, bi, left=False):
    """Complex matmul of plane pairs: (ar + i*ai) @ (br + i*bi), or the
    left-multiplication (br + i*bi) @ (ar + i*ai) when ``left``."""
    if _MXU_PRECISION == "3pass":
        dot = _dot3
    else:
        prec = {
            "highest": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT,
        }[_MXU_PRECISION]

        def dot(u, v):
            return jnp.dot(u, v, precision=prec,
                           preferred_element_type=jnp.float32)

    if left:
        return (
            dot(br, ar) - dot(bi, ai),
            dot(br, ai) + dot(bi, ar),
        )
    return (
        dot(ar, br) - dot(ai, bi),
        dot(ar, bi) + dot(ai, br),
    )


def _zy_dft_kernel(inverse, BR, re_ref, im_ref, zr_ref, zi_ref, yr_ref,
                   yi_ref, ore_ref, oim_ref):
    """z- and y-axis DFTs on a (BR, Y, Z) block of x-rows.  Batching BR=8
    rows per grid step cuts the grid from F*X to F*X/8 steps (per-step
    overhead dominated the un-batched kernel) and feeds the MXU a
    (BR*Y, Z) z-contraction instead of 8 small (Y, Z) ones; the y
    contraction (left-multiplication per row) stays per-row but pipelines
    back-to-back on the MXU."""
    re = re_ref[0]  # (BR, Y, Z)
    im = im_ref[0]
    zr, zi = zr_ref[...], zi_ref[...]  # (Z, Z)
    yr, yi = yr_ref[...], yi_ref[...]  # (Y, Y)
    _, Y, Z = re.shape

    def zdft(r, i):
        # merge (BR, Y) into the sublane axis: layout-preserving (lanes
        # unchanged), one big MXU contraction
        rf, if_ = _cdot(r.reshape(BR * Y, Z), i.reshape(BR * Y, Z), zr, zi)
        return rf.reshape(BR, Y, Z), if_.reshape(BR, Y, Z)

    def ydft(r, i):
        outs = [_cdot(r[b], i[b], yr, yi, left=True) for b in range(BR)]
        return (
            jnp.stack([o[0] for o in outs]),
            jnp.stack([o[1] for o in outs]),
        )

    if inverse:
        re, im = ydft(re, im)
        re, im = zdft(re, im)
    else:
        re, im = zdft(re, im)
        re, im = ydft(re, im)
    ore_ref[0] = re
    oim_ref[0] = im


def _x_mul_dft_kernel(re_ref, im_ref, m_ref, fr_ref, fi_ref, br_ref, bi_ref,
                      ore_ref, oim_ref):
    re = re_ref[0]  # (X, BL)
    im = im_ref[0]
    M = m_ref[...]
    re, im = _cdot(re, im, fr_ref[...], fi_ref[...], left=True)
    re = re * M
    im = im * M
    re, im = _cdot(re, im, br_ref[...], bi_ref[...], left=True)
    ore_ref[0] = re
    oim_ref[0] = im


def _zy_dft_call(inverse, re, im, zmats, ymats):
    F, X, Y, Z = re.shape
    BR = next(b for b in (8, 4, 2, 1) if X % b == 0)
    spec = pl.BlockSpec((1, BR, Y, Z), lambda f, x: (f, x, 0, 0),
                        memory_space=pltpu.VMEM)

    def mat_spec(n):
        return pl.BlockSpec((n, n), lambda f, x: (0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        partial(_zy_dft_kernel, inverse, BR),
        out_shape=(
            jax.ShapeDtypeStruct((F, X, Y, Z), re.dtype),
            jax.ShapeDtypeStruct((F, X, Y, Z), re.dtype),
        ),
        grid=(F, X // BR),
        in_specs=[spec, spec, mat_spec(Z), mat_spec(Z),
                  mat_spec(Y), mat_spec(Y)],
        out_specs=(spec, spec),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(re, im, zmats[0], zmats[1], ymats[0], ymats[1])


def _x_mul_dft_call(re, im, Mn, fmats, bmats):
    F, X, YZ = re.shape
    BL = _pick_bl(X, YZ)
    spec = pl.BlockSpec((1, X, BL), lambda f, lb: (f, 0, lb),
                        memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((X, BL), lambda f, lb: (0, lb),
                         memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((X, X), lambda f, lb: (0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _x_mul_dft_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((F, X, YZ), re.dtype),
            jax.ShapeDtypeStruct((F, X, YZ), re.dtype),
        ),
        grid=(F, YZ // BL),
        in_specs=[spec, spec, mspec, xspec, xspec, xspec, xspec],
        out_specs=(spec, spec),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(re, im, Mn, fmats[0], fmats[1], bmats[0], bmats[1])


def mxu_kernel_supported(spatial, dtype) -> bool:
    """Gate for the MXU-DFT fluid kernels: 3D f32 with MXU/DMA-aligned
    axes (sublane %8; lane axis %128 OR a small power-of-128-divisible
    (Y*Z) so the x-kernel's lane blocks stay aligned).  Round 4 relaxes the
    original Z % 128 requirement to Z % 64: at Z = 64 the z-contraction
    matmuls run at half lane utilization, which still beats the XLA fftn
    fallback (this is the 64^3 bench geometry the round-3 gates left
    behind — VERDICT r3 #4)."""
    if len(spatial) != 3:
        return False
    if dtype not in (jnp.float32, np.float32):
        return False
    X, Y, Z = spatial
    if Z % 64 or Y % 8 or X % 8 or (Y * Z) % 128:
        return False
    if X > 1024 or Y > 1024 or Z > 1024:
        return False
    return _supported_backend()


def mxu_whole_supported(spatial, dtype) -> bool:
    """Gate for the WHOLE-VOLUME MXU-DFT fluid kernel: the full 3D field,
    its spectrum and two ping-pong scratch volumes stay VMEM-resident for
    the entire fwd-DFT -> multiply -> inv-DFT pipeline (one kernel launch
    per packed pair instead of three, no intermediate HBM round trips and
    no XLA relayout copies between them).  SMALL volumes only: the
    in-kernel (Y,Z) <-> (Y*Z) reshapes materialize relayout temporaries on
    top of the 9 resident volumes (measured: 139.6M scheduled at 128^3 vs
    128M physical), so the gate caps the volume at 2 MB (64^3-class) and
    128^3 keeps the three-kernel pipeline."""
    if len(spatial) != 3:
        return False
    if dtype not in (jnp.float32, np.float32):
        return False
    X, Y, Z = spatial
    if Z % 64 or Y % 8 or X % 8:
        return False
    vol = X * Y * Z * 4
    if vol > 2 * 1024 * 1024:
        return False
    return _supported_backend()


def _whole_dft_kernel(X, Y, Z, re_ref, im_ref, mn_ref,
                      zfr_ref, zfi_ref, yfr_ref, yfi_ref, xfr_ref, xfi_ref,
                      zbr_ref, zbi_ref, ybr_ref, ybi_ref, xbr_ref, xbi_ref,
                      ore_ref, oim_ref, s1r, s1i, s2r, s2i):
    """fwd z/y/x DFT -> multiplier -> inv x/y/z, all VMEM-resident.

    The z contraction is one big matmul on the (X*Y, Z) LEADING-merge view
    (trailing merges like (X, Y, Z) -> (X, Y*Z) are unsupported Mosaic
    shape casts — measured "infer-vector-layout: unsupported shape cast");
    the y contraction loops x-planes with left-multiplications (dynamic
    leading index, same structure as _zy_dft_kernel); the x stage
    (fwd-DFT, multiplier, inv-DFT) loops y-planes STATICALLY with mid-axis
    ref slices, with the multiplier pre-transposed to (Y, X, Z) outside so
    its per-y slice is a leading index."""

    def ypass(src_r, src_i, mr, mi):
        def row(x, _):
            rr, ii = _cdot(src_r[x], src_i[x], mr, mi, left=True)
            s2r[x] = rr
            s2i[x] = ii
            return 0

        jax.lax.fori_loop(0, X, row, 0)

    # forward z on the (X*Y, Z) view of the input block
    r, i = _cdot(
        re_ref[0].reshape(X * Y, Z),
        im_ref[0].reshape(X * Y, Z),
        zfr_ref[...], zfi_ref[...],
    )
    s1r[...] = r.reshape(X, Y, Z)
    s1i[...] = i.reshape(X, Y, Z)

    # forward y per x-plane
    ypass(s1r, s1i, yfr_ref[...], yfi_ref[...])

    # forward x + multiplier + inverse x, one (X, Z) plane per y
    xfr, xfi = xfr_ref[...], xfi_ref[...]
    xbr, xbi = xbr_ref[...], xbi_ref[...]
    for y in range(Y):
        r, i = _cdot(s2r[:, y], s2i[:, y], xfr, xfi, left=True)
        M = mn_ref[y]
        r = r * M
        i = i * M
        r, i = _cdot(r, i, xbr, xbi, left=True)
        s1r[:, y] = r
        s1i[:, y] = i

    # inverse y per x-plane
    ypass(s1r, s1i, ybr_ref[...], ybi_ref[...])

    # inverse z
    r, i = _cdot(
        s2r[...].reshape(X * Y, Z), s2i[...].reshape(X * Y, Z),
        zbr_ref[...], zbi_ref[...],
    )
    ore_ref[0] = r.reshape(X, Y, Z)
    oim_ref[0] = i.reshape(X, Y, Z)


def fluid_flat_mxu_whole(x1, x2, Mn, fwd_mats, inv_mats):
    """Packed-pair fluid apply in ONE whole-volume kernel per pair (see
    :func:`mxu_whole_supported`); same math/precision as
    :func:`fluid_flat_mxu`."""
    F, X, Y, Z = x1.shape
    (fx, fy, fz), (bx, by, bz) = fwd_mats, inv_mats

    def fspec():
        return pl.BlockSpec((1, X, Y, Z), lambda f: (f, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def mat_spec(n):
        return pl.BlockSpec((n, n), lambda f: (0, 0),
                            memory_space=pltpu.VMEM)

    mats = (fz[0], fz[1], fy[0], fy[1], fx[0], fx[1],
            bz[0], bz[1], by[0], by[1], bx[0], bx[1])
    mat_sizes = (Z, Z, Y, Y, X, X, Z, Z, Y, Y, X, X)
    # multiplier pre-transposed so the kernel's per-y slice is a leading
    # index (see _whole_dft_kernel docstring)
    Mn_yxz = jnp.transpose(Mn, (1, 0, 2))
    re, im = pl.pallas_call(
        partial(_whole_dft_kernel, X, Y, Z),
        out_shape=(
            jax.ShapeDtypeStruct((F, X, Y, Z), x1.dtype),
            jax.ShapeDtypeStruct((F, X, Y, Z), x1.dtype),
        ),
        grid=(F,),
        in_specs=[fspec(), fspec(),
                  pl.BlockSpec((Y, X, Z), lambda f: (0, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [mat_spec(n) for n in mat_sizes],
        out_specs=(fspec(), fspec()),
        scratch_shapes=[
            pltpu.VMEM((X, Y, Z), jnp.float32),
            pltpu.VMEM((X, Y, Z), jnp.float32),
            pltpu.VMEM((X, Y, Z), jnp.float32),
            pltpu.VMEM((X, Y, Z), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(x1, x2, Mn_yxz, *mats)
    return re, im


def fluid_flat_mxu(x1, x2, Mn, fwd_mats, inv_mats):
    """Packed-pair scalar-multiplier fluid apply via MXU-DFT kernels.

    ``x1``/``x2``: (F, X, Y, Z) real fields; ``Mn``: (X, Y, Z) multiplier
    in NATURAL frequency order; ``fwd_mats``/``inv_mats``: per-axis
    (cos, sin) DFT matrix pairs for x, y, z (inverse includes 1/N)."""
    F, X, Y, Z = x1.shape
    (fx, fy, fz), (bx, by, bz) = fwd_mats, inv_mats
    re, im = _zy_dft_call(False, x1, x2, fz, fy)
    re = re.reshape(F, X, Y * Z)
    im = im.reshape(F, X, Y * Z)
    re, im = _x_mul_dft_call(re, im, Mn.reshape(X, Y * Z), fx, bx)
    re = re.reshape(F, X, Y, Z)
    im = im.reshape(F, X, Y, Z)
    re, im = _zy_dft_call(True, re, im, bz, by)
    return re, im
