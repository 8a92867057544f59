"""Multilinear sampling (gather) and splatting (scatter-add) on regular grids.

This is the TPU-native replacement for the reference's CUDA interpolation
header library (reference: lagomorph/extension/include/interp.h — ``biLerp``,
``triLerp``, ``biLerp_grad``, ``atomicSplat``).  Instead of per-thread loops
with atomic adds, sampling is expressed as 2**dim dense gathers with
multilinear weights and splatting as 2**dim dense scatter-adds; XLA lowers
these to efficient dynamic-gather / scatter ops on TPU and the surrounding
arithmetic fuses.

Semantics reproduced exactly (CLAMP boundary, the default of the reference,
extension/include/defs.h:13):

  * corner index = floor(x) and floor(x)+1 (true floor, incl. negatives —
    interp.h:14-22 casts to int then decrements for negative non-integers);
  * interpolation weights computed from the *unclamped* coordinate;
  * corner indices clamped to [0, N-1] before lookup (so out-of-domain
    samples replicate the edge, and the derivative w.r.t. the coordinate
    vanishes there because both corners coincide);
  * splat is the exact linear transpose: the same weights scatter-added at
    the same clamped corners (interp.h:330-454).

Because the forward discretization matches the reference exactly, JAX
autodiff of :func:`sample_linear` yields *exactly* the reference's
hand-written adjoints: the image gradient is the atomic splat
(interp.cu:162-178) and the coordinate gradient is the analytic lerp
gradient (interp.h:127-327).
"""
from __future__ import annotations

import itertools
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


BACKGROUND_STRATEGIES = ("clamp", "wrap", "zero", "val")


def _sample_one(I: jnp.ndarray, coords: jnp.ndarray, background: str = "clamp",
                background_value: float = 0.0) -> jnp.ndarray:
    """Sample one multi-channel image at fractional voxel coordinates.

    Args:
      I: ``(C, *spatial)`` image.
      coords: ``(dim, *out_spatial)`` voxel coordinates (fractional, may lie
        outside the domain).
      background: boundary strategy — the full set of the reference's
        extrapolation header (extension/include/extrap.h:40-57):
        ``"clamp"`` (replicate edge, the reference Python API's default),
        ``"wrap"`` (periodic), ``"zero"`` / ``"val"`` (out-of-range stencil
        corners contribute ``background_value``; 0 for "zero").

    Returns:
      ``(C, *out_spatial)`` sampled values.
    """
    if background not in BACKGROUND_STRATEGIES:
        raise ValueError(f"unknown background strategy {background!r}")
    dim = coords.shape[0]
    spatial = I.shape[1:]
    if len(spatial) != dim:
        raise ValueError(f"coords dim {dim} does not match image rank {len(spatial)}")
    out_spatial = coords.shape[1:]
    C = I.shape[0]

    floor = jnp.floor(coords)
    frac = coords - floor  # weights from unclamped coordinates
    floor = floor.astype(jnp.int32)
    bg = 0.0 if background == "zero" else background_value

    # strides for linearized spatial index
    strides = []
    s = 1
    for n in reversed(spatial):
        strides.append(s)
        s *= n
    strides = strides[::-1]
    nvox = s

    Iflat = I.reshape(C, nvox)
    out = jnp.zeros((C,) + out_spatial, dtype=I.dtype)
    for corner in itertools.product((0, 1), repeat=dim):
        lin = jnp.zeros(out_spatial, dtype=jnp.int32)
        w = None
        valid = None
        for d in range(dim):
            raw = floor[d] + corner[d]
            if background == "wrap":
                idx = jnp.mod(raw, spatial[d])
            else:
                idx = jnp.clip(raw, 0, spatial[d] - 1)
            if background in ("zero", "val"):
                vd = jnp.logical_and(raw >= 0, raw < spatial[d])
                valid = vd if valid is None else jnp.logical_and(valid, vd)
            lin = lin + idx * strides[d]
            wd = frac[d] if corner[d] else 1.0 - frac[d]
            w = wd if w is None else w * wd
        vals = jnp.take(Iflat, lin.reshape(-1), axis=1).reshape((C,) + out_spatial)
        if valid is not None:
            vals = jnp.where(valid[None], vals, jnp.asarray(bg, dtype=I.dtype))
        out = out + w[None] * vals
    return out


def _splat_one(values: jnp.ndarray, coords: jnp.ndarray, spatial: tuple) -> jnp.ndarray:
    """Linear transpose of :func:`_sample_one`: scatter-add ``values`` at
    fractional coordinates into a zero grid of shape ``(C, *spatial)``.

    Matches ``atomicSplat`` with CLAMP (interp.h:403-454): out-of-range
    corners are clamped (their mass accumulates at the edge).
    """
    dim = coords.shape[0]
    C = values.shape[0]
    out_spatial = coords.shape[1:]

    floor = jnp.floor(coords)
    frac = coords - floor
    floor = floor.astype(jnp.int32)

    strides = []
    s = 1
    for n in reversed(spatial):
        strides.append(s)
        s *= n
    strides = strides[::-1]
    nvox = s

    out = jnp.zeros((C, nvox), dtype=values.dtype)
    for corner in itertools.product((0, 1), repeat=dim):
        lin = jnp.zeros(out_spatial, dtype=jnp.int32)
        w = None
        for d in range(dim):
            idx = jnp.clip(floor[d] + corner[d], 0, spatial[d] - 1)
            lin = lin + idx * strides[d]
            wd = frac[d] if corner[d] else 1.0 - frac[d]
            w = wd if w is None else w * wd
        out = out.at[:, lin.reshape(-1)].add((w[None] * values).reshape(C, -1))
    return out.reshape((C,) + tuple(spatial))


def sample_linear(I: jnp.ndarray, coords: jnp.ndarray, background: str = "clamp",
                  background_value: float = 0.0) -> jnp.ndarray:
    """Batched multilinear sampling with image-batch broadcasting.

    Args:
      I: ``(NI, C, *spatial)`` images; ``NI`` may be 1 to broadcast over the
        coordinate batch (reference: interp.cu:90-92, affine.cu:126).
      coords: ``(N, dim, *out_spatial)`` voxel coordinates.
      background: boundary strategy (``"clamp"``/``"wrap"``/``"zero"``/
        ``"val"``, see :func:`_sample_one`); ``"clamp"`` is the reference
        default (extension/include/defs.h:13) and the only strategy its
        Python API reaches.

    Returns:
      ``(N, C, *out_spatial)``.
    """
    N = coords.shape[0]
    f = partial(_sample_one, background=background,
                background_value=background_value)
    if I.shape[0] == N:
        return jax.vmap(f)(I, coords)
    elif I.shape[0] == 1:
        return jax.vmap(f, in_axes=(None, 0))(I[0], coords)
    else:
        raise ValueError(f"Incompatible batch sizes I={I.shape[0]}, coords={N}")


def splat_linear(values: jnp.ndarray, coords: jnp.ndarray, spatial: tuple) -> jnp.ndarray:
    """Batched splat: ``(N, C, *out_spatial)`` values scattered at ``(N, dim,
    *out_spatial)`` coordinates into ``(N, C, *spatial)``."""
    return jax.vmap(partial(_splat_one, spatial=tuple(spatial)))(values, coords)


def sample_displacement_unit(I: jnp.ndarray, disp: jnp.ndarray) -> jnp.ndarray:
    """Fast exact sampling ``out(x) = I(x + disp(x))`` for |disp| <= 1.

    When every displacement component lies in [-1, 1), the corner voxels of
    the multilinear stencil are confined to x + {-1, 0, 1}^dim, so the
    gather becomes a weighted sum of 3^dim clamped shifts — dense fused
    reads on TPU instead of an arbitrary-index gather, and its autodiff
    transpose is dense shift-adds instead of a scatter.  Bit-identical to
    :func:`sample_linear` with ``coords = identity + disp`` in that regime
    (same floor/clamp/weight rules).

    I: ``(NI, C, *spatial)`` (``NI in {1, N}``); disp: ``(N, dim, *spatial)``.
    """
    dim = disp.shape[1]
    spatial = disp.shape[2:]
    N = disp.shape[0]
    if I.shape[0] not in (1, N):
        raise ValueError("Incompatible batch sizes")
    Ib = jnp.broadcast_to(I, (N,) + I.shape[1:]) if I.shape[0] == 1 and N > 1 else I

    f = jnp.floor(disp)
    t = disp - f
    is_m1 = (f == -1).astype(I.dtype)
    is_0 = (f == 0).astype(I.dtype)
    # per-axis weights for shifts -1, 0, +1 (elementwise at the output point)
    w = {
        -1: is_m1 * (1.0 - t),
        0: is_m1 * t + is_0 * (1.0 - t),
        1: is_0 * t,
    }
    # one edge-padded buffer; the 27 taps are static slices of it, which XLA
    # fuses into the multiply-add chain (a single materialized intermediate
    # instead of 3^dim shifted copies)
    widths = [(0, 0), (0, 0)] + [(1, 1)] * dim
    Ipad = jnp.pad(Ib, widths, mode="edge")
    out = None
    for offsets in itertools.product((-1, 0, 1), repeat=dim):
        wprod = None
        for d, o in enumerate(offsets):
            wd = w[o][:, d]
            wprod = wd if wprod is None else wprod * wd
        idx = (slice(None), slice(None)) + tuple(
            slice(1 + o, 1 + o + n) for o, n in zip(offsets, spatial)
        )
        term = wprod[:, None] * Ipad[idx]
        out = term if out is None else out + term
    return out


def _offset_weight(f, t, o):
    """Per-axis shift weight: offset ``o`` receives (1-t) when floor==o and
    t when floor==o-1 (the two stencil corners that land on o)."""
    dt_ = t.dtype
    return (f == o).astype(dt_) * (1.0 - t) + (f == (o - 1)).astype(dt_) * t


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def sample_displacement_bounded(I: jnp.ndarray, disp: jnp.ndarray, radius: int):
    """Exact sampling ``out(x) = I(x + disp(x))`` for |disp| <= radius.

    Sweeps integer offsets o in [-radius, radius+1]^dim with a ``lax.scan``:
    each step is one dynamic-slice of an edge-padded volume times an
    elementwise mask-weight — dense reads instead of an arbitrary gather,
    and (via the custom VJP below) dense writes instead of a scatter in the
    backward pass.  Identical to :func:`sample_linear` (CLAMP semantics)
    whenever every displacement component lies in [-radius, radius+1);
    out-of-range points contribute zero (callers gate on the bound with a
    ``lax.cond`` and fall back to the general gather).

    I: ``(N or 1, C, *spatial)``; disp: ``(N, dim, *spatial)``.
    """
    out, _ = _sdb_fwd(I, disp, radius)
    return out


def _sdb_pad(I, dim, radius):
    widths = [(0, 0), (0, 0)] + [(radius, radius + 1)] * dim
    return jnp.pad(I, widths, mode="edge")


def _sdb_fwd(I, disp, radius):
    dim = disp.shape[1]
    spatial = disp.shape[2:]
    N = disp.shape[0]
    Ib = jnp.broadcast_to(I, (N,) + I.shape[1:]) if I.shape[0] == 1 and N > 1 else I
    Ipad = _sdb_pad(Ib, dim, radius)
    f = jnp.floor(disp).astype(jnp.int32)
    t = disp - jnp.floor(disp)

    # scan only over the leading-axis offset (2R+2 sequential steps); the
    # remaining (2R+2)^(dim-1) taps per step are unrolled static slices that
    # XLA fuses like the tier-1 stencil
    o0s = jnp.arange(-radius, radius + 2, dtype=jnp.int32)
    inner = list(itertools.product(range(-radius, radius + 2), repeat=dim - 1))
    sizes = Ipad.shape[:2] + (spatial[0],) + tuple(Ipad.shape[3:])

    def body(acc, o0):
        starts = (jnp.int32(0), jnp.int32(0), (o0 + radius).astype(jnp.int32)) + (
            jnp.int32(0),
        ) * (dim - 1)
        sl0 = jax.lax.dynamic_slice(Ipad, starts, sizes)  # leading axis shifted
        w0 = _offset_weight(f[:, 0], t[:, 0], o0)
        term0 = None
        for oin in inner:
            w = w0
            for d, o in enumerate(oin):
                w = w * _offset_weight(f[:, d + 1], t[:, d + 1], o)
            idx = (slice(None), slice(None), slice(None)) + tuple(
                slice(radius + o, radius + o + n)
                for o, n in zip(oin, spatial[1:])
            )
            contrib = w[:, None] * sl0[idx]
            term0 = contrib if term0 is None else term0 + contrib
        return acc + term0, None

    acc0 = jnp.zeros((N,) + Ib.shape[1:2] + tuple(spatial), dtype=I.dtype)
    out, _ = jax.lax.scan(body, acc0, o0s)
    return out, (I, disp)


def _sdb_bwd(radius, res, g):
    I, disp = res
    dim = disp.shape[1]
    spatial = disp.shape[2:]
    N = disp.shape[0]
    broadcasting = I.shape[0] == 1 and N > 1
    Ib = jnp.broadcast_to(I, (N,) + I.shape[1:]) if broadcasting else I
    Ipad = _sdb_pad(Ib, dim, radius)
    f = jnp.floor(disp).astype(jnp.int32)
    t = disp - jnp.floor(disp)
    o0s = jnp.arange(-radius, radius + 2, dtype=jnp.int32)
    inner = list(itertools.product(range(-radius, radius + 2), repeat=dim - 1))
    sizes = Ipad.shape[:2] + (spatial[0],) + tuple(Ipad.shape[3:])

    def dw(d, o):
        return (f[:, d] == (o - 1)).astype(t.dtype) - (f[:, d] == o).astype(t.dtype)

    def body(carry, o0):
        d_Ipad, d_t = carry
        starts = (jnp.int32(0), jnp.int32(0), (o0 + radius).astype(jnp.int32)) + (
            jnp.int32(0),
        ) * (dim - 1)
        sl0 = jax.lax.dynamic_slice(Ipad, starts, sizes)
        w0 = _offset_weight(f[:, 0], t[:, 0], o0)
        dw0 = dw(0, o0)
        d_sl0 = jnp.zeros(sizes, dtype=g.dtype)
        d_t_new = [d_t[:, d] for d in range(dim)]
        for oin in inner:
            ws_in = [_offset_weight(f[:, d + 1], t[:, d + 1], o) for d, o in enumerate(oin)]
            w_in = None
            for wd in ws_in:
                w_in = wd if w_in is None else w_in * wd
            w = w0 if w_in is None else w0 * w_in
            idx = (slice(None), slice(None), slice(None)) + tuple(
                slice(radius + o, radius + o + n)
                for o, n in zip(oin, spatial[1:])
            )
            # transpose of the weighted inner slice
            d_sl0 = d_sl0.at[idx].add(w[:, None] * g)
            gsl = jnp.sum(g * sl0[idx], axis=1)  # (N, *spatial)
            # gradient w.r.t. each axis fraction
            d_t_new[0] = d_t_new[0] + (dw0 if w_in is None else dw0 * w_in) * gsl
            for d, o in enumerate(oin):
                others = w0
                for e, we in enumerate(ws_in):
                    if e != d:
                        others = others * we
                d_t_new[d + 1] = d_t_new[d + 1] + dw(d + 1, o) * others * gsl
        upd = jax.lax.dynamic_slice(d_Ipad, starts, sizes) + d_sl0
        d_Ipad = jax.lax.dynamic_update_slice(d_Ipad, upd, starts)
        return (d_Ipad, jnp.stack(d_t_new, axis=1)), None

    d_Ipad0 = jnp.zeros_like(Ipad)
    d_t0 = jnp.zeros_like(disp)
    (d_Ipad, d_disp), _ = jax.lax.scan(body, (d_Ipad0, d_t0), o0s)

    # transpose of the edge-pad: fold pad strips back onto the edges
    _, pad_vjp = jax.vjp(lambda x: _sdb_pad(x, dim, radius), Ib)
    d_Ib = pad_vjp(d_Ipad)[0]
    if broadcasting:
        d_I = jnp.sum(d_Ib, axis=0, keepdims=True)
    else:
        d_I = d_Ib
    return d_I, d_disp


sample_displacement_bounded.defvjp(
    lambda I, disp, radius: _sdb_fwd(I, disp, radius),
    _sdb_bwd,
)


def identity_grid(spatial: tuple, dtype=jnp.float32) -> jnp.ndarray:
    """``(dim, *spatial)`` identity coordinate grid (voxel units).

    Uses ``broadcasted_iota`` so that under jit the grid is generated by the
    program (cheap iota ops) rather than baked in as a large constant."""
    dim = len(spatial)
    spatial = tuple(spatial)
    grids = [
        jax.lax.broadcasted_iota(jnp.dtype(dtype), spatial, d) for d in range(dim)
    ]
    return jnp.stack(grids, axis=0)
