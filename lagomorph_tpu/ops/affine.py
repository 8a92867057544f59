"""Affine interpolation and regridding ops.

TPU-native equivalents of the reference's ``affine`` CUDA kernels
(reference: lagomorph/extension/cuda/affine.cu).

``affine_interp`` samples an image through an affine map about the grid
center ``o = (N-1)/2``:

    out_n(x) = I_n( A_n (x - o) + T_n + o )     (affine.cu:42-52, 85-100)

``regrid`` resamples to a new grid given (shape, origin, spacing), with the
output-grid center at ``(N_out - 1)/2`` (affine.cu:612-681).

Both are built on the shared gather core in
:mod:`lagomorph_tpu.ops.sampling`; gradients come from autodiff: ``d_I`` is
the scatter splat, and ``d_A``/``d_T`` are the per-image reductions of
gradient-outer-products that the reference computes with shared-memory tree
reductions (affine.cu:276-327) — XLA emits native reduces instead.
"""
from __future__ import annotations

import jax.numpy as jnp

from .sampling import identity_grid, sample_linear


def affine_interp(I: jnp.ndarray, A: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Apply batched affine transforms to images.

    Args:
      I: ``(NI, C, *spatial)`` with ``NI in {1, N}`` (broadcast when 1 and
         the transform batch is larger — affine.cu:126).
      A: ``(N, dim, dim)`` matrices.
      T: ``(N, dim)`` translations.

    Returns:
      ``(N, C, *spatial)``.
    """
    if A.shape[0] != T.shape[0]:
        raise ValueError("A and T must have same first dimension")
    dim = A.shape[1]
    spatial = I.shape[2:]
    if len(spatial) != dim:
        raise ValueError("A/T dimension does not match image rank")
    dtype = I.dtype
    grid = identity_grid(spatial, dtype=dtype)  # (dim, *spatial)
    o = jnp.array([(n - 1) * 0.5 for n in spatial], dtype=dtype)
    centered = grid - o.reshape((dim,) + (1,) * dim)
    # h_a = sum_b A[a,b] * (x_b - o_b) + T_a + o_a
    coords = (
        jnp.einsum("nab,b...->na...", A.astype(dtype), centered)
        + (T.astype(dtype) + o).reshape(A.shape[0], dim, *([1] * dim))
    )
    return sample_linear(I, coords)


def regrid(
    I: jnp.ndarray,
    shape=None,
    origin=None,
    spacing=None,
    displacement: bool = False,
) -> jnp.ndarray:
    """Interpolate from one regular grid to another.

    The input grid has its origin at ``(N_in - 1)/2`` and unit spacing.  The
    output grid is determined by the optional arguments; scalars broadcast to
    every dimension.  Inference rules (matching lagomorph/affine.py:190-272):

      * ``(shape)``: origin ``(inshape-1)/2``, spacing
        ``(inshape-1)/(outshape-1)`` so corners map to corners;
      * ``(shape, origin)`` / ``(shape, origin, spacing)`` / ``(shape,
        spacing)``: explicit values (missing spacing -> 1, missing origin ->
        input center);
      * anything without shape raises (as the reference does / NotImplemented).

    If ``displacement``, values are additionally scaled by ``1/spacing`` per
    channel (valid only for ``C == dim``), matching RegridFunction
    (lagomorph/affine.py:151-188).
    """
    d = len(I.shape) - 2
    if shape is None:
        if origin is None and spacing is None:
            raise ValueError("At least one of shape, origin, or spacing required")
        raise NotImplementedError(
            "regrid without an explicit shape is not implemented (as in reference)"
        )
    if not isinstance(shape, (list, tuple)):
        shape = tuple([int(shape)] * d)
    shape = tuple(int(s) for s in shape)
    if origin is None:
        origin = tuple((s - 1) * 0.5 for s in I.shape[2:])
        if spacing is None:
            spacing = tuple(
                (sI - 1) / (s - 1) for sI, s in zip(I.shape[2:], shape)
            )
    if spacing is None:
        spacing = tuple([1.0] * d)
    if not isinstance(origin, (list, tuple)):
        origin = tuple([float(origin)] * d)
    if not isinstance(spacing, (list, tuple)):
        spacing = tuple([float(spacing)] * d)
    assert len(shape) == d and len(origin) == d and len(spacing) == d

    dtype = I.dtype
    N = I.shape[0]
    out_grid = identity_grid(shape, dtype=dtype)  # (d, *outshape)
    o_out = jnp.array([(n - 1) * 0.5 for n in shape], dtype=dtype)
    S = jnp.array(spacing, dtype=dtype)
    O = jnp.array(origin, dtype=dtype)
    rs = (d,) + (1,) * d
    coords = (out_grid - o_out.reshape(rs)) * S.reshape(rs) + O.reshape(rs)
    out = sample_linear(I, jnp.broadcast_to(coords[None], (N,) + coords.shape))
    if displacement:
        if I.shape[1] != d:
            raise ValueError("Incorrect num channels for regridding displacement")
        out = out * (1.0 / S).reshape((1, d) + (1,) * d)
    return out
