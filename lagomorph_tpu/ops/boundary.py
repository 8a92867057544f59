"""Boundary-aware shift and finite-difference primitives.

These implement the exact discretizations used by the reference CUDA stencil
library (reference: lagomorph/extension/include/diff.h:7-76 and
extrap.h:40-57): central finite differences with CLAMP (replicate-edge)
boundary handling, plus the exact numerical adjoint of that operator.

All functions operate on a single named axis of an arbitrary-rank array and
use only static slicing / concatenation, which XLA fuses into cheap
pad/slice fusions on TPU (no gathers).
"""
from __future__ import annotations

import jax.numpy as jnp


def shift_clamp(a: jnp.ndarray, axis: int, offset: int) -> jnp.ndarray:
    """Return ``a`` sampled at ``i + offset`` along ``axis`` with clamped
    (replicate-edge) out-of-range indices.

    Matches ``get_value_safe<...,BACKGROUND_STRATEGY_CLAMP>`` of the
    reference (extension/include/extrap.h:121-125) for |offset| == 1.
    """
    if offset == 0:
        return a
    n = a.shape[axis]
    if n < 2:
        raise ValueError("shift_clamp requires size >= 2 along axis")

    def sl(start, stop):
        idx = [slice(None)] * a.ndim
        idx[axis] = slice(start, stop)
        return a[tuple(idx)]

    if offset == 1:
        # a[1], a[2], ..., a[n-1], a[n-1]
        return jnp.concatenate([sl(1, None), sl(n - 1, None)], axis=axis)
    elif offset == -1:
        # a[0], a[0], a[1], ..., a[n-2]
        return jnp.concatenate([sl(0, 1), sl(0, n - 1)], axis=axis)
    else:
        raise ValueError("only |offset| <= 1 supported")


def diff_central(a: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Clamped central difference along ``axis``.

    ``0.5 * (a[clamp(i+1)] - a[clamp(i-1)])`` — the reference's
    ``diff_x/y/z`` (extension/include/diff.h:10-52). At the boundary this
    degenerates to a one-sided half-difference because of clamping.
    """
    n = a.shape[axis]
    if n < 2:
        raise ValueError("diff_central requires size >= 2 along axis")

    def sl(start, stop):
        idx = [slice(None)] * a.ndim
        idx[axis] = slice(start, stop)
        return a[tuple(idx)]

    first = 0.5 * (sl(1, 2) - sl(0, 1))
    mid = 0.5 * (sl(2, None) - sl(0, n - 2))
    last = 0.5 * (sl(n - 1, None) - sl(n - 2, n - 1))
    return jnp.concatenate([first, mid, last], axis=axis)


def diff_central_adjoint(p: jnp.ndarray, axis: int) -> jnp.ndarray:
    """The exact matrix transpose of :func:`diff_central` along ``axis``.

    Rows (derivation from the clamped central-difference matrix D):
      * ``i == 0``:    ``-0.5 * (p[0] + p[1])``
      * interior:      ``0.5 * (p[i-1] - p[i+1])``
      * ``i == n-1``:  ``0.5 * (p[n-1] + p[n-2])``

    These are precisely the one-sided boundary stencils hand-written in the
    reference backward kernels (extension/cuda/diff.cu:560-624 — the
    ``jacobian_times_vectorfield_adjoint_forward`` kernel).
    """
    n = p.shape[axis]
    if n < 2:
        raise ValueError("diff_central_adjoint requires size >= 2 along axis")

    def sl(start, stop):
        idx = [slice(None)] * p.ndim
        idx[axis] = slice(start, stop)
        return p[tuple(idx)]

    first = -0.5 * (sl(0, 1) + sl(1, 2))
    mid = 0.5 * (sl(0, n - 2) - sl(2, None))
    last = 0.5 * (sl(n - 1, None) + sl(n - 2, n - 1))
    return jnp.concatenate([first, mid, last], axis=axis)
