"""Finite-difference Jacobian operators.

TPU-native equivalents of the reference's ``diff`` CUDA kernels
(reference: lagomorph/extension/cuda/diff.cu): pointwise contraction of the
central-finite-difference Jacobian of one field with another field, with
CLAMP boundary handling, plus the adjoint of that operation in the
differentiated slot.

Everything is built from the static-slice stencils in
:mod:`lagomorph_tpu.ops.boundary`; XLA fuses the shifted slices and
multiply-adds into a single elementwise kernel on TPU.  Backward passes come
from autodiff and are exactly the reference's hand-written one-sided boundary
adjoint stencils (diff.cu:187-540), because ``diff_central_adjoint`` is the
exact matrix transpose of ``diff_central``.
"""
from __future__ import annotations

import jax.numpy as jnp

from .boundary import diff_central, diff_central_adjoint


def _check_spatial(v):
    for n in v.shape[2:]:
        if n < 2:
            raise ValueError(
                "Jacobian times vectorfield not implemented for 'thin' dimensions"
            )


def jacobian_times_vectorfield(
    v: jnp.ndarray,
    w: jnp.ndarray,
    displacement: bool = True,
    transpose: bool = False,
) -> jnp.ndarray:
    """Compute ``(Dv) w`` pointwise (or ``(Dv)^T w`` if ``transpose``).

    ``v``: ``(N, C, *spatial)`` field to differentiate (``C == dim`` required
    for ``displacement`` or ``transpose`` modes).
    ``w``: ``(N, dim, *spatial)`` vector field to contract with.

    If ``displacement`` the identity is added to the Jacobian diagonal, i.e.
    ``v`` is treated as the displacement of a deformation.

    Reference: diff.cu:17-127 (forward kernels); python wrapper
    lagomorph/diff.py:38-39.
    """
    _check_spatial(v)
    dim = w.shape[1]
    nc = v.shape[1]
    if w.shape[2:] != v.shape[2:]:
        raise ValueError("v and w must share spatial shape")
    if (displacement or transpose) and nc != dim:
        raise ValueError("displacement/transpose modes require v to be a vector field")

    # J[c][a] = D_a v_c (+ delta_{ca} if displacement)
    if transpose:
        # out_a = sum_c J[c][a] * w_c
        outs = []
        for a in range(dim):
            acc = None
            for c in range(dim):
                g = diff_central(v[:, c], axis=1 + a)
                if displacement and a == c:
                    term = (g + 1.0) * w[:, c]
                else:
                    term = g * w[:, c]
                acc = term if acc is None else acc + term
            outs.append(acc)
        return jnp.stack(outs, axis=1)
    else:
        # out_c = sum_a J[c][a] * w_a
        outs = []
        for c in range(nc):
            acc = None
            for a in range(dim):
                g = diff_central(v[:, c], axis=1 + a)
                if displacement and a == c:
                    term = (g + 1.0) * w[:, a]
                else:
                    term = g * w[:, a]
                acc = term if acc is None else acc + term
            outs.append(acc)
        return jnp.stack(outs, axis=1)


def jacobian_times_vectorfield_adjoint(z: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Adjoint ``T(w)^dagger z`` of the linear map ``T(w): v -> (Dv) w`` in
    the ``v`` slot: ``<(Dv)w, z> == <v, T(w)^dagger z>`` exactly, in the
    discrete inner product.

    ``out_c = sum_a D_a^T (w_a * z_c)`` where ``D_a^T`` is the exact
    transpose of the clamped central difference (one-sided at boundaries).

    Reference: diff.cu:542-672 (``jacobian_times_vectorfield_adjoint_forward``);
    python wrapper lagomorph/diff.py:42-61.
    """
    _check_spatial(z)
    dim = w.shape[1]
    nc = z.shape[1]
    outs = []
    for c in range(nc):
        acc = None
        for a in range(dim):
            p = w[:, a] * z[:, c]
            term = diff_central_adjoint(p, axis=1 + a)
            acc = term if acc is None else acc + term
        outs.append(acc)
    return jnp.stack(outs, axis=1)
