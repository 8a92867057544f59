"""Pairwise image registration: affine, rigid, and LDDMM geodesic shooting.

Each routine is a jitted gradient-descent optimizer whose iteration body is
compiled once (``lax.scan`` over optimization steps — no per-step dispatch),
matching the loss structure of the reference's atlas loops
(reference affine.py:370-382, lddmm.py:300-325) specialized to one moving /
one fixed image batch.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.affine import affine_interp
from ..affine import rotation_exp_map
from ..deform import interp
from ..lddmm import expmap

__all__ = ["affine_register", "rigid_register", "lddmm_register"]


def _mse(a, b):
    return jnp.sum((a - b) ** 2) / b.size


@partial(jax.jit, static_argnames=("num_iters",))
def _affine_opt(I, J, A0, T0, lrA, lrT, num_iters):
    dim = T0.shape[1]
    eye = jnp.eye(dim, dtype=I.dtype)

    def loss_fn(A, T):
        Idef = affine_interp(I, A + eye, T)
        return _mse(Idef, J)

    def body(carry, _):
        A, T = carry
        loss, (gA, gT) = jax.value_and_grad(loss_fn, argnums=(0, 1))(A, T)
        return (A - lrA * gA, T - lrT * gT), loss

    (A, T), losses = jax.lax.scan(body, (A0, T0), None, length=num_iters)
    return A, T, losses


def affine_register(
    source,
    target,
    num_iters=200,
    learning_rate_A=1e-4,
    learning_rate_T=1e-2,
    A0=None,
    T0=None,
):
    """Register ``source`` to ``target`` with a batched affine transform.

    Args:
      source: ``(1 or N, C, *spatial)`` moving image.
      target: ``(N, C, *spatial)`` fixed image(s).

    Returns ``(A, T, losses)`` where the effective matrix is ``A + I``
    (parametrization as in reference affine.py:370).
    """
    N = target.shape[0]
    dim = len(target.shape) - 2
    if A0 is None:
        A0 = jnp.zeros((N, dim, dim), dtype=target.dtype)
    if T0 is None:
        T0 = jnp.zeros((N, dim), dtype=target.dtype)
    return _affine_opt(
        source, target, A0, T0, learning_rate_A, learning_rate_T, num_iters
    )


@partial(jax.jit, static_argnames=("num_iters",))
def _rigid_opt(I, J, v0, T0, lrv, lrT, num_iters):
    def loss_fn(v, T):
        R = rotation_exp_map(v)
        Idef = affine_interp(I, R, T)
        return _mse(Idef, J)

    def body(carry, _):
        v, T = carry
        loss, (gv, gT) = jax.value_and_grad(loss_fn, argnums=(0, 1))(v, T)
        return (v - lrv * gv, T - lrT * gT), loss

    (v, T), losses = jax.lax.scan(body, (v0, T0), None, length=num_iters)
    return v, T, losses


def rigid_register(
    source,
    target,
    num_iters=200,
    learning_rate_v=1e-3,
    learning_rate_T=1e-2,
    v0=None,
    T0=None,
):
    """Rigid registration by unconstrained optimization of rotation tangent
    vectors through :func:`rotation_exp_map` (the use-case described at
    reference affine.py:120-129; the reference's exp map is 2D-only, the 3D
    case here uses the Rodrigues map of affine.py:105-121).

    2D: ``v`` is a batch of angles ``(N,)``; 3D: axis-angle ``(N, 3)``.
    Returns ``(v, T, losses)``.
    """
    N = target.shape[0]
    dim = len(target.shape) - 2
    if dim not in (2, 3):
        raise NotImplementedError("rigid_register supports 2D and 3D")
    if v0 is None:
        v0 = jnp.zeros((N,) if dim == 2 else (N, 3), dtype=target.dtype)
    if T0 is None:
        T0 = jnp.zeros((N, dim), dtype=target.dtype)
    return _rigid_opt(source, target, v0, T0, learning_rate_v, learning_rate_T, num_iters)


def lddmm_register(
    source,
    target,
    metric,
    num_iters=100,
    learning_rate=1e-2,
    reg_weight=1e-1,
    integration_steps=5,
    m0=None,
    momentum_preconditioning=False,
    checkpoints=False,
    transport_mode=None,
    compose_mode=None,
):
    """Pairwise LDDMM registration by geodesic shooting from ``source`` to
    ``target`` (BASELINE.json config 3).

    ``transport_mode``/``compose_mode``: static warp-tier overrides threaded
    into the shooting scan (see :func:`lagomorph_tpu.lddmm.expmap`); passing
    ``compose_mode="unit"`` (always valid for stable steps) and
    ``transport_mode="bounded"`` (valid when total deformation < 3 voxels)
    compiles the optimization scan without the runtime 3-tier cond.

    Returns ``(m, phiinv, losses)``: optimized initial momenta, final
    inverse deformation, and per-iteration losses.
    """
    N = target.shape[0]
    dim = len(target.shape) - 2
    if m0 is None:
        m0 = jnp.zeros((N, dim) + tuple(target.shape[2:]), dtype=target.dtype)

    def loss_fn(m):
        v = metric.sharp(m)  # shared with the peeled first integration step
        h = expmap(
            metric, m, num_steps=integration_steps, checkpoints=checkpoints,
            transport_mode=transport_mode, compose_mode=compose_mode, v0=v,
        )
        Idef = interp(source, h)
        reg = reg_weight * jnp.sum(v * m) / target.size
        return _mse(Idef, target) + reg

    @partial(jax.jit, static_argnames=("num_iters",))
    def opt(m, num_iters):
        def body(m, _):
            loss, g = jax.value_and_grad(loss_fn)(m)
            if momentum_preconditioning:
                g = metric.flat(g)
            return m - learning_rate * g, loss

        return jax.lax.scan(body, m, None, length=num_iters)

    m, losses = opt(m0, num_iters)
    phiinv = expmap(
        metric, m, num_steps=integration_steps,
        transport_mode=transport_mode, compose_mode=compose_mode,
    )
    return m, phiinv, losses
