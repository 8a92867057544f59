r"""Adjoint representation of :math:`\mathrm{Diff}(\mathbb{R}^3)`.

API mirror of the reference's lagomorph/adjrep.py (see Jacob Hinkle's PhD
thesis, Appendices A and B, for derivations).  All operators are pure
compositions of the TPU-native grid ops and are fully jittable/vmappable.
"""
from __future__ import annotations

from .deform import interp, interp_auto, splat
from .ops.diff import (
    jacobian_times_vectorfield,
    jacobian_times_vectorfield_adjoint,
)

__all__ = [
    "ad",
    "Ad",
    "ad_star",
    "Ad_star",
    "ad_dagger",
    "Ad_dagger",
    "sym",
    "sym_dagger",
]


def ad(v, w):
    r"""Adjoint action :math:`\mathrm{ad}(v,w) = -[v,w] = Dv\,w - Dw\,v`
    (reference adjrep.py:37-47)."""
    return jacobian_times_vectorfield(
        v, w, displacement=False
    ) - jacobian_times_vectorfield(w, v, displacement=False)


def Ad(phi, v):
    r"""Big adjoint action :math:`\mathrm{Ad}(\varphi,v) = (D\varphi \circ
    \varphi^{-1})\, v \circ \varphi^{-1}`, computed from the *inverse*
    displacement ``phi`` (i.e. ``phi`` is :math:`\varphi^{-1}` as a
    displacement field): multiply ``v`` by :math:`(D\varphi^{-1})^T` then
    splat the components.

    The reference leaves this NotImplemented (adjrep.py:50-66) but sketches
    exactly this algorithm; it is provided here since the splat op is public.
    """
    DphiTv = jacobian_times_vectorfield(phi, v, displacement=True, transpose=True)
    return splat(DphiTv, phi)


def ad_star(v, m):
    r"""Coadjoint action :math:`\mathrm{ad}^*(v, m) = (Dv)^T m + Dm\,v + m\,
    \mathrm{div}\,v` — the numerical adjoint of :math:`\mathrm{ad}(v,\cdot)`
    in the central-difference discretization (reference adjrep.py:69-83)."""
    return jacobian_times_vectorfield(
        v, m, displacement=False, transpose=True
    ) - jacobian_times_vectorfield_adjoint(m, v)


def Ad_star(phiinv, m, mode=None):
    r"""Big coadjoint action :math:`\mathrm{Ad}^*(\varphi, m)(x) =
    (D\varphi(x))\, m(\varphi(x))` with :math:`\varphi` given by the
    displacement ``phiinv`` (reference adjrep.py:86-97).

    ``mode`` statically forces the warp tier (the transport displacement is
    ``phiinv``, bounded by the total integration time in voxels).

    On TPU with 3D f32 fields, the unit-displacement regime runs the fused
    Pallas kernel (one VMEM pass for warp + Jacobian contraction) — selected
    statically for ``mode="unit"``, by runtime bound check under auto."""
    from .ops.interp import get_warp_mode
    from .ops.pallas import epdiff_unit as _eu
    from .ops.pallas import epdiff2d as _e2

    # honor the global set_warp_mode() escape hatch: under a forced
    # general/bounded mode the fused/cond dispatch must not run (debug/parity)
    effective = mode if mode is not None else get_warp_mode()
    fused = None
    if effective in ("auto", "unit"):
        if _eu.ad_star_supported(phiinv.shape, m.shape, phiinv.dtype):
            fused = _eu.ad_star_unit_pallas
        elif _e2.supported(phiinv.shape, m.shape, phiinv.dtype):
            fused = _e2.ad_star2d_pallas
    if fused is not None:
        if effective == "unit":
            return fused(phiinv, m)
        import jax
        import jax.numpy as jnp

        def fallback(p, mm):
            mphiinv = interp_auto(mm, p)
            return jacobian_times_vectorfield(p, mphiinv, displacement=True)

        unit = jnp.logical_and(jnp.all(phiinv >= -1.0), jnp.all(phiinv < 1.0))
        # remat the untaken branch's residuals (see CLAUDE.md cond note);
        # the fused op has a custom_vjp so it stores only its inputs
        return jax.lax.cond(
            unit,
            fused,
            jax.checkpoint(fallback),
            phiinv,
            m,
        )
    mphiinv = interp_auto(m, phiinv, mode=mode)
    return jacobian_times_vectorfield(phiinv, mphiinv, displacement=True)


def ad_dagger(x, y, metric):
    r""":math:`\mathrm{ad}^\dagger(x, y) = \mathrm{ad}^*(x, y^\flat)^\sharp`
    (reference adjrep.py:104-113)."""
    return metric.sharp(ad_star(x, metric.flat(y)))


def Ad_dagger(phi, y, metric):
    r""":math:`\mathrm{Ad}^\dagger(\varphi, y) = \mathrm{Ad}^*(\varphi,
    y^\flat)^\sharp` (reference adjrep.py:116-122)."""
    return metric.sharp(Ad_star(phi, metric.flat(y)))


def sym(x, y, metric):
    r"""Negative symmetrized :math:`\mathrm{ad}^\dagger`, used for reduced
    Jacobi fields (reference adjrep.py:125-135):

    .. math:: \mathrm{sym}(x, y) = -(\mathrm{ad}^\dagger(x, y) +
              \mathrm{ad}^\dagger(y, x))
    """
    return -(ad_dagger(x, y, metric) + ad_dagger(y, x, metric))


def sym_dagger(x, y, metric):
    r""":math:`\mathrm{sym}^\dagger(x, y) = \mathrm{ad}^\dagger(y, x) -
    \mathrm{ad}(x, y)` (reference adjrep.py:138-145)."""
    return ad_dagger(y, x, metric) - ad(x, y)
