"""Communication-efficient spatially-sharded EPDiff shooting (shard_map).

GSPMD partitions the XLA 27-tap warp of an X-sharded field with one
collective-permute per shifted slice — 62 permutes moving ~the whole field
where a single 1-voxel halo exchange suffices (docs/spatial_sharding.md,
scripts/sp_study.py).  This module is the designed fix: an explicit
``shard_map`` formulation of the whole shooting integration where

* every stencil/warp op runs SHARD-LOCAL on a slab with a 1-voxel X halo,
  exchanged once per substep with two ``ppermute``s (~V/X bytes each);
* global CLAMP boundary semantics are preserved exactly: the halo of the
  first/last shard is its own edge row (what clamping reads), and interior
  halos are the true neighbor rows — so each local op is bit-identical to
  the corresponding rows of the dense op;
* the fluid solve reuses the transpose-decomposed distributed rFFT
  (:mod:`lagomorph_tpu.parallel.sharded_fft`, 2 all-to-alls of ~V/P bytes
  per device);
* the initial-momentum halo is invariant and hoisted out of the scan.

Per EPDiff substep this moves 2 ppermutes + 2 all-to-alls (~25 collectives
per 5-step shooting incl. the hoisted m0 halo) instead of GSPMD's ~171, with
per-chip traffic ~V/P.  Peak per-chip memory stays O(V/P) throughout.

Correctness: each local op computes exactly the dense op's rows (halo rows
carry the true neighbor/clamp values; outputs at slab-edge rows whose own
taps would need a 2-deep halo are computed but discarded), so the sharded
shooting equals dense shooting to f32 roundoff of the distributed FFT —
validated against dense expmap in tests/test_parallel.py.

No counterpart in the reference (one GPU always holds a whole volume);
SURVEY.md §5's sequence-parallelism analogue.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.sampling import sample_displacement_unit
from ..ops.diff import jacobian_times_vectorfield
from .sharded_fft import _local_apply

__all__ = ["sharded_expmap", "sharded_atlas_loss"]


def _halo_x(x, axis_name, n_shards):
    """Append 1-voxel left/right X halos to an ``(B, C, Xl, Y, Z)`` shard.

    Interior halos are the true neighbor rows (two ``ppermute``s of one
    X-row each); the global first/last shard replicates its own edge row,
    which is exactly what the CLAMP boundary reads there."""
    i = jax.lax.axis_index(axis_name)
    first = x[:, :, :1]
    last = x[:, :, -1:]
    fwd = [(j, j + 1) for j in range(n_shards - 1)]
    bwd = [(j + 1, j) for j in range(n_shards - 1)]
    from_left = jax.lax.ppermute(last, axis_name, fwd)
    from_right = jax.lax.ppermute(first, axis_name, bwd)
    left = jnp.where(i == 0, first, from_left)
    right = jnp.where(i == n_shards - 1, last, from_right)
    return jnp.concatenate([left, x, right], axis=2)


def _pad_rows_x(x):
    """Edge-pad one dummy X row per side: values feed only slab-edge outputs
    that are discarded, edge mode keeps them in the tier-1 weight regime."""
    widths = [(0, 0), (0, 0), (1, 1)] + [(0, 0)] * (x.ndim - 3)
    return jnp.pad(x, widths, mode="edge")


def _ad_star_local(p_hal, m0_hal):
    """Shard-local ``Ad^*``: unit warp of m0 + Jacobian contraction on the
    haloed slabs; returns the center rows (exact dense rows — the warp taps
    and the x central difference read the halo, everything else is local)."""
    mw_hal = sample_displacement_unit(m0_hal, p_hal)
    m_hal = jacobian_times_vectorfield(p_hal, mw_hal, displacement=True)
    return m_hal[:, :, 1:-1]


def _compose_local(p_hal, v, s):
    """Shard-local ``compose_disp_vel(p, v, dt=s) = s*v + p(x + s*v)`` on
    the haloed phiinv slab (|s*v| < 1 so taps reach at most the halo)."""
    d = s * v
    warp = sample_displacement_unit(p_hal, _pad_rows_x(d))[:, :, 1:-1]
    return d + warp


def _params_of(metric_or_params):
    params = getattr(metric_or_params, "params", metric_or_params)
    return tuple(float(p) for p in params)


def sharded_expmap(
    metric,
    m0,
    mesh,
    T=1.0,
    num_steps=10,
    axis_name="data",
    checkpoints=False,
):
    """X-sharded geodesic shooting ``expmap`` with explicit minimal
    communication (see module docstring).  ``metric``: a FluidMetric or its
    ``(alpha, beta, gamma)`` params — the fluid solve runs distributed.

    ``m0``: ``(B, 3, X, Y, Z)`` with ``X`` and ``Y`` divisible by the mesh
    axis size.  Returns ``phiinv`` with the same X sharding.  Bit-equality:
    matches the dense ``expmap(..., transport_mode="unit",
    compose_mode="unit")`` integration to distributed-FFT f32 roundoff
    (valid in the unit-displacement regime, i.e. any stable integration).
    """
    params = _params_of(metric)
    n = mesh.shape[axis_name]
    if m0.ndim != 5 or m0.shape[1] != 3:
        raise ValueError("sharded_expmap expects (B, 3, X, Y, Z) momenta")
    B, d, X, Y, Z = m0.shape
    if X % n or Y % n:
        raise ValueError(f"X and Y must be divisible by the mesh axis size {n}")
    dt = T / num_steps
    spec = P(None, None, axis_name, None, None)

    def body(m0_loc):
        sharp = partial(
            _local_apply, params=params, inverse=True,
            axis_name=axis_name, n_shards=n, Y=Y, Z=Z,
        )
        v0 = sharp(m0_loc)
        phiinv = (-dt) * v0
        if num_steps <= 1:
            return phiinv
        m0_hal = _halo_x(m0_loc, axis_name, n)  # invariant: hoisted

        def step(phiinv, _):
            p_hal = _halo_x(phiinv, axis_name, n)  # shared by Ad* + compose
            m = _ad_star_local(p_hal, m0_hal)
            v = sharp(m)
            return _compose_local(p_hal, v, -dt), None

        if checkpoints:
            step = jax.checkpoint(step)
        phiinv, _ = jax.lax.scan(step, phiinv, None, length=num_steps - 1)
        return phiinv

    from jax.experimental.shard_map import shard_map

    return shard_map(
        body, mesh=mesh, in_specs=(spec,), out_specs=spec, check_rep=False
    )(jax.lax.with_sharding_constraint(m0, NamedSharding(mesh, spec)))


def sharded_atlas_loss(
    metric,
    I,
    m,
    img,
    mesh,
    reg_weight=1e2,
    num_steps=5,
    axis_name="data",
    checkpoints=False,
    mask=None,
):
    """Spatially-sharded LDDMM atlas loss: shooting + atlas warp + MSE +
    regularity, everything X-sharded end to end (``I``/``img``: ``(.., 1, X,
    Y, Z)`` image fields sharded like the momenta).  Same loss math as
    :func:`lagomorph_tpu.lddmm._lddmm_loss` restricted to matching
    momentum/image grids; returns ``(loss, reg_term)`` scalars.  ``mask``:
    optional (B,) 0/1 subject weights (padded-subject masking, same contract
    as ``_lddmm_loss``); replicated across shards.

    The atlas warp needs the warped coordinates' image taps, which reach at
    most 1 voxel for unit-regime phiinv plus its own displacement — the
    total displacement after ``num_steps`` substeps can exceed one voxel, so
    the image warp exchanges ``ceil(num_steps)`` halo rows (enough for
    |phiinv| < num_steps voxels after a stable integration)."""
    params = _params_of(metric)
    n = mesh.shape[axis_name]
    B, dch, X, Y, Z = m.shape
    dt = 1.0 / num_steps
    spec = P(None, None, axis_name, None, None)
    Xl = X // n
    halo_img = min(int(num_steps), Xl)

    def body(I_loc, m_loc, img_loc, mask_loc):
        sharp = partial(
            _local_apply, params=params, inverse=True,
            axis_name=axis_name, n_shards=n, Y=Y, Z=Z,
        )
        v0 = sharp(m_loc)
        phiinv = (-dt) * v0
        if num_steps > 1:
            m0_hal = _halo_x(m_loc, axis_name, n)

            def step(phiinv, _):
                p_hal = _halo_x(phiinv, axis_name, n)
                mm = _ad_star_local(p_hal, m0_hal)
                v = sharp(mm)
                return _compose_local(p_hal, v, -dt), None

            if checkpoints:
                step = jax.checkpoint(step)
            phiinv, _ = jax.lax.scan(step, phiinv, None, length=num_steps - 1)

        # atlas warp: general (bounded-displacement) sampling on a slab with
        # halo_img rows of halo each side
        I_wide = I_loc
        for _ in range(halo_img):
            I_wide = _halo_x(I_wide, axis_name, n)
        from ..ops.sampling import sample_linear
        from ..ops.sampling import identity_grid

        # coordinates on the widened slab: local identity + halo offset
        idg = identity_grid((Xl, Y, Z), dtype=phiinv.dtype)
        coords = idg[None] + phiinv
        coords = coords.at[:, 0].add(float(halo_img))
        Idef = sample_linear(I_wide, coords)
        red = tuple(range(1, img_loc.ndim))
        sq = jnp.sum((Idef - img_loc) ** 2, axis=red)   # per-subject
        vm = jnp.sum(v0 * m_loc, axis=tuple(range(1, m_loc.ndim)))
        if mask_loc is None:
            count = float(B)
        else:
            sq = sq * mask_loc
            vm = vm * mask_loc
            count = jnp.sum(mask_loc)  # replicated: no psum
        sq = jax.lax.psum(jnp.sum(sq), axis_name)
        vm = jax.lax.psum(jnp.sum(vm), axis_name)
        numel = count * float(X * Y * Z)
        reg = reg_weight * vm / numel
        return sq / numel + reg, reg

    from jax.experimental.shard_map import shard_map

    cons = lambda x: jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, spec)
    )
    in_specs = (spec, spec, spec, P())
    args = (cons(I), cons(m), cons(img), mask)
    if mask is None:
        body_fn = lambda I_, m_, img_: body(I_, m_, img_, None)
        in_specs = in_specs[:3]
        args = args[:3]
    else:
        body_fn = body
    loss, reg = shard_map(
        body_fn, mesh=mesh, in_specs=in_specs,
        out_specs=(P(), P()), check_rep=False,
    )(*args)
    return loss, reg
