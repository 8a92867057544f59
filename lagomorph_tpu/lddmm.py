"""Large Deformation Diffeomorphic Metric Mapping (LDDMM) vector-momentum
shooting algorithms and the LDDMM atlas builder.

API mirror of the reference's lagomorph/lddmm.py, rebuilt TPU-first:

* ``expmap`` integrates EPDiff with ``lax.scan`` (optionally wrapped in
  ``jax.checkpoint`` to rematerialize the shooting loop in the backward pass
  — replacing both the reference's default full autograd tape and its
  ``EPDiffStepsFunction`` checkpointing, lddmm.py:47-70).
* The atlas builder runs a fully jitted update step (shoot -> warp -> loss ->
  grads for momenta and atlas) with donated buffers, data-parallel over a
  ``jax.sharding.Mesh`` batch axis; cross-device reductions are XLA
  collectives inserted by GSPMD instead of explicit NCCL all_reduce calls
  (reference lddmm.py:196-198,293-295,333-335).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import deform
from . import adjrep
from .metric import FluidMetric, Metric
from .ops.affine import regrid
from .utils import tqdm, Tool

__all__ = [
    "expmap",
    "expmap_advect",
    "EPDiff_step",
    "EPDiff_steps",
    "shooting_regime_ok",
    "LDDMMAtlasBuilder",
    "lddmm_atlas",
]


def EPDiff_step(metric, m0, dt, phiinv, mommask=None,
                transport_mode=None, compose_mode=None):
    """One step of EPDiff in integrated (deformation) form: transport the
    initial momentum with ``Ad^*``, sharp to a velocity, and compose into
    the inverse deformation (reference lddmm.py:39-44).

    ``transport_mode``/``compose_mode`` statically force the warp tier of
    the Ad* transport warp (displacement ``phiinv``) and the composition
    warp (displacement one Euler sub-step, always unit for stable
    integration); None = runtime auto-tiering."""
    m = adjrep.Ad_star(phiinv, m0, mode=transport_mode)
    if mommask is not None:
        m = m * mommask
    v = metric.sharp(m)
    return deform.compose_disp_vel(phiinv, v, dt=-dt, mode=compose_mode)


def expmap(
    metric,
    m0,
    T=1.0,
    num_steps=10,
    phiinv=None,
    mommask=None,
    checkpoints=False,
    transport_mode=None,
    compose_mode=None,
    v0=None,
):
    """Geodesic shooting: given initial momentum ``m0`` compute the inverse
    deformation ``phi^{-1}`` at time ``T`` (reference lddmm.py:73-105).

    ``v0``: optional precomputed ``metric.sharp(m0*mommask)`` — lets callers
    that also need the initial velocity (e.g. the atlas loss's regularizer)
    share one fluid solve with the peeled first integration step.

    ``checkpoints``: if truthy, wrap each integration step in
    ``jax.checkpoint`` so the backward pass rematerializes instead of
    storing all intermediates — O(1) memory in the number of steps.

    ``transport_mode``/``compose_mode``: static warp-tier overrides (see
    :func:`EPDiff_step`); with a stable step size ``compose_mode="unit"`` is
    always valid, and ``transport_mode="bounded"`` is valid whenever the
    total deformation stays within the tier radius (2 voxels).
    """
    dt = T / num_steps
    length = num_steps
    if phiinv is None:
        # Peel the first step: from phiinv = 0, Ad*(0, m0) = m0 exactly and
        # compose_disp_vel(0, v, -dt) = -dt*v exactly (warp of the zero
        # field is zero), so step 1 is one sharp and an axpy — bit-identical
        # to running it through the scan, minus a warp+jtv+compose.
        if v0 is None:
            m = m0 if mommask is None else m0 * mommask
            v0 = metric.sharp(m)
        phiinv = (-dt) * v0
        length = num_steps - 1
        if length <= 0:
            return phiinv
        # Hoisted-regime fast path (TPU fused kernels): run the whole
        # integration with STATIC unit-tier kernels while accumulating a
        # trajectory-validity flag; ONE cond at the end reruns the exact
        # general path if any substep left the unit regime.  Bit-identical
        # to the per-warp runtime tiering (each tier is exact in its
        # regime) but without 2 conds per substep.
        if transport_mode is None and compose_mode is None:
            fused = _hoisted_fused_pair(m0)
            if fused is not None:
                return _expmap_hoisted(
                    metric, m0, dt, length, phiinv, mommask, checkpoints,
                    fused,
                )
    if length <= 0:
        return phiinv

    def step(phiinv, _):
        return EPDiff_step(
            metric, m0, dt, phiinv, mommask=mommask,
            transport_mode=transport_mode, compose_mode=compose_mode,
        ), None

    if checkpoints:
        step = jax.checkpoint(step)
    phiinv, _ = jax.lax.scan(step, phiinv, None, length=length)
    return phiinv


def _hoisted_fused_pair(m0):
    """The fused ``(ad_star, compose)`` kernel pair for this shape/dtype
    (3D epdiff_unit or 2D epdiff2d), or None when the hoisted static-tier
    fast path does not apply (unsupported geometry, kernels disabled, or a
    forced global warp mode)."""
    from .ops.interp import get_warp_mode
    from .ops.pallas import epdiff_unit as _eu
    from .ops.pallas import epdiff2d as _e2

    if get_warp_mode() not in ("auto", "unit"):
        return None
    if _eu.ad_star_supported(m0.shape, m0.shape, m0.dtype):
        return (_eu.ad_star_unit_pallas, _eu.compose_disp_vel_pallas)
    if _e2.supported(m0.shape, m0.shape, m0.dtype):
        return (_e2.ad_star2d_pallas, _e2.compose2d_pallas)
    return None


def _in_unit(d):
    return jnp.logical_and(jnp.all(d >= -1.0), jnp.all(d < 1.0))


# Unroll the (static-length) shooting loop below this many substeps.  A
# lax.scan stacks every substep's VJP residuals with a dynamic-update-slice
# per iteration and unstacks them in reverse — measured +9.5 ms/step over
# the identical unrolled program at 128^3 b4 (scripts/expmap_probe.py:
# scan 73.3 ms vs unroll 63.8 ms fwd+bwd; forward-only is a wash).  Typical
# integrations are 5-10 substeps, so straight-line code costs little
# compile time; longer integrations keep the scan for program size.
_UNROLL_MAX_SUBSTEPS = 16


def _run_substeps(fast_step, carry, length, checkpoints):
    """Run ``length`` substeps of ``fast_step`` (a scan-style body).
    Static short lengths are Python-unrolled (see _UNROLL_MAX_SUBSTEPS);
    otherwise a lax.scan."""
    if checkpoints:
        fast_step = jax.checkpoint(fast_step)
    if length <= _UNROLL_MAX_SUBSTEPS:
        for _ in range(length):
            carry, _ = fast_step(carry, None)
        return carry
    carry, _ = jax.lax.scan(fast_step, carry, None, length=length)
    return carry


def _expmap_fast_flagged(metric, m0, dt, length, phiinv0, mommask,
                         checkpoints, fused):
    """The hoisted fast scan: integrate with static fused unit-tier kernels,
    accumulating a trajectory-validity flag.  Returns ``(phiinv, ok)``; the
    result is exact iff ``ok`` (callers must fall back to the general tier
    otherwise — see :func:`_expmap_hoisted`)."""
    ad_star_fused, compose_fused = fused

    def fast_step(carry, _):
        phiinv, ok = carry
        ok = jnp.logical_and(ok, _in_unit(phiinv))
        m = ad_star_fused(phiinv, m0)
        if mommask is not None:
            m = m * mommask
        v = metric.sharp(m)
        ok = jnp.logical_and(ok, _in_unit(-dt * v))
        phiinv = compose_fused(phiinv, v, -dt)
        return (phiinv, ok), None

    fast, ok = _run_substeps(
        fast_step, (phiinv0, jnp.asarray(True)), length, checkpoints
    )
    return fast, ok


def _expmap_fast_padres(metric, m0, dt, length, phiinv0, mommask,
                        checkpoints):
    """The hoisted fast scan on the PADDED-RESIDENT carry
    (ops/pallas/padres.py): phiinv lives in the kernels' padded layout for
    the whole integration (padded once at entry, sliced once at exit), the
    loop-invariant momentum is padded once outside the scan, and the
    unit-regime flags are reduced inside the fused kernels — eliminating
    the ~7 XLA pad copies and 2 flag passes per substep of the per-call
    padded path.  Bit-identical to :func:`_expmap_fast_flagged` in its
    regime; same ``(phiinv, ok)`` contract."""
    from .ops.pallas import padres as pr

    X, Y, Z = m0.shape[2:]
    N = phiinv0.shape[0]
    m0b = (
        jnp.broadcast_to(m0, (N,) + m0.shape[1:])
        if m0.shape[0] == 1 and N > 1
        else m0
    )
    mpad = pr.pad_carry(m0b)
    ppad0 = pr.pad_carry(phiinv0)

    def fast_step(carry, _):
        ppad, ok = carry
        m, f1 = pr.ad_star_pr(ppad, mpad, X, Y, Z)
        ok = jnp.logical_and(ok, jnp.min(f1) > 0.5)
        if mommask is not None:
            m = m * mommask
        v = metric.sharp(m)
        ppad, f2 = pr.compose_pr(ppad, v, -dt, X, Y, Z)
        ok = jnp.logical_and(ok, jnp.min(f2) > 0.5)
        return (ppad, ok), None

    ppadT, ok = _run_substeps(
        fast_step, (ppad0, jnp.asarray(True)), length, checkpoints
    )
    return pr.unpad_carry(ppadT, X, Y, Z), ok


def _expmap_general(metric, m0, dt, length, phiinv0, mommask,
                    mode="auto"):
    """Exact fallback integration for trajectories that left the unit
    regime; every step is rematerialized.

    ``mode="auto"`` (default) keeps per-step runtime tier conds: |d| < 1
    substeps still use the fused stencil, |d| <= R the dense offset sweep
    (scatter-free custom VJP), and only the extreme tail the true gather.
    This is exact in every regime (the tiers agree exactly inside their
    validity bounds) while avoiding XLA scatter for realistic
    out-of-regime trajectories — the forced-gather form (``mode=
    "general"``) is ~30x slower at 64^3 b4 and its 5-step backward
    crashes the remote TPU worker outright at 128^3 b4 (round-5 finding;
    single steps and the bounded/auto forms run fine)."""

    def step(phiinv, _):
        return EPDiff_step(
            metric, m0, dt, phiinv, mommask=mommask,
            transport_mode=mode, compose_mode=mode,
        ), None

    phiinv, _ = jax.lax.scan(
        jax.checkpoint(step), phiinv0, None, length=length
    )
    return phiinv


def _expmap_hoisted(metric, m0, dt, length, phiinv0, mommask, checkpoints,
                    fused):
    """Integrate with static fused unit-tier kernels plus a trajectory
    validity flag; one cond falls back to the exact general-tier
    integration when the regime was ever left (rare: per-substep
    displacements < 1 voxel is the stability condition of the Euler
    integration itself).

    ``fused``: the ``(ad_star, compose)`` kernel pair for this
    dimensionality (3D epdiff_unit or 2D epdiff2d)."""
    from .ops.pallas import padres as pr
    from .ops.pallas import shoot2d as s2

    if (
        mommask is None
        and isinstance(metric, FluidMetric)
        and isinstance(dt, (int, float))
        and s2.supported(m0.shape, m0.dtype, metric.params, int(length))
    ):
        # 2D whole-shoot mega-kernel: the full integration in ONE kernel
        # launch (fields VMEM-resident, in-kernel MXU-DFT fluid solve) —
        # at 2D bench shapes the per-op kernels are dispatch-bound.
        fast, okf = s2.shoot2d(phiinv0, m0, metric.params, -dt, int(length))
        ok = okf[0, 0] > 0.5
    elif pr.supported(m0.shape, m0.dtype):
        fast, ok = _expmap_fast_padres(
            metric, m0, dt, length, phiinv0, mommask, checkpoints
        )
    else:
        fast, ok = _expmap_fast_flagged(
            metric, m0, dt, length, phiinv0, mommask, checkpoints, fused
        )

    def general_fn(phiinv0_, m0_, _fast):
        return _expmap_general(metric, m0_, dt, length, phiinv0_, mommask)

    return jax.lax.cond(
        ok, lambda p0, m_, f: f, general_fn, phiinv0, m0, fast
    )


def shooting_regime_ok(metric, m0, T=1.0, num_steps=10, mommask=None):
    """Trajectory-validity probe for the hoisted fast path: returns a traced
    boolean that is True iff every substep of ``expmap(metric, m0, ...)``
    stays in the unit-displacement regime (|d| < 1 voxel per warp), i.e. the
    regime in which ``_expmap_hoisted`` keeps the fused static kernels and
    never reruns the general tier.

    Observability hook for benchmarks/training (VERDICT r2 #6): the silent
    2x cost of a persistent fallback can be asserted away by checking this
    once per config (it runs one general-tier shooting — use it as a spot
    check, not inside the hot loop)."""
    dt = T / num_steps

    def in_unit(d):
        return jnp.logical_and(jnp.all(d >= -1.0), jnp.all(d < 1.0))

    m = m0 if mommask is None else m0 * mommask
    v0 = metric.sharp(m)
    phiinv = (-dt) * v0
    ok = in_unit(phiinv)

    def step(carry, _):
        phiinv, ok = carry
        ok = jnp.logical_and(ok, in_unit(phiinv))
        m = adjrep.Ad_star(phiinv, m0, mode="general")
        if mommask is not None:
            m = m * mommask
        v = metric.sharp(m)
        ok = jnp.logical_and(ok, in_unit(-dt * v))
        phiinv = deform.compose_disp_vel(phiinv, v, dt=-dt, mode="general")
        return (phiinv, ok), None

    if num_steps > 1:
        (phiinv, ok), _ = jax.lax.scan(
            jax.checkpoint(step), (phiinv, ok), None, length=num_steps - 1
        )
    return ok


def EPDiff_steps(metric, m0, dt, N, phiinv):
    """Gradient-checkpointed block of N EPDiff steps (API analogue of the
    reference's EPDiffStepsFunction, lddmm.py:47-70)."""

    @jax.checkpoint
    def step(phiinv, _):
        return EPDiff_step(metric, m0, dt, phiinv), None

    phiinv, _ = jax.lax.scan(step, phiinv, None, length=N)
    return phiinv


def expmap_advect(metric, m, T=1.0, num_steps=10, phiinv=None):
    """EPDiff by explicit Euler advection of the momentum (non-integrated
    form): ``d/dt m = -ad_v^* m`` (reference lddmm.py:20-36)."""
    if phiinv is None:
        phiinv = jnp.zeros_like(m)
    dt = T / num_steps
    v = metric.sharp(m)
    phiinv = deform.compose_disp_vel(phiinv, v, dt=-dt)

    def step(carry, _):
        m, phiinv = carry
        v = metric.sharp(m)
        m = m - dt * adjrep.ad_star(v, m)
        v = metric.sharp(m)
        phiinv = deform.compose_disp_vel(phiinv, v, dt=-dt)
        return (m, phiinv), None

    if num_steps > 1:
        (m, phiinv), _ = jax.lax.scan(step, (m, phiinv), None, length=num_steps - 1)
    return phiinv


# ---------------------------------------------------------------------------
# Atlas building
# ---------------------------------------------------------------------------


def _lddmm_loss(I, m, img, metric, reg_weight, integration_steps, checkpoints,
                image_shape=None, mask=None):
    """Loss for one minibatch: MSE(I ∘ phi^{-1}(m), img)/|Ω| + reg.

    Matches reference lddmm_step (lddmm.py:300-325), including the regrid
    path when momenta live on a coarser grid than the image.

    ``mask``: optional (B,) 0/1 weights for padded subjects (used when the
    batch is padded up to a mesh-divisible size); with mask all-ones this is
    exactly the reference loss."""
    # one fluid solve serves both the regularizer and the peeled first
    # integration step (bit-identical to computing them separately)
    v = metric.sharp(m)
    h = expmap(metric, m, num_steps=integration_steps, checkpoints=checkpoints,
               v0=v)
    regrid_momenta = image_shape is not None and tuple(h.shape[2:]) != tuple(image_shape)
    if regrid_momenta:
        # NOTE: the reference upscales the deformation without rescaling the
        # displacement vectors (lddmm.py:306-307 calls regrid without
        # displacement=True); we reproduce that behavior for parity.
        h = regrid(h, shape=tuple(image_shape))
    Idef = deform.interp_auto(I, h)
    axes = tuple(range(1, img.ndim))
    sq = jnp.sum((Idef - img) ** 2, axis=axes)  # per-subject
    vm = jnp.sum(v * m, axis=tuple(range(1, m.ndim)))
    if mask is None:
        count = img.shape[0]
    else:
        sq = sq * mask
        vm = vm * mask
        count = jnp.sum(mask)
    numel = count * float(np.prod(img.shape[1:]))
    reg_term = reg_weight * jnp.sum(vm) / numel
    if regrid_momenta:
        # account for coarser averaging grid (reference lddmm.py:311-312)
        reg_term = reg_term * (I.size / v[0, 0].size)
    loss = jnp.sum(sq) / numel + reg_term
    return loss, reg_term


def make_lddmm_atlas_step(
    metric,
    reg_weight=1e2,
    learning_rate_pose=2e2,
    lddmm_steps=1,
    integration_steps=5,
    momentum_preconditioning=False,
    checkpoints=False,
    image_shape=None,
    spatial_mesh=None,
    spatial_axis="data",
):
    """Build the jitted per-minibatch atlas update.

    Returns ``step(I, m, img) -> (m_new, I_grad, loss, reg_term)`` where
    ``I_grad`` is the atlas-image gradient contribution of this minibatch
    (summed over the batch — accumulated by the caller, reference
    lddmm.py:287-298).  Everything inside is pure; the caller jits it with
    shardings/donation.

    ``spatial_mesh``: when given, the whole loss (shooting + warp + MSE)
    runs X-SHARDED over ``spatial_axis`` of that mesh via the halo
    shard_map formulation (:func:`..parallel.sharded_atlas_loss`) — the
    >HBM-volume mode (SURVEY §5 spatial sharding).  Requires momenta and
    images on the same grid (no regrid path)."""

    if spatial_mesh is not None:
        from .parallel import sharded_atlas_loss

        def loss_fn(m, I, img, mask):
            return sharded_atlas_loss(
                metric, I, m, img, spatial_mesh,
                reg_weight=reg_weight, num_steps=integration_steps,
                axis_name=spatial_axis, checkpoints=checkpoints, mask=mask,
            )
    else:
        def loss_fn(m, I, img, mask):
            return _lddmm_loss(
                I, m, img, metric, reg_weight, integration_steps, checkpoints,
                image_shape=image_shape, mask=mask,
            )

    def step(I, m, img, mask=None):
        loss = reg = None
        gI = None
        for lit in range(lddmm_steps):
            last = lit == lddmm_steps - 1
            if last:
                (loss, reg), (gm, gI) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1), has_aux=True
                )(m, I, img, mask)
            else:
                (loss, reg), gm = jax.value_and_grad(loss_fn, has_aux=True)(
                    m, I, img, mask
                )
            p = metric.flat(gm) if momentum_preconditioning else gm
            m = m - learning_rate_pose * p
        return m, gI, loss, reg

    return step


def lddmm_atlas(
    dataset,
    I0=None,
    num_epochs=500,
    batch_size=10,
    lddmm_steps=1,
    lddmm_integration_steps=5,
    image_update_freq=0,
    reg_weight=1e2,
    learning_rate_pose=2e2,
    learning_rate_image=1e4,
    metric=None,
    momentum_shape=None,
    image_shape=None,
    momentum_preconditioning=False,
    checkpoint_format=None,
    gradient_checkpointing=False,
    loader_workers=0,
    loader_mode="thread",
    dataloader_cache=None,
    keep_data_on_device=False,
    image_dtype=None,
    ms=None,
    mesh=None,
    spatial_shard=False,
    progress_bar=True,
    dtype=np.float32,
):
    """Functional LDDMM atlas building (see :class:`LDDMMAtlasBuilder` for
    the stateful API mirror).  Returns ``(I, ms, epoch_losses,
    epoch_reg_terms, iter_losses, iter_reg_terms)``."""
    builder = LDDMMAtlasBuilder(
        dataset,
        I0=I0,
        ms=ms,
        num_epochs=num_epochs,
        batch_size=batch_size,
        lddmm_steps=lddmm_steps,
        lddmm_integration_steps=lddmm_integration_steps,
        image_update_freq=image_update_freq,
        reg_weight=reg_weight,
        learning_rate_pose=learning_rate_pose,
        learning_rate_image=learning_rate_image,
        metric=metric,
        momentum_shape=momentum_shape,
        image_shape=image_shape,
        momentum_preconditioning=momentum_preconditioning,
        checkpoint_format=checkpoint_format,
        gradient_checkpointing=gradient_checkpointing,
        loader_workers=loader_workers,
        loader_mode=loader_mode,
        dataloader_cache=dataloader_cache,
        keep_data_on_device=keep_data_on_device,
        image_dtype=image_dtype,
        mesh=mesh,
        spatial_shard=spatial_shard,
        progress_bar=progress_bar,
        dtype=dtype,
    )
    builder.run()
    return (
        builder.I,
        builder.ms,
        builder.epoch_losses,
        builder.epoch_reg_terms,
        builder.iter_losses,
        builder.iter_reg_terms,
    )


class LDDMMAtlasBuilder:
    """Stateful LDDMM atlas builder (API mirror of reference lddmm.py:108-375).

    The compute path is one jitted function per configuration; per-subject
    momenta are kept on host (numpy) between iterations — the TPU analogue
    of the reference's pinned-CPU momenta staging (lddmm.py:226-236,
    327-337) — and streamed through device memory minibatch by minibatch.

    With a :class:`jax.sharding.Mesh` (``mesh`` argument), the batch axis of
    images and momenta is sharded over the mesh's ``'data'`` axis and the
    atlas image is replicated; GSPMD inserts the psum for the image gradient
    and scalar losses over ICI.
    """

    def __init__(
        self,
        dataset,
        I0=None,
        ms=None,
        num_epochs=500,
        batch_size=10,
        lddmm_steps=1,
        lddmm_integration_steps=5,
        image_update_freq=0,
        reg_weight=1e2,
        learning_rate_pose=2e2,
        learning_rate_image=1e4,
        metric=None,
        momentum_shape=None,
        image_shape=None,
        momentum_preconditioning=False,
        checkpoint_format=None,
        gradient_checkpointing=False,
        loader_workers=0,
        loader_mode="thread",
        dataloader_cache=None,
        keep_data_on_device=False,
        image_dtype=None,
        device=None,
        world_size=1,
        rank=0,
        mesh=None,
        spatial_shard=False,
        progress_bar=True,
        dtype=np.float32,
    ):
        # record all constructor arguments as members (frozen after
        # initialize(), like the reference's constructor-arg freezing,
        # lddmm.py:133-150)
        args = dict(locals())
        self._initialized = False
        self._initvars = []
        for k, v in args.items():
            if k != "self":
                setattr(self, k, v)
                self._initvars.append(k)

    def __setattr__(self, k, v):
        if (
            k not in ("_initvars", "_initialized")
            and getattr(self, "_initialized", False)
            and k in getattr(self, "_initvars", ())
        ):
            raise Exception(
                f"Member {k} was set in constructor and cannot be "
                "overwritten after initialization"
            )
        self.__dict__[k] = v

    # -- initialization ----------------------------------------------------
    def initialize(self):
        if not self._initialized:
            self._init_batches()
            self._init_atlas_image()
            self._init_metric()
            self._init_losses()
            self._init_momenta()
            self._init_step()
            self._iteration = 0
            self._epoch = 0
            self._initialized = True

    def _init_batches(self):
        import jax as _jax

        from .data import batch_iterator, dataset_length

        # multi-process data parallelism: each process owns an interleaved
        # shard of the subjects (the DistributedSampler analogue, reference
        # lddmm.py:164-168); batch_size is per-process like the reference's
        # per-rank loaders
        self._world = _jax.process_count()
        self._rank = _jax.process_index()
        n_total = dataset_length(self.dataset)
        self._num_examples = n_total  # global count (loss normalization)
        if self._world > 1:
            from .parallel import process_shard_indices, shard_sizes

            indices = process_shard_indices(n_total, self._world, self._rank)
            # iteration counts must agree across processes: a process whose
            # shard runs out feeds all-masked dummy batches
            per_proc = shard_sizes(n_total, self._world)
            nb = [-(-s // self.batch_size) if s else 0 for s in per_proc]
            self._n_iters = max(nb)
            # global real-subject count at each iteration (deterministic on
            # every process — no communication needed)
            self._global_real = [
                sum(
                    max(0, min(self.batch_size, per_proc[p] - i * self.batch_size))
                    for p in range(self._world)
                )
                for i in range(self._n_iters)
            ]
        else:
            indices = None
            self._n_iters = None  # set after batches are materialized
            self._global_real = None
        it = batch_iterator(
            self.dataset, self.batch_size, dtype=self.dtype, indices=indices
        )
        if self.dataloader_cache is not None:
            # disk-backed minibatch cache with native readahead when the C++
            # toolchain is available (reference --dataloader_cache,
            # lddmm.py:179-184), falling back to the pure-Python cache
            try:
                from .native import NativeBatchCache

                self._batches = NativeBatchCache(
                    it, cache_dir=self.dataloader_cache,
                    progress_bar=self.progress_bar,
                )
            except Exception:
                from .data import CachedDataLoader

                # CachedDataLoader is random-access (one .npy per batch)
                self._batches = CachedDataLoader(
                    it, cache_dir=self.dataloader_cache,
                    progress_bar=self.progress_bar,
                )
        else:
            self._batches = list(it)
        if self._n_iters is None:
            self._n_iters = len(self._batches)

    def _init_atlas_image(self):
        from .data import batch_average

        if self.I0 is None:
            if self._world > 1:
                # global mean over all processes' shards (replaces the
                # reference's all_reduce(I0)/world_size, lddmm.py:196-198)
                from .parallel import allsum_hosts

                lsum = None
                count = 0
                for b in self._batches:
                    b = np.asarray(b)
                    s = b.astype(np.float64).sum(axis=0)
                    lsum = s if lsum is None else lsum + s
                    count += b.shape[0]
                tot = allsum_hosts(
                    np.concatenate([lsum.ravel(), [np.float64(count)]])
                )
                I0 = (tot[:-1] / tot[-1]).reshape(lsum.shape).astype(self.dtype)
            else:
                I0 = batch_average(self._batches, progress_bar=self.progress_bar)
        else:
            I0 = np.asarray(self.I0, dtype=self.dtype)
        # shape to (1, 1, *spatial) like reference (lddmm.py:205)
        I0 = np.asarray(I0, dtype=self.dtype).squeeze()
        self.I = jnp.asarray(I0[None, None], dtype=self.dtype)
        if self.image_shape is not None and tuple(self.I.shape[2:]) != tuple(
            self.image_shape
        ):
            self.I = regrid(self.I, shape=tuple(self.image_shape))
        self._image_grad_accum = jnp.zeros_like(self.I)
        self._image_iters = 0

    def _init_metric(self):
        if self.metric is None:
            self.metric = FluidMetric([0.1, 0.0, 0.01])

    def _init_losses(self):
        for k in ("epoch_losses", "epoch_reg_terms", "iter_losses", "iter_reg_terms"):
            if k not in self.__dict__:
                setattr(self, k, [])

    def _init_momenta(self):
        dim = len(self.I.shape) - 2
        if self.momentum_shape is None:
            self.momentum_shape = tuple(self.I.shape[2:])
        self.momentum_shape = tuple(self.momentum_shape)
        if self.ms is None:
            self.ms = [
                np.zeros((img.shape[0], dim) + self.momentum_shape, dtype=self.dtype)
                for img in self._batches
            ]
        else:
            self.ms = [np.asarray(m, dtype=self.dtype) for m in self.ms]

    def _init_step(self):
        step = make_lddmm_atlas_step(
            self.metric,
            reg_weight=self.reg_weight,
            learning_rate_pose=self.learning_rate_pose,
            lddmm_steps=self.lddmm_steps,
            integration_steps=self.lddmm_integration_steps,
            momentum_preconditioning=self.momentum_preconditioning,
            checkpoints=self.gradient_checkpointing,
            image_shape=tuple(self.I.shape[2:]),
            spatial_mesh=self.mesh if self.spatial_shard else None,
        )
        if self.spatial_shard:
            # >HBM-volume mode: the X axis of images/momenta/atlas is
            # sharded over the mesh's 'data' axis (halo shard_map shooting,
            # parallel/sharded_epdiff.py); batch stays process-local
            from jax.sharding import NamedSharding, PartitionSpec

            if self.mesh is None:
                raise ValueError(
                    "spatial_shard=True requires a mesh (pass mesh=get_mesh())"
                )
            if self._world > 1:
                raise ValueError(
                    "spatial_shard is single-process (one controller over "
                    "the mesh); use multi-process DP without spatial_shard"
                )
            sp = tuple(self.I.shape[2:])
            if tuple(self.momentum_shape) != sp:
                raise ValueError(
                    "spatial_shard requires momenta and images on the same "
                    f"grid (got {tuple(self.momentum_shape)} vs {sp})"
                )
            n = self.mesh.shape["data"]
            if len(sp) != 3 or sp[0] % n or sp[1] % n:
                raise ValueError(
                    f"spatial_shard needs 3D X/Y divisible by the mesh "
                    f"size {n} (got {sp})"
                )
            spat_s = NamedSharding(self.mesh, PartitionSpec(None, None, "data"))
            repl_s = NamedSharding(self.mesh, PartitionSpec())
            self._step = jax.jit(
                step,
                in_shardings=(spat_s, spat_s, spat_s, repl_s),
                out_shardings=(spat_s, spat_s, repl_s, repl_s),
                donate_argnums=(1,),
            )
            self.I = jax.device_put(self.I, spat_s)

            def put(x):
                x = np.asarray(x)
                return jax.device_put(
                    x, spat_s if x.ndim >= 5 else repl_s
                )

            self._put = put
            self._pad_multiple = 1
        elif self.mesh is not None:
            from .parallel import data_sharding, replicated_sharding

            batch_s = data_sharding(self.mesh)
            repl_s = replicated_sharding(self.mesh)
            self._step = jax.jit(
                step,
                in_shardings=(repl_s, batch_s, batch_s, batch_s),
                out_shardings=(batch_s, repl_s, repl_s, repl_s),
                donate_argnums=(1,),
            )
            if self._world > 1:
                # assemble process-local rows into one global batch-sharded
                # array; each process pads its local batch to a fixed row
                # count so global shapes agree across processes
                from .parallel import put_global

                self._put = lambda x: put_global(np.asarray(x), batch_s)
                self._pad_multiple = int(jax.local_device_count())
            else:
                self._put = lambda x: jax.device_put(np.asarray(x), batch_s)
                self._pad_multiple = int(self.mesh.devices.size)
        else:
            if self._world > 1:
                raise ValueError(
                    "multi-process training requires a mesh over the global "
                    "devices (pass mesh=get_mesh())"
                )
            self._step = jax.jit(step, donate_argnums=(1,))
            self._put = jnp.asarray
            self._pad_multiple = 1
        # fixed per-process staged rows in multi-process mode
        self._local_rows = (
            -(-self.batch_size // self._pad_multiple) * self._pad_multiple
            if self._world > 1
            else None
        )

        def image_update(I, g, n):
            return I - self.learning_rate_image * (g / n)

        self._image_update = jax.jit(image_update)

    # -- persistence (HDF5, same schema as reference lddmm.py:238-285) -----
    def _momenta_host(self):
        """Per-batch momenta as host arrays sliced to real (unpadded) sizes.

        With multi-process + ``keep_data_on_device``, ``self.ms`` holds
        globally-sharded ``jax.Array``s (donated step outputs spanning
        non-addressable devices); extract this process's local rows first —
        the ``n_real`` in ``_dev_cache`` is already this process's local
        real-row count, so the slice below stays correct."""
        out = []
        world = getattr(self, "_world", 1)
        for i, m in enumerate(self.ms):
            if world > 1 and not isinstance(m, np.ndarray):
                from .parallel import local_shard

                m = local_shard(m)
            else:
                m = np.asarray(m)
            if self.keep_data_on_device and hasattr(self, "_dev_cache") and i in self._dev_cache:
                m = m[: self._dev_cache[i][3]]
            out.append(m)
        return out

    def save_momenta(self, handle):
        ms_host = self._momenta_host()
        n = sum(m.shape[0] for m in ms_host)
        m0 = ms_host[0]
        hms = handle.create_dataset(
            "momenta", shape=(n, *m0.shape[1:]), dtype=np.float32
        )
        i = 0
        batch_sizes = []
        for m in ms_host:
            hms[i : i + m.shape[0], ...] = m.astype(np.float32)
            i += m.shape[0]
            batch_sizes.append(m.shape[0])
        hms.attrs["batch_sizes"] = batch_sizes

    def save(self, filename):
        import h5py

        with h5py.File(filename, "w") as f:
            f.create_dataset("atlas", data=np.asarray(self.I))
            self.save_momenta(f)
            f.create_dataset("epoch_losses", data=np.asarray(self.epoch_losses))
            f.create_dataset("epoch_reg_terms", data=np.asarray(self.epoch_reg_terms))
            f.create_dataset("iter_losses", data=np.asarray(self.iter_losses))
            f.create_dataset("iter_reg_terms", data=np.asarray(self.iter_reg_terms))

    def load_momenta(self, handle):
        self.ms = []
        i = 0
        szs = handle["momenta"].attrs["batch_sizes"]
        for s in szs:
            self.ms.append(np.asarray(handle["momenta"][i : i + s, ...]))
            i += s

    def load(self, filename, load_image=True, load_momenta=True, load_losses=True):
        import h5py

        with h5py.File(filename, "r") as f:
            if load_image:
                self.I0 = np.asarray(f["atlas"])
            if load_momenta:
                self.load_momenta(f)
            if load_losses:
                self.epoch_losses = list(f["epoch_losses"])
                self.epoch_reg_terms = list(f["epoch_reg_terms"])
                self.iter_losses = list(f["iter_losses"])
                self.iter_reg_terms = list(f["iter_reg_terms"])

    # -- training loop ------------------------------------------------------
    def update_base_image(self, force=False):
        if (
            self._image_iters < self.image_update_freq and not force
        ) or self._image_iters == 0:
            return
        self.I = self._image_update(
            self.I, self._image_grad_accum, float(self._image_iters)
        )
        self._image_grad_accum = jnp.zeros_like(self.I)
        self._image_iters = 0

    def _staged(self, batch_index):
        """Stage (img, m, mask, n_real) for one minibatch on device.

        Default: momenta live on host and stream through device memory (the
        reference's pinned-CPU staging strategy).  With
        ``keep_data_on_device`` everything is transferred once and reused —
        the right mode when the dataset fits in HBM (and essential when
        host<->device bandwidth is the bottleneck).
        """
        from .parallel import pad_batch_to_multiple

        def pad_rows(x):
            """Pad the local batch: to the device multiple (single-process)
            or to the fixed per-process row count (multi-process, so the
            assembled global shape is identical on every process)."""
            if self._local_rows is None:
                return pad_batch_to_multiple(x, self._pad_multiple)[0]
            n, rows = x.shape[0], self._local_rows
            if n == rows:
                return x
            pad = np.zeros((rows - n,) + x.shape[1:], dtype=x.dtype)
            return np.concatenate([x, pad], axis=0)

        def host_batch(i):
            """(img, m) local host arrays; all-dummy when this process's
            shard has fewer batches than the global iteration count."""
            if i < len(self._batches):
                pf = getattr(self, "_img_prefetch", None)
                img = (
                    pf.get(i) if pf is not None
                    else np.asarray(self._batches[i])
                )
                return img, np.asarray(self.ms[i])
            sp = tuple(self.I.shape[2:])
            dim = len(sp)
            img = np.zeros((0, self.I.shape[1]) + sp, dtype=self.dtype)
            m = np.zeros((0, dim) + self.momentum_shape, dtype=self.dtype)
            return img, m

        if self.keep_data_on_device:
            if not hasattr(self, "_dev_cache"):
                self._dev_cache = {}
            if batch_index not in self._dev_cache:
                img_np, m_np = host_batch(batch_index)
                n_real = img_np.shape[0]
                img_np = self._image_cast(pad_rows(img_np))
                mask = np.zeros(img_np.shape[0], dtype=self.dtype)
                mask[:n_real] = 1.0
                m_np = pad_rows(m_np)
                self._dev_cache[batch_index] = [
                    self._put(img_np),
                    self._put(m_np),
                    self._put(mask),
                    n_real,
                ]
                # momenta now live on device; ms[i] aliases the device array
                if batch_index < len(self.ms):
                    self.ms[batch_index] = self._dev_cache[batch_index][1]
            img, m, mask, n_real = self._dev_cache[batch_index]
            if batch_index < len(self.ms):
                m = self.ms[batch_index]
            return img, m, mask, n_real

        img_np, m_np = host_batch(batch_index)
        n_real = img_np.shape[0]
        img_np = self._image_cast(pad_rows(img_np))
        m_np = pad_rows(m_np)
        mask = np.zeros(img_np.shape[0], dtype=self.dtype)
        mask[:n_real] = 1.0
        return self._put(img_np), self._put(m_np), self._put(mask), n_real

    def _image_cast(self, img_np):
        """Optionally downcast staged images for storage/transfer (e.g.
        ``image_dtype='bfloat16'`` halves on-device image memory and
        host->device bytes; the jitted loss upcasts to f32 for compute, so
        only the stored image values are rounded — momenta, deformations,
        and the atlas stay f32)."""
        if self.image_dtype is None:
            return img_np
        import jax.numpy as _jnp

        return np.asarray(img_np).astype(_jnp.dtype(self.image_dtype))

    def _stage_async(self, batch_index):
        """Submit host staging of a batch to the loader pool (returns a
        Future), so the next batch's disk read and host->device transfer
        overlap the current step's compute.  Returns None when prefetching
        is disabled (``loader_workers == 0``) or unnecessary
        (``keep_data_on_device``)."""
        if not self.loader_workers or self.keep_data_on_device:
            return None
        if (
            self.loader_mode == "process"
            and getattr(self, "_img_prefetch", None) is None
        ):
            from .data import ProcessPrefetcher

            # worker PROCESSES own the batch disk reads (GIL-free, the
            # reference's multi-worker DataLoader role); the staging thread
            # below overlaps the remaining pad/cast + host->device put
            self._img_prefetch = ProcessPrefetcher(
                self._batches, workers=int(self.loader_workers)
            )
        if getattr(self, "_stage_pool", None) is None:
            from concurrent.futures import ThreadPoolExecutor

            self._stage_pool = ThreadPoolExecutor(
                max_workers=int(self.loader_workers)
            )
        if getattr(self, "_img_prefetch", None) is not None and (
            batch_index < len(self._batches)
        ):
            self._img_prefetch.submit(batch_index)
        return self._stage_pool.submit(self._staged, batch_index)

    def iteration(self, batch_index, staged=None):
        img, m, mask, n_real = (
            staged if staged is not None else self._staged(batch_index)
        )
        m, gI, loss, reg = self._step(self.I, m, img, mask)
        real_batch = batch_index < len(self.ms)
        if self.keep_data_on_device:
            if real_batch:
                self.ms[batch_index] = m  # stays on device (donated input)
            self._dev_cache[batch_index][1] = m
        elif real_batch:
            if self._world > 1:
                from .parallel import local_shard

                self.ms[batch_index] = local_shard(m)[:n_real]
            else:
                self.ms[batch_index] = np.asarray(m)[:n_real]
        self._image_grad_accum = self._image_grad_accum + gI
        self._image_iters += 1
        if self.image_update_freq > 0:
            self.update_base_image()
        # loss/reg come back normalized over the iteration's global real
        # subject count; scale so the epoch sum equals whole-dataset MSE
        # (reference lddmm.py:316-320)
        n_global = (
            self._global_real[batch_index]
            if self._global_real is not None
            else n_real
        )
        norm = n_global / self._num_examples
        return float(loss) * norm, float(reg) * norm

    def epoch(self):
        epoch_loss = 0.0
        epoch_reg_term = 0.0
        n_batches = self._n_iters
        it = range(n_batches)
        if self.progress_bar:
            it = tqdm(it, desc="iter")
        prefetched = None
        for self._iteration, bi in enumerate(it):
            staged = (
                prefetched.result() if prefetched is not None else None
            )
            # queue the next batch's staging before blocking on this step
            prefetched = (
                self._stage_async(bi + 1) if bi + 1 < n_batches else None
            )
            iter_loss, iter_reg = self.iteration(bi, staged=staged)
            self.iter_losses.append(iter_loss)
            self.iter_reg_terms.append(iter_reg)
            epoch_loss += iter_loss
            epoch_reg_term += iter_reg
        self.update_base_image(force=True)
        if self.checkpoint_format is not None:
            # checkpoints are per-rank (momenta are rank-local, like the
            # reference's {rank}-formatted outputs, lddmm.py:534-539); with
            # no {rank} placeholder only rank 0 writes to avoid a file race
            if self._world == 1 or "{rank}" in self.checkpoint_format or self._rank == 0:
                if self._world > 1 and "{rank}" not in self.checkpoint_format:
                    import warnings

                    warnings.warn(
                        "multi-process run with no {rank} placeholder in "
                        "checkpoint_format: the saved file contains ONLY "
                        "rank 0's momenta shard (a fraction of the "
                        "dataset's subjects). Add '{rank}' to save every "
                        "process's shard.",
                        stacklevel=2,
                    )
                self.save(
                    self.checkpoint_format.format(
                        epoch=self._epoch, rank=self._rank
                    )
                )
        return epoch_loss, epoch_reg_term

    def run(self):
        self.initialize()
        epbar = range(self.num_epochs)
        if self.progress_bar:
            epbar = tqdm(epbar)
        try:
            for self._epoch in epbar:
                epoch_loss, epoch_reg_term = self.epoch()
                self.epoch_losses.append(epoch_loss)
                self.epoch_reg_terms.append(epoch_reg_term)
                if self.progress_bar:
                    epbar.set_postfix(
                        epoch_loss=epoch_loss, epoch_reg=epoch_reg_term
                    )
        finally:
            self.close_loaders()

    def close_loaders(self):
        """Shut down the staging thread pool and loader worker processes
        (idempotent; training can resume — they respawn on demand)."""
        pool = getattr(self, "_stage_pool", None)
        if pool is not None:
            pool.shutdown(wait=True)
            self._stage_pool = None
        pf = getattr(self, "_img_prefetch", None)
        if pf is not None:
            pf.close()
            self._img_prefetch = None


class _Tool(Tool):
    """Diffeomorphic registration methods using LDDMM"""

    module_name = "lagomorph_tpu lddmm"
    subcommands = ["atlas"]

    def atlas(self):
        """
        Build LDDMM atlas from HDF5 image dataset.

        Writes an HDF5 file with datasets: atlas, momenta, epoch_losses,
        epoch_reg_terms, iter_losses, iter_reg_terms; provenance attrs are
        stamped on 'atlas'.
        """
        import sys

        parser = self.new_parser("atlas")
        dg = parser.add_argument_group("data parameters")
        dg.add_argument("input", type=str, help="Path to input image HDF5 file")
        dg.add_argument(
            "--force_dim",
            default=None,
            type=int,
            help="Force dimension of images instead of determining based on dataset shape",
        )
        dg.add_argument(
            "--h5key", "-k", default="images", help="Name of dataset in input HDF5 file"
        )
        dg.add_argument("output", type=str, help="Path to output HDF5 file")
        dg.add_argument(
            "--checkpoint",
            default=None,
            type=str,
            help="Format for HDF5 checkpoints, with {epoch} placeholder",
        )
        dg.add_argument(
            "--loader_workers",
            default=0,
            type=int,
            help="Host staging threads prefetching the next minibatch "
            "(disk read + host->device transfer) while the current step "
            "computes; 0 (default) stages synchronously.  NOTE: measured "
            "3.5x SLOWER over this dev environment's serial TPU relay "
            "(transfers contend with compute RPCs) — enable on hardware "
            "with concurrent DMA engines",
        )
        dg.add_argument(
            "--loader_mode",
            default="thread",
            choices=["thread", "process"],
            help="How loader_workers prefetch: 'thread' overlaps staging in "
            "threads; 'process' adds forked worker PROCESSES that own the "
            "batch disk reads through shared memory (GIL-free, the "
            "reference's multi-worker DataLoader role)",
        )
        dg.add_argument(
            "--dataloader_cache",
            default=None,
            type=str,
            help="Directory in which to cache minibatches for faster "
            "dataloading after the first pass",
        )
        ag = parser.add_argument_group("algorithm parameters")
        ag.add_argument(
            "--initial_atlas",
            default=None,
            type=str,
            help="Path to h5 file with which to initialize image and momenta",
        )
        ag.add_argument("--num_epochs", default=1000, type=int, help="Number of epochs")
        ag.add_argument("--batch_size", default=50, type=int, help="Batch size")
        ag.add_argument(
            "--precondition_momentum",
            action="store_true",
            help="Precondition momentum gradients with the metric operator",
        )
        ag.add_argument(
            "--image_update_freq",
            default=0,
            type=int,
            help="Update base image every N iterations. 0 for once per epoch",
        )
        ag.add_argument(
            "--lddmm_steps", default=1, type=int, help="LDDMM steps per iteration"
        )
        ag.add_argument(
            "--lddmm_integration_steps",
            default=5,
            type=int,
            help="Euler integration steps for geodesic shooting",
        )
        ag.add_argument(
            "--deformation_downscale",
            default=1,
            type=int,
            help="Downscale factor for the momenta/deformation grid",
        )
        ag.add_argument(
            "--image_upscale",
            default=1,
            type=int,
            help="Upscale factor for the atlas image grid",
        )
        ag.add_argument(
            "--gradient_checkpointing",
            action="store_true",
            help="Rematerialize the shooting loop in the backward pass",
        )
        ag.add_argument(
            "--keep_data_on_device",
            action="store_true",
            help="Stage all batches and momenta in device memory once "
            "(fastest when the dataset fits in HBM)",
        )
        ag.add_argument(
            "--image_dtype",
            default=None,
            type=str,
            choices=["bfloat16", "float32"],
            help="Storage dtype for staged images (bfloat16 halves "
            "on-device image memory and transfer bytes; compute stays f32)",
        )
        ag.add_argument(
            "--spatial_shard",
            action="store_true",
            help="Shard the X axis of images/momenta/atlas over the device "
            "mesh (halo shard_map shooting + distributed fluid FFT) — for "
            "volumes too large for one chip's HBM; batch stays local",
        )
        ag.add_argument(
            "--reg_weight", default=1e-1, type=float, help="Deformation regularization"
        )
        ag.add_argument(
            "--learning_rate_m", default=1e-3, type=float, help="Momenta learning rate"
        )
        ag.add_argument(
            "--learning_rate_I", default=1e5, type=float, help="Atlas learning rate"
        )
        mg = parser.add_argument_group("metric parameters")
        Metric.add_args(mg)
        self._compute_args(parser)
        args = parser.parse_args(sys.argv[2:])
        self._initialize_compute(args)

        from .data import H5Dataset

        dataset = H5Dataset(args.input, key=args.h5key, force_dim=args.force_dim)

        im0 = dataset[0]
        momentum_shape = None
        image_shape = None
        if args.deformation_downscale != 1:
            momentum_shape = [s // args.deformation_downscale for s in im0.shape[1:]]
        if args.image_upscale != 1:
            image_shape = [s * args.image_upscale for s in im0.shape[1:]]
        del im0

        metric = Metric.from_args(args)

        builder = LDDMMAtlasBuilder(
            dataset,
            num_epochs=args.num_epochs,
            batch_size=args.batch_size,
            lddmm_steps=args.lddmm_steps,
            lddmm_integration_steps=args.lddmm_integration_steps,
            image_update_freq=args.image_update_freq,
            momentum_shape=momentum_shape,
            image_shape=image_shape,
            reg_weight=args.reg_weight,
            momentum_preconditioning=args.precondition_momentum,
            checkpoint_format=args.checkpoint,
            gradient_checkpointing=args.gradient_checkpointing,
            keep_data_on_device=args.keep_data_on_device,
            image_dtype=args.image_dtype,
            loader_workers=args.loader_workers,
            loader_mode=args.loader_mode,
            dataloader_cache=args.dataloader_cache,
            metric=metric,
            learning_rate_pose=args.learning_rate_m,
            learning_rate_image=args.learning_rate_I,
            mesh=self.mesh,
            spatial_shard=args.spatial_shard,
            progress_bar=self.rank == 0,
        )

        if args.initial_atlas is not None:
            builder.load(args.initial_atlas.format(rank=self.rank))

        builder.run()

        # per-rank outputs (momenta are rank-local, reference lddmm.py:539);
        # without a {rank} placeholder only rank 0 writes
        if self.world_size > 1 and "{rank}" not in args.output:
            if self.rank != 0:
                return
            import warnings

            warnings.warn(
                "multi-process run with no {rank} placeholder in --output: "
                "the saved file contains ONLY rank 0's momenta shard. Add "
                "'{rank}' to the output path to save every process's shard.",
                stacklevel=2,
            )
        args.output = args.output.format(rank=self.rank)
        builder.save(args.output)

        import h5py

        with h5py.File(args.output, "a") as f:
            self._stamp_dataset(f["atlas"], args)
