"""Geodesic shooting tests (reference: testing/test_lddmm.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.test_util import check_grads

import lagomorph_tpu as lm

dims = [2, 3]


@pytest.mark.parametrize("dim", dims)
def test_expmap_zero_returns_identity(rng, dim):
    """expmap of zero momentum is the identity deformation (zero
    displacement) — reference test_lddmm.py:46-51 checks this at res 128."""
    res = 128 if dim == 2 else 32
    defsh = (1, dim) + (res,) * dim
    m = jnp.zeros(defsh, dtype=jnp.float32)
    metric = lm.FluidMetric([0.1, 0.0, 0.01])
    phiinv = lm.expmap(metric, m, num_steps=5)
    assert np.allclose(np.asarray(phiinv), 0.0)


@pytest.mark.parametrize("checkpoints", [False, True])
def test_expmap_checkpointing_matches(rng, checkpoints):
    """Checkpointed shooting must produce identical values and gradients to
    the default path (replaces the reference's buggy EPDiffStepsFunction,
    lddmm.py:47-70)."""
    dim = 2
    defsh = (1, dim) + (8,) * dim
    m = jnp.asarray(rng.standard_normal(defsh) * 0.1)
    metric = lm.FluidMetric([0.1, 0.0, 0.01])

    def loss(m, cp):
        h = lm.expmap(metric, m, num_steps=4, checkpoints=cp)
        return jnp.sum(h**2)

    v0, g0 = jax.value_and_grad(lambda m: loss(m, False))(m)
    v1, g1 = jax.value_and_grad(lambda m: loss(m, checkpoints))(m)
    assert np.allclose(float(v0), float(v1), rtol=1e-12)
    assert np.allclose(np.asarray(g0), np.asarray(g1), rtol=1e-10, atol=1e-12)


def test_expmap_gradcheck(rng):
    dim = 2
    defsh = (1, dim) + (4,) * dim
    m = jnp.asarray(rng.standard_normal(defsh) * 0.1)
    metric = lm.FluidMetric([0.1, 0.0, 0.01])
    check_grads(
        lambda m: lm.expmap(metric, m, num_steps=3),
        (m,),
        order=1,
        modes=["rev"],
        atol=2e-4,
        rtol=2e-4,
    )


def test_expmap_advect_close_to_integrated(rng):
    """For small momenta the advective and integrated EPDiff forms agree to
    first order."""
    dim = 2
    defsh = (1, dim) + (16,) * dim
    # note: sharp has gain ~1/gamma^2 = 1e4, so momenta must be tiny for the
    # resulting displacement to be in the linear regime
    m = jnp.asarray(rng.standard_normal(defsh) * 1e-7)
    metric = lm.FluidMetric([0.1, 0.0, 0.01])
    h1 = lm.expmap(metric, m, num_steps=10)
    h2 = lm.expmap_advect(metric, m, num_steps=10)
    scale = float(jnp.abs(h1).max())
    assert scale > 0
    assert float(jnp.abs(h1 - h2).max()) < 0.01 * scale


def test_expmap_jit_and_vmap(rng):
    """expmap composes with jit and vmap (functional-transform coverage the
    reference cannot express)."""
    dim = 2
    metric = lm.FluidMetric([0.1, 0.0, 0.01])
    m = jnp.asarray(rng.standard_normal((3, dim, 8, 8)) * 0.1)
    f = jax.jit(lambda m: lm.expmap(metric, m, num_steps=3))
    out = f(m)
    assert out.shape == m.shape
    # vmap over an extra leading axis
    mb = jnp.stack([m, 2 * m])
    outb = jax.vmap(f)(mb)
    assert np.allclose(np.asarray(outb[0]), np.asarray(out), atol=1e-6)


def test_deep_lddmm_gradient_flow(rng):
    """DeepLDDMMAtlas capability: gradients flow from an image-match loss
    through shooting into parameters that *predict* the momentum (reference
    demonstrates this in the unavailable DeepLDDMMAtlas notebook)."""
    dim = 2
    res = 8
    metric = lm.FluidMetric([0.1, 0.0, 0.01])
    I = jnp.asarray(rng.standard_normal((1, 1, res, res)))
    J = jnp.asarray(rng.standard_normal((1, 1, res, res)))
    W = jnp.asarray(rng.standard_normal((dim * res * res, res * res)) * 0.01)

    def loss(W):
        m = (W @ J.reshape(-1)).reshape(1, dim, res, res)
        h = lm.expmap(metric, m, num_steps=3)
        Idef = lm.interp(I, h)
        return jnp.sum((Idef - J) ** 2)

    g = jax.grad(loss)(W)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_expmap_peeled_first_step_exact(rng):
    """expmap peels the first integration step (closed form from phiinv=0);
    must be bit-identical to running every step through the scan."""
    import jax

    metric = lm.FluidMetric([0.1, 0.0, 0.01])
    m = jnp.asarray(rng.standard_normal((2, 2, 8, 8)) * 5e-4)

    def full_scan_expmap(m, N):
        phiinv = jnp.zeros_like(m)
        dt = 1.0 / N

        def step(p, _):
            return lm.EPDiff_step(metric, m, dt, p), None

        p, _ = jax.lax.scan(step, phiinv, None, length=N)
        return p

    for N in (1, 2, 5):
        a = lm.expmap(metric, m, num_steps=N)
        b = full_scan_expmap(m, N)
        assert np.array_equal(np.asarray(a), np.asarray(b)), N

    ga = jax.grad(lambda mm: jnp.sum(lm.expmap(metric, mm, num_steps=4) ** 2))(m)
    gb = jax.grad(lambda mm: jnp.sum(full_scan_expmap(mm, 4) ** 2))(m)
    assert np.array_equal(np.asarray(ga), np.asarray(gb))

    # sharing v0 with the regularizer is also exact
    v = metric.sharp(m)
    c = lm.expmap(metric, m, num_steps=3, v0=v)
    d = full_scan_expmap(m, 3)
    assert np.array_equal(np.asarray(c), np.asarray(d))


@pytest.mark.parametrize("B,beta", [(2, 0.0), (1, 0.0), (3, 0.01), (2, 0.01)])
def test_fluid_dft_matmul_matches_fft(rng, B, beta):
    """The (round-3 packed) matmul-DFT fluid path matches the FFT path to
    f32 tolerance across packing modes and stays numerically self-adjoint."""
    from lagomorph_tpu.ops import fluid

    metric = lm.FluidMetric([0.1, beta, 0.01])
    m = jnp.asarray(
        rng.standard_normal((B, 3, 8, 8, 8)), dtype=jnp.float32
    )
    ref_s = np.asarray(metric.sharp(m))
    ref_f = np.asarray(metric.flat(m))
    prev = fluid.set_fluid_dft(True)
    try:
        got_s = np.asarray(metric.sharp(m))
        got_f = np.asarray(metric.flat(m))
        x = jnp.asarray(rng.standard_normal((1, 3, 6, 6, 6)), dtype=jnp.float32)
        y = jnp.asarray(rng.standard_normal((1, 3, 6, 6, 6)), dtype=jnp.float32)
        lhs = float(jnp.sum(metric.sharp(x) * y))
        rhs = float(jnp.sum(x * metric.sharp(y)))
    finally:
        fluid.set_fluid_dft(prev)
    assert np.abs(got_s - ref_s).max() < 1e-5 * np.abs(ref_s).max()
    assert np.abs(got_f - ref_f).max() < 1e-5 * np.abs(ref_f).max()
    assert abs(lhs - rhs) < 1e-4 * abs(lhs)


def test_expmap_hoisted_dispatch_logic(rng, monkeypatch):
    """The hoisted-regime dispatch (TPU-only in production) is exercised on
    CPU by substituting the fused kernels with their exact XLA equivalents:
    in-regime momenta must match the general path via the fast scan, and
    out-of-regime momenta must fall back to the general tier."""
    import jax
    from lagomorph_tpu.ops.pallas import epdiff_unit as eu
    from lagomorph_tpu.ops import sampling, diff

    monkeypatch.setattr(eu, "ad_star_supported", lambda *a: True)
    monkeypatch.setattr(
        eu, "ad_star_unit_pallas",
        lambda p, m: diff.jacobian_times_vectorfield(
            p, sampling.sample_displacement_unit(m, p), displacement=True
        ),
    )
    monkeypatch.setattr(
        eu, "compose_disp_vel_pallas",
        lambda p, v, s: s * v + sampling.sample_displacement_unit(p, s * v),
    )

    metric = lm.FluidMetric([0.1, 0.0, 0.01])

    def general_expmap(m, N):
        dt = 1.0 / N
        phiinv = jnp.zeros_like(m)
        for _ in range(N):
            phiinv = lm.EPDiff_step(
                metric, m, dt, phiinv,
                transport_mode="general", compose_mode="general",
            )
        return phiinv

    # in regime: tiny momenta, the fast scan is taken
    m_small = jnp.asarray(rng.standard_normal((2, 2, 8, 8)) * 1e-4)
    got = lm.expmap(metric, m_small, num_steps=4)
    want = general_expmap(m_small, 4)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-12)

    # out of regime: large momenta, the validity flag must trigger the
    # general fallback (the fast path would produce wrong values)
    m_big = jnp.asarray(rng.standard_normal((2, 2, 8, 8)) * 5e-3)
    got = lm.expmap(metric, m_big, num_steps=4)
    want = general_expmap(m_big, 4)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-10)

    # gradients flow through the dispatch in both regimes
    for m in (m_small, m_big):
        g = jax.grad(lambda mm: jnp.sum(lm.expmap(metric, mm, num_steps=3) ** 2))(m)
        assert np.isfinite(np.asarray(g)).all()


def test_shooting_regime_ok_probe(rng):
    """The trajectory-validity probe: True for small (stable-regime)
    momenta, False when displacements exceed one voxel per substep."""
    import jax
    import jax.numpy as jnp
    from lagomorph_tpu.lddmm import shooting_regime_ok

    metric = lm.FluidMetric([0.1, 0.0, 0.01])
    small = jnp.asarray(
        rng.standard_normal((1, 3, 12, 12, 12)) * 1e-6, dtype=jnp.float32
    )
    big = jnp.asarray(
        rng.standard_normal((1, 3, 12, 12, 12)) * 50.0, dtype=jnp.float32
    )
    assert bool(jax.jit(
        lambda m: shooting_regime_ok(metric, m, num_steps=3))(small))
    assert not bool(jax.jit(
        lambda m: shooting_regime_ok(metric, m, num_steps=3))(big))


def test_expmap_hoisted_dispatch_2d_branch(rng, monkeypatch):
    """The 2D fused-kernel branch of the hoisted dispatch (epdiff2d) is
    selected when 3D support is absent, and produces the general-path
    result via the same validity-flag scheme (kernels substituted with
    their exact XLA equivalents on CPU)."""
    import jax
    from lagomorph_tpu.ops.pallas import epdiff_unit as eu
    from lagomorph_tpu.ops.pallas import epdiff2d as e2
    from lagomorph_tpu.ops import sampling, diff

    monkeypatch.setattr(eu, "ad_star_supported", lambda *a: False)
    monkeypatch.setattr(eu, "compose_supported", lambda *a: False)
    monkeypatch.setattr(e2, "supported", lambda *a: True)
    monkeypatch.setattr(
        e2, "ad_star2d_pallas",
        lambda p, m: diff.jacobian_times_vectorfield(
            p, sampling.sample_displacement_unit(m, p), displacement=True
        ),
    )
    monkeypatch.setattr(
        e2, "compose2d_pallas",
        lambda p, v, s: s * v + sampling.sample_displacement_unit(p, s * v),
    )

    metric = lm.FluidMetric([0.1, 0.0, 0.01])

    def general_expmap(m, N):
        dt = 1.0 / N
        phiinv = jnp.zeros_like(m)
        for _ in range(N):
            phiinv = lm.EPDiff_step(
                metric, m, dt, phiinv,
                transport_mode="general", compose_mode="general",
            )
        return phiinv

    for scale, atol in ((1e-4, 1e-12), (5e-3, 1e-10)):
        m = jnp.asarray(rng.standard_normal((2, 2, 8, 8)) * scale)
        got = lm.expmap(metric, m, num_steps=4)
        want = general_expmap(m, 4)
        assert np.allclose(np.asarray(got), np.asarray(want), atol=atol)

    # Ad_star / compose call-site dispatch also routes through the 2D pair
    from lagomorph_tpu import adjrep, deform

    p = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 2, 8, 8)))
    m = jnp.asarray(rng.standard_normal((2, 2, 8, 8)))
    want = diff.jacobian_times_vectorfield(
        p, sampling.sample_displacement_unit(m, p), displacement=True
    )
    got = adjrep.Ad_star(p, m)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-12)
    got = deform.compose_disp_vel(p, m, dt=0.2)
    want = 0.2 * m + sampling.sample_displacement_unit(p, 0.2 * m)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-12)
