"""The unit-displacement fast path must be exactly equivalent to the
general gather path (values and gradients), in and out of its regime."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import lagomorph_tpu as lm
from lagomorph_tpu.ops.interp import interp, interp_auto
from lagomorph_tpu.ops.sampling import sample_displacement_unit, identity_grid


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("nc", [1, 3])
def test_unit_path_matches_general(rng, dim, nc):
    sp = (6,) * dim
    I = jnp.asarray(rng.standard_normal((2, nc) + sp))
    # displacements spanning the whole valid range, incl. exactly -1 and
    # values near +1, at boundary voxels
    d = jnp.asarray(rng.uniform(-1.0, 0.999, (2, dim) + sp))
    fast = sample_displacement_unit(I, d)
    ref = interp(I, d, dt=1.0)
    assert np.allclose(np.asarray(fast), np.asarray(ref), atol=1e-13)


@pytest.mark.parametrize("dim", [2, 3])
def test_unit_path_gradients_match(rng, dim):
    sp = (5,) * dim
    I = jnp.asarray(rng.standard_normal((1, 2) + sp))
    d = jnp.asarray(rng.uniform(-0.999, 0.999, (1, dim) + sp))

    def loss_fast(I, d):
        return jnp.sum(jnp.sin(sample_displacement_unit(I, d)))

    def loss_ref(I, d):
        return jnp.sum(jnp.sin(interp(I, d, dt=1.0)))

    gf = jax.grad(loss_fast, argnums=(0, 1))(I, d)
    gr = jax.grad(loss_ref, argnums=(0, 1))(I, d)
    for a, b in zip(gf, gr):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_interp_auto_switches(rng):
    sp = (6, 6)
    I = jnp.asarray(rng.standard_normal((1, 1) + sp))
    small = jnp.asarray(rng.uniform(-0.9, 0.9, (1, 2) + sp))
    big = small * 5.0
    for u in (small, big):
        got = interp_auto(I, u)
        ref = interp(I, u)
        assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-13)


def test_interp_auto_broadcast_and_grad(rng):
    sp = (5, 5)
    I = jnp.asarray(rng.standard_normal((1, 2) + sp))
    u = jnp.asarray(rng.uniform(-0.8, 0.8, (3, 2) + sp))
    got = interp_auto(I, u)
    ref = interp(I, u)
    assert got.shape == (3, 2, 5, 5)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-13)
    g1 = jax.grad(lambda I: jnp.sum(interp_auto(I, u) ** 2))(I)
    g2 = jax.grad(lambda I: jnp.sum(interp(I, u) ** 2))(I)
    assert np.allclose(np.asarray(g1), np.asarray(g2), atol=1e-12)


def test_compose_uses_fast_path_and_matches(rng):
    """compose via interp_auto equals the pre-optimization formula."""
    sp = (8, 8)
    u = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 2) + sp))
    v = jnp.asarray(rng.standard_normal((2, 2) + sp))
    got = lm.compose_disp_vel(v, u, dt=-0.2)
    ref = -0.2 * u + interp(v, u, dt=-0.2)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-13)


def test_expmap_unchanged_by_fast_path(rng):
    """End-to-end: expmap with the fast compose equals a manual expmap
    built on the general interp only."""
    from lagomorph_tpu import adjrep
    from lagomorph_tpu.metric import FluidMetric

    metric = FluidMetric([0.1, 0.0, 0.01])
    m0 = jnp.asarray(rng.standard_normal((1, 2, 12, 12)) * 0.05)

    phiinv = jnp.zeros_like(m0)
    dt = 1.0 / 5
    for _ in range(5):
        m = adjrep.Ad_star(phiinv, m0)
        v = metric.sharp(m)
        phiinv = -dt * v + interp(phiinv, v, dt=-dt)
    ref = phiinv

    got = lm.expmap(metric, m0, num_steps=5)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-10)


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("radius", [1, 3])
def test_bounded_path_matches_general(rng, dim, radius):
    from lagomorph_tpu.ops.sampling import sample_displacement_bounded

    sp = (7,) * dim
    I = jnp.asarray(rng.standard_normal((2, 2) + sp))
    d = jnp.asarray(rng.uniform(-radius, radius + 0.999, (2, dim) + sp))
    fast = sample_displacement_bounded(I, d, radius)
    ref = interp(I, d, dt=1.0)
    assert np.allclose(np.asarray(fast), np.asarray(ref), atol=1e-12)


@pytest.mark.parametrize("radius", [1, 2])
def test_bounded_path_gradients_match(rng, radius):
    from lagomorph_tpu.ops.sampling import sample_displacement_bounded

    sp = (6, 6)
    I = jnp.asarray(rng.standard_normal((2, 2) + sp))
    d = jnp.asarray(rng.uniform(-radius, radius + 0.999, (2, 2) + sp))

    gf = jax.grad(
        lambda I, d: jnp.sum(jnp.sin(sample_displacement_bounded(I, d, radius))),
        argnums=(0, 1),
    )(I, d)
    gr = jax.grad(
        lambda I, d: jnp.sum(jnp.sin(interp(I, d, dt=1.0))), argnums=(0, 1)
    )(I, d)
    for a, b in zip(gf, gr):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-11)


def test_bounded_path_broadcast_grad(rng):
    from lagomorph_tpu.ops.sampling import sample_displacement_bounded

    sp = (6, 6)
    I = jnp.asarray(rng.standard_normal((1, 1) + sp))
    d = jnp.asarray(rng.uniform(-2, 2.9, (3, 2) + sp))
    fast = sample_displacement_bounded(I, d, 3)
    ref = interp(I, d, dt=1.0)
    assert np.allclose(np.asarray(fast), np.asarray(ref), atol=1e-12)
    g1 = jax.grad(lambda I: jnp.sum(sample_displacement_bounded(I, d, 3) ** 2))(I)
    g2 = jax.grad(lambda I: jnp.sum(interp(I, d) ** 2))(I)
    assert np.allclose(np.asarray(g1), np.asarray(g2), atol=1e-11)


def test_interp_auto_tier2(rng):
    sp = (8, 8)
    I = jnp.asarray(rng.standard_normal((1, 1) + sp))
    u = jnp.asarray(rng.uniform(-3.5, 3.5, (1, 2) + sp))  # tier 2 regime
    got = interp_auto(I, u)
    ref = interp(I, u)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-12)
    g1 = jax.grad(lambda u: jnp.sum(interp_auto(I, u) ** 3))(u)
    g2 = jax.grad(lambda u: jnp.sum(interp(I, u) ** 3))(u)
    assert np.allclose(np.asarray(g1), np.asarray(g2), atol=1e-10)


def test_interp_auto_static_mode_override(rng):
    """Per-call mode= overrides compile the forced tier and match auto."""
    sp = (6, 6)
    I = jnp.asarray(rng.standard_normal((2, 1) + sp))
    small = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 2) + sp))
    mid = jnp.asarray(rng.uniform(-1.9, 1.9, (2, 2) + sp))
    ref_small = interp(I, small)
    ref_mid = interp(I, mid)
    assert np.allclose(interp_auto(I, small, mode="unit"), ref_small, atol=1e-13)
    assert np.allclose(interp_auto(I, small, mode="general"), ref_small, atol=1e-13)
    assert np.allclose(interp_auto(I, mid, mode="bounded"), ref_mid, atol=1e-13)
    with pytest.raises(ValueError):
        interp_auto(I, small, mode="warp-speed")


def test_expmap_static_modes_match_auto(rng):
    """Static transport/compose modes give the same shooting result as the
    runtime-tiered path, values and gradients."""
    sp = (8, 8)
    metric = lm.FluidMetric([0.1, 0.0, 0.01])
    # static modes are only exact inside their regime: per-substep
    # displacement < 1 voxel (unit compose) and total deformation < 3
    # voxels (bounded transport); this scale gives max|v| ~ 1, max|h| ~ 1
    m = jnp.asarray(rng.standard_normal((2, 2) + sp) * 5e-4)

    def loss(m, tm, cm):
        h = lm.expmap(metric, m, num_steps=4, transport_mode=tm, compose_mode=cm)
        return jnp.sum(h * h), h

    (l0, h0), g0 = jax.value_and_grad(loss, has_aux=True)(m, None, None)
    (l1, h1), g1 = jax.value_and_grad(loss, has_aux=True)(m, "bounded", "unit")
    assert np.allclose(np.asarray(h0), np.asarray(h1), atol=1e-12)
    assert np.allclose(float(l0), float(l1), atol=1e-12)
    assert np.allclose(np.asarray(g0), np.asarray(g1), atol=1e-12)


def test_lddmm_register_static_modes(rng):
    """lddmm_register with static warp modes matches the auto-tier result."""
    from lagomorph_tpu.models import lddmm_register

    sp = (8, 8)
    metric = lm.FluidMetric([0.1, 0.0, 0.01])
    src = jnp.asarray(rng.standard_normal((1, 1) + sp))
    tgt = jnp.asarray(rng.standard_normal((1, 1) + sp))
    m_a, h_a, loss_a = lddmm_register(src, tgt, metric, num_iters=3)
    m_s, h_s, loss_s = lddmm_register(
        src, tgt, metric, num_iters=3,
        transport_mode="bounded", compose_mode="unit",
    )
    assert np.allclose(np.asarray(m_a), np.asarray(m_s), atol=1e-10)
    assert np.allclose(np.asarray(loss_a), np.asarray(loss_s), atol=1e-10)


def test_pad_amounts_geometry():
    """_pad_amounts must return kernel-compatible padded geometries."""
    from lagomorph_tpu.ops.pallas import warp_unit as wu

    for X, Y, Z in ((96, 96, 96), (40, 96, 160), (24, 36, 40), (64, 64, 64),
                    (17, 19, 23), (128, 128, 128), (8, 2, 2)):
        amounts = wu._pad_amounts(X, Y, Z)
        assert amounts is not None, (X, Y, Z)
        px, py, pz, whole_y = amounts
        Xp, Yp, Zp = X + px, Y + py, Z + pz
        assert Xp % 8 == 0
        if whole_y:
            assert (Yp * Zp) % 128 == 0
            assert Yp * Zp <= 8192
        else:
            assert Zp % 128 == 0
            assert wu._pick_by(Yp, Zp) != 0


def test_fold_unpad_is_edge_pad_transpose(rng):
    """_fold_unpad must equal the transpose of end-edge-padding for
    cotangents whose mass lies within one plane past each edge (the reach
    of a |tap| <= 1 stencil)."""
    import jax
    from lagomorph_tpu.ops.pallas.warp_unit import _fold_unpad

    X, Y, Z = 5, 6, 7
    px, py, pz = 3, 2, 5
    x0 = jnp.asarray(rng.standard_normal((2, 3, X, Y, Z)))
    widths = [(0, 0), (0, 0), (0, px), (0, py), (0, pz)]
    _, vjp = jax.vjp(lambda a: jnp.pad(a, widths, mode="edge"), x0)

    d = np.zeros((2, 3, X + px, Y + py, Z + pz))
    d[:, :, : X + 1, : Y + 1, : Z + 1] = rng.standard_normal(
        (2, 3, X + 1, Y + 1, Z + 1)
    )
    d = jnp.asarray(d)
    expected = np.asarray(vjp(d)[0])
    got = np.asarray(_fold_unpad(d, X, Y, Z))
    assert np.allclose(got, expected, atol=1e-12)


def test_set_warp_mode_general_skips_fused_dispatch(rng, monkeypatch):
    """The global set_warp_mode() escape hatch must also disable the fused
    Pallas/cond dispatch in Ad_star, compose, and expmap's hoisted path
    (round-2 advisor finding): after set_warp_mode('general') the general
    tier runs even where the fused kernels would be supported."""
    from lagomorph_tpu.ops import set_warp_mode
    from lagomorph_tpu.ops.pallas import epdiff_unit as _eu
    from lagomorph_tpu import adjrep, deform
    from lagomorph_tpu.lddmm import expmap

    def boom(*a, **k):
        raise AssertionError("fused Pallas path dispatched under 'general'")

    # pretend the fused kernels are supported (they are not on CPU) and make
    # any attempt to trace them fail loudly
    monkeypatch.setattr(_eu, "ad_star_supported", lambda *a: True)
    monkeypatch.setattr(_eu, "compose_supported", lambda *a: True)
    monkeypatch.setattr(_eu, "ad_star_unit_pallas", boom)
    monkeypatch.setattr(_eu, "compose_disp_vel_pallas", boom)

    sp = (6, 6, 6)
    phiinv = jnp.asarray(0.3 * rng.standard_normal((1, 3) + sp))
    m = jnp.asarray(rng.standard_normal((1, 3) + sp))
    metric = lm.FluidMetric([0.1, 0.0, 0.01])

    prev = set_warp_mode("general")
    try:
        adjrep.Ad_star(phiinv, m)               # must not touch boom
        deform.compose(phiinv, m)               # must not touch boom
        expmap(metric, m, num_steps=3)          # hoisted path must be skipped
    finally:
        set_warp_mode(prev)

    # sanity: under the default auto mode the (mocked) fused path IS taken
    with pytest.raises(AssertionError, match="fused Pallas path"):
        adjrep.Ad_star(phiinv, m)
