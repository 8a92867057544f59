"""Mesh/sharding tests on the virtual 8-device CPU mesh: batch sharding
propagates through jitted shooting, replicated-vs-sharded outputs match, and
the parallel helpers behave."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

import lagomorph_tpu as lm
from lagomorph_tpu.parallel import (
    get_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    pad_batch_to_multiple,
)


def test_mesh_has_8_devices():
    mesh = get_mesh()
    assert mesh.devices.size == 8


def test_shard_batch_and_replicate(rng):
    mesh = get_mesh()
    x = rng.standard_normal((8, 2, 4, 4)).astype(np.float32)
    xs = shard_batch(x, mesh)
    assert xs.sharding.spec == P("data")
    xr = replicate(jnp.zeros((1, 1, 4, 4)), mesh)
    assert xr.sharding.spec == P()


def test_pad_batch_to_multiple(rng):
    x = rng.standard_normal((5, 3))
    padded, n = pad_batch_to_multiple(x, 8)
    assert padded.shape[0] == 8 and n == 5
    assert np.allclose(padded[:5], x)
    assert np.allclose(padded[5:], x[-1])


def test_sharded_expmap_matches_replicated(rng):
    """Jitted shooting on batch-sharded momenta gives identical results to
    unsharded execution, and the output stays batch-sharded (no implicit
    gather)."""
    mesh = get_mesh()
    metric = lm.FluidMetric([0.1, 0.0, 0.01])
    m = rng.standard_normal((8, 2, 8, 8)).astype(np.float32) * 0.1

    f = jax.jit(lambda m: lm.expmap(metric, m, num_steps=3))
    ref = np.asarray(f(jnp.asarray(m)))

    ms = shard_batch(m, mesh)
    out = f(ms)
    assert out.sharding.spec == P("data"), out.sharding
    assert np.allclose(np.asarray(out), ref, atol=1e-6)


def test_sharded_atlas_step_gradients(rng):
    """A full atlas step over the mesh: image grad (replicated) equals the
    single-device result; GSPMD inserts the cross-device psum."""
    from lagomorph_tpu.lddmm import make_lddmm_atlas_step

    mesh = get_mesh()
    metric = lm.FluidMetric([0.01, 0.0, 0.1])
    step = make_lddmm_atlas_step(metric, reg_weight=0.1, learning_rate_pose=1e-3,
                                 integration_steps=2)
    I = rng.standard_normal((1, 1, 8, 8)).astype(np.float32)
    m = rng.standard_normal((8, 2, 8, 8)).astype(np.float32) * 0.01
    img = rng.standard_normal((8, 1, 8, 8)).astype(np.float32)

    jf = jax.jit(step)
    m0, gI0, loss0, reg0 = jf(jnp.asarray(I), jnp.asarray(m), jnp.asarray(img))

    bs = data_sharding(mesh)
    rs = replicated_sharding(mesh)
    jfs = jax.jit(step, in_shardings=(rs, bs, bs), out_shardings=(bs, rs, rs, rs))
    m1, gI1, loss1, reg1 = jfs(
        replicate(jnp.asarray(I), mesh),
        shard_batch(m, mesh),
        shard_batch(img, mesh),
    )
    assert np.allclose(np.asarray(m0), np.asarray(m1), atol=1e-5)
    assert np.allclose(np.asarray(gI0), np.asarray(gI1), atol=1e-4)
    assert np.isclose(float(loss0), float(loss1), rtol=1e-5)
    assert np.isclose(float(reg0), float(reg1), rtol=1e-5)


def test_spatial_sharding_expmap_matches(rng):
    """Spatial (grid) sharding: momenta sharded along the first spatial axis
    run through jitted shooting with identical results — XLA inserts the
    halo exchanges and FFT reshards."""
    from lagomorph_tpu.parallel import spatial_sharding

    mesh = get_mesh()
    metric = lm.FluidMetric([0.1, 0.0, 0.01])
    m = rng.standard_normal((2, 2, 16, 16)).astype(np.float32) * 0.1

    f = jax.jit(lambda m: lm.expmap(metric, m, num_steps=3))
    ref = np.asarray(f(jnp.asarray(m)))

    ss = spatial_sharding(mesh, ndim=4, spatial_axis=0)
    ms = jax.device_put(m, ss)
    out = f(ms)
    assert np.allclose(np.asarray(out), ref, atol=1e-6)


def test_spatial_sharding_atlas_loss_grads(rng):
    """Full loss+grads with spatially sharded fields matches replicated."""
    from lagomorph_tpu.parallel import spatial_sharding

    mesh = get_mesh()
    metric = lm.FluidMetric([0.01, 0.0, 0.1])

    def loss(I, m, img):
        h = lm.expmap(metric, m, num_steps=2)
        Idef = lm.interp(I, h)
        v = metric.sharp(m)
        return jnp.sum((Idef - img) ** 2) / img.size + 0.1 * jnp.sum(v * m) / img.size

    I = rng.standard_normal((1, 1, 16, 16)).astype(np.float32)
    m = rng.standard_normal((2, 2, 16, 16)).astype(np.float32) * 0.01
    img = rng.standard_normal((2, 1, 16, 16)).astype(np.float32)

    g = jax.jit(jax.grad(loss, argnums=(0, 1)))
    ref = g(jnp.asarray(I), jnp.asarray(m), jnp.asarray(img))

    ss4 = spatial_sharding(mesh, ndim=4, spatial_axis=0)
    got = g(
        jax.device_put(I, ss4),
        jax.device_put(m, ss4),
        jax.device_put(img, ss4),
    )
    for a, b in zip(got, ref):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_sharded_fluid_operator_matches_dense(rng):
    """The transpose-decomposed distributed rFFT fluid operator equals the
    dense (single-device) operator on an X-sharded field."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from lagomorph_tpu.parallel import (
        get_mesh, sharded_fluid_operator, ShardedFluidMetric,
    )
    from lagomorph_tpu.ops.fluid import fluid_operator

    mesh = get_mesh()
    n = mesh.devices.size
    X = Y = Z = 2 * n
    params = (0.1, 0.0, 0.01)
    m = jnp.asarray(rng.standard_normal((2, 3, X, Y, Z)), dtype=jnp.float32)
    ms = jax.device_put(m, NamedSharding(mesh, P(None, None, "data")))

    for inverse in (True, False):
        want = np.asarray(fluid_operator(m, params, inverse))
        got = np.asarray(
            jax.jit(
                lambda x: sharded_fluid_operator(x, params, inverse, mesh)
            )(ms)
        )
        scale = np.abs(want).max()
        assert np.abs(got - want).max() < 1e-5 * scale, (
            inverse, np.abs(got - want).max(), scale
        )

    # self-adjointness of the sharded operator (custom VJP contract)
    metric = ShardedFluidMetric(params, mesh)
    x = jax.device_put(
        jnp.asarray(rng.standard_normal((1, 3, X, Y, Z)), dtype=jnp.float32),
        NamedSharding(mesh, P(None, None, "data")),
    )
    y = jax.device_put(
        jnp.asarray(rng.standard_normal((1, 3, X, Y, Z)), dtype=jnp.float32),
        NamedSharding(mesh, P(None, None, "data")),
    )
    lhs = float(jnp.sum(metric.sharp(x) * y))
    rhs = float(jnp.sum(x * metric.sharp(y)))
    assert abs(lhs - rhs) < 1e-4 * abs(lhs)

    # gradients flow (the VJP re-applies the operator)
    g = jax.grad(lambda m_: float(0) + jnp.sum(metric.sharp(m_) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_sharded_expmap_with_sharded_metric(rng):
    """Full geodesic shooting with the ShardedFluidMetric on an X-sharded
    momentum field matches dense shooting."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    import lagomorph_tpu as lm
    from lagomorph_tpu.parallel import get_mesh, ShardedFluidMetric

    mesh = get_mesh()
    n = mesh.devices.size
    X = Y = Z = 2 * n
    m = jnp.asarray(
        rng.standard_normal((1, 3, X, Y, Z)) * 1e-4, dtype=jnp.float32
    )
    dense = lm.FluidMetric([0.1, 0.0, 0.01])
    shmet = ShardedFluidMetric((0.1, 0.0, 0.01), mesh)

    want = np.asarray(lm.expmap(dense, m, num_steps=3))
    ms = jax.device_put(m, NamedSharding(mesh, P(None, None, "data")))
    got = np.asarray(jax.jit(lambda x: lm.expmap(shmet, x, num_steps=3))(ms))
    scale = max(np.abs(want).max(), 1e-30)
    assert np.abs(got - want).max() < 1e-5 * scale


def test_halo_sharded_expmap_matches_dense(rng):
    """The communication-efficient shard_map shooting (explicit 1-voxel halo
    ppermutes + distributed rFFT; parallel/sharded_epdiff.py) matches dense
    shooting to f32 roundoff, including gradients."""
    from lagomorph_tpu.parallel import get_mesh, sharded_expmap

    mesh = get_mesh()
    n = mesh.devices.size
    X = Y = Z = 2 * n
    dense = lm.FluidMetric([0.1, 0.0, 0.01])
    m = jnp.asarray(rng.standard_normal((2, 3, X, Y, Z)) * 1e-3,
                    dtype=jnp.float32)

    want = np.asarray(jax.jit(
        lambda x: lm.expmap(dense, x, num_steps=4,
                            transport_mode="unit", compose_mode="unit")
    )(m))
    got = np.asarray(jax.jit(
        lambda x: sharded_expmap(dense, x, mesh, num_steps=4)
    )(m))
    scale = max(np.abs(want).max(), 1e-30)
    assert np.abs(got - want).max() < 1e-5 * scale

    # gradients through the halo exchanges and the distributed FFT
    g = jax.jit(jax.grad(
        lambda x: jnp.sum(sharded_expmap(dense, x, mesh, num_steps=3) ** 2)
    ))(m)
    gref = jax.jit(jax.grad(
        lambda x: jnp.sum(lm.expmap(dense, x, num_steps=3,
                                    transport_mode="unit",
                                    compose_mode="unit") ** 2)
    ))(m)
    gs = max(float(jnp.abs(gref).max()), 1e-30)
    assert float(jnp.abs(g - gref).max()) / gs < 1e-5


def test_halo_sharded_atlas_loss_matches_dense(rng):
    """sharded_atlas_loss (X-sharded shooting + warp + loss end to end)
    equals the dense _lddmm_loss value and momentum gradient."""
    from lagomorph_tpu.lddmm import _lddmm_loss
    from lagomorph_tpu.parallel import get_mesh, sharded_atlas_loss

    mesh = get_mesh()
    n = mesh.devices.size
    X = Y = Z = 2 * n
    dense = lm.FluidMetric([0.1, 0.0, 0.01])
    m = jnp.asarray(rng.standard_normal((2, 3, X, Y, Z)) * 1e-3,
                    dtype=jnp.float32)
    I = jnp.asarray(rng.standard_normal((1, 1, X, Y, Z)), dtype=jnp.float32)
    img = jnp.asarray(rng.standard_normal((2, 1, X, Y, Z)), dtype=jnp.float32)

    want_l, want_r = jax.jit(
        lambda I, m, img: _lddmm_loss(I, m, img, dense, 0.5, 4, False)
    )(I, m, img)
    got_l, got_r = jax.jit(
        lambda I, m, img: sharded_atlas_loss(
            dense, I, m, img, mesh, reg_weight=0.5, num_steps=4)
    )(I, m, img)
    assert np.isclose(float(got_l), float(want_l), rtol=1e-5)
    assert np.isclose(float(got_r), float(want_r), rtol=1e-4)

    g = jax.jit(jax.grad(lambda m: sharded_atlas_loss(
        dense, I, m, img, mesh, reg_weight=0.5, num_steps=4)[0]))(m)
    gref = jax.jit(jax.grad(
        lambda m: _lddmm_loss(I, m, img, dense, 0.5, 4, False)[0]))(m)
    gs = max(float(jnp.abs(gref).max()), 1e-30)
    assert float(jnp.abs(g - gref).max()) / gs < 1e-5


def test_spatial_shard_atlas_builder_matches_dense(rng):
    """LDDMMAtlasBuilder(spatial_shard=True): the X-sharded loss/step wired
    end to end through the builder (VERDICT r3 #6) reproduces the dense
    single-device builder — atlas image, momenta, and loss curves — to
    distributed-FFT f32 roundoff."""
    from lagomorph_tpu.data import MemoryDataset
    from lagomorph_tpu.lddmm import LDDMMAtlasBuilder
    from lagomorph_tpu.parallel import get_mesh

    mesh = get_mesh()
    n = mesh.devices.size
    X = Y = 2 * n
    Z = 8
    imgs = rng.standard_normal((6, 1, X, Y, Z)).astype(np.float32)
    ds = MemoryDataset([imgs[i] for i in range(len(imgs))],
                       progress_bar=False)
    # NB: the sharded loss's halo exchange covers displacements up to
    # num_steps voxels (its documented regime).  gamma=1 keeps the metric
    # gain <= 1 so the gradient-shaped momenta stay deep inside that
    # regime — with gamma=0.01 (gain ~100x) this config's updates produce
    # ~5-voxel deformations and the dense/sharded paths legitimately
    # diverge (outside the contract, and unstable training anyway).
    kw = dict(
        num_epochs=2, batch_size=3, lddmm_integration_steps=3,
        reg_weight=0.5, learning_rate_pose=1e-3, learning_rate_image=1e-2,
        metric=lm.FluidMetric([0.1, 0.0, 1.0]), progress_bar=False,
    )
    dense = LDDMMAtlasBuilder(ds, **kw)
    dense.run()
    spat = LDDMMAtlasBuilder(ds, mesh=mesh, spatial_shard=True, **kw)
    spat.run()

    # per-loss agreement is 1e-5 (test_halo_sharded_atlas_loss_matches_dense);
    # across 2 epochs of momenta+image updates the distributed-FFT roundoff
    # accumulates, so the end-state comparison is correspondingly looser
    assert np.allclose(np.asarray(spat.I), np.asarray(dense.I),
                       rtol=1e-2, atol=1e-3)
    for ms, md in zip(spat.ms, dense.ms):
        assert np.allclose(np.asarray(ms), np.asarray(md),
                           rtol=1e-2, atol=1e-5)
    assert np.allclose(spat.epoch_losses, dense.epoch_losses, rtol=1e-4)


def test_spatial_shard_builder_guards():
    """spatial_shard input validation: mesh required; regrid unsupported."""
    import pytest
    from lagomorph_tpu.data import MemoryDataset
    from lagomorph_tpu.lddmm import LDDMMAtlasBuilder
    from lagomorph_tpu.parallel import get_mesh

    imgs = np.zeros((2, 1, 16, 16, 8), np.float32)
    ds = MemoryDataset([imgs[i] for i in range(2)], progress_bar=False)
    with pytest.raises(ValueError, match="requires a mesh"):
        LDDMMAtlasBuilder(ds, spatial_shard=True, num_epochs=1,
                          progress_bar=False).initialize()
    with pytest.raises(ValueError, match="same"):
        LDDMMAtlasBuilder(ds, spatial_shard=True, mesh=get_mesh(),
                          momentum_shape=(8, 8, 4), num_epochs=1,
                          progress_bar=False).initialize()
