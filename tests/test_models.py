"""Model-family tests: pairwise registration and DeepLDDMMAtlas."""
import numpy as np
import jax.numpy as jnp
import pytest

import lagomorph_tpu as lm
from lagomorph_tpu.models import (
    affine_register,
    rigid_register,
    lddmm_register,
    DeepLDDMMAtlas,
)
from tests.test_atlas import make_synth_images


def _blob(res, center, width):
    g = np.stack(np.meshgrid(*[np.arange(res, dtype=np.float64)] * 2, indexing="ij"))
    r2 = sum((g[d] - center[d]) ** 2 for d in range(2))
    return np.exp(-r2 / (2 * width**2)).astype(np.float32)


def test_affine_register_recovers_translation():
    res = 16
    c = (res - 1) / 2
    src = _blob(res, (c, c), res / 6)[None, None]
    tgt = _blob(res, (c + 1.5, c - 1.0), res / 6)[None, None]
    A, T, losses = affine_register(
        jnp.asarray(src), jnp.asarray(tgt), num_iters=300,
        learning_rate_A=0.0, learning_rate_T=50.0,
    )
    assert float(losses[-1]) < float(losses[0]) * 0.2
    # out(x) = I(A(x-o)+T+o): to match a target shifted by +d, T ≈ -d
    assert np.allclose(np.asarray(T)[0], [-1.5, 1.0], atol=0.3), np.asarray(T)


def test_rigid_register_runs():
    res = 16
    c = (res - 1) / 2
    src = _blob(res, (c - 2, c), res / 8)[None, None]
    tgt = src.copy()
    v, T, losses = rigid_register(
        jnp.asarray(src), jnp.asarray(tgt), num_iters=50
    )
    assert float(losses[-1]) <= float(losses[0]) + 1e-8
    assert np.isfinite(np.asarray(v)).all()


def test_lddmm_register_reduces_loss():
    res = 16
    c = (res - 1) / 2
    src = _blob(res, (c, c), res / 5)[None, None]
    tgt = _blob(res, (c + 1.0, c), res / 5)[None, None]
    metric = lm.FluidMetric([0.01, 0.0, 0.1])
    m, phiinv, losses = lddmm_register(
        jnp.asarray(src),
        jnp.asarray(tgt),
        metric,
        num_iters=50,
        learning_rate=2e-1,
        reg_weight=1e-3,
        integration_steps=3,
    )
    assert float(losses[-1]) < float(losses[0]) * 0.7
    assert phiinv.shape == (1, 2, res, res)


def test_deep_lddmm_atlas_trains(rng):
    imgs = make_synth_images(rng, n=6, res=12)
    model = DeepLDDMMAtlas(
        list(imgs),
        metric=lm.FluidMetric([0.01, 0.0, 0.1]),
        batch_size=3,
        integration_steps=2,
        reg_weight=1e-2,
        learning_rate_net=1e-3,
        learning_rate_image=10.0,
        progress_bar=False,
    )
    model.fit(num_epochs=3)
    assert len(model.epoch_losses) == 3
    assert model.epoch_losses[-1] < model.epoch_losses[0]
    m = model.predict_momenta(imgs[:2])
    assert m.shape == (2, 2, 12, 12)
    Idef = model.deform_atlas(imgs[:2])
    assert Idef.shape == (2, 1, 12, 12)


def test_deep_lddmm_atlas_mesh_uneven_batch(rng):
    """With a mesh, a dataset size not divisible by batch*devices must train
    via the pad+mask path (regression: the final uneven batch used to raise)."""
    from lagomorph_tpu.parallel import get_mesh

    imgs = make_synth_images(rng, n=7, res=12)  # 7 % (8 devices) != 0
    model = DeepLDDMMAtlas(
        list(imgs),
        metric=lm.FluidMetric([0.01, 0.0, 0.1]),
        batch_size=4,  # batches of 4 and 3
        integration_steps=2,
        reg_weight=1e-2,
        learning_rate_net=1e-3,
        learning_rate_image=10.0,
        mesh=get_mesh(),
        progress_bar=False,
    )
    model.fit(num_epochs=2)
    assert len(model.epoch_losses) == 2
    assert np.isfinite(model.epoch_losses[-1])


def test_rigid_register_3d(rng):
    """3D rigid registration via the Rodrigues exp map (the 2D-only
    restriction was a round-2 seam; reference affine.py:120-138 is 2D-only
    and raises for 3D)."""
    import jax
    from lagomorph_tpu.ops.affine import affine_interp
    from lagomorph_tpu.affine import rotation_exp_map

    res = 12
    g = np.stack(
        np.meshgrid(*([np.arange(res)] * 3), indexing="ij"), axis=0
    ).astype(np.float64)
    c = (res - 1) / 2
    # off-center anisotropic blob so rotation changes the image
    src = np.exp(
        -(
            (g[0] - c + 2.0) ** 2 / 8.0
            + (g[1] - c) ** 2 / 3.0
            + (g[2] - c) ** 2 / 5.0
        )
    )[None, None]
    v_true = jnp.asarray([[0.0, 0.0, 0.15]])
    T_true = jnp.asarray([[0.0, 0.5, -0.3]])
    tgt = affine_interp(jnp.asarray(src), rotation_exp_map(v_true), T_true)
    v, T, losses = rigid_register(
        jnp.asarray(src), tgt, num_iters=600,
        learning_rate_v=10.0, learning_rate_T=10.0,
    )
    assert v.shape == (1, 3) and T.shape == (1, 3)
    assert float(losses[-1]) < float(losses[0]) * 0.01, (
        float(losses[0]), float(losses[-1])
    )
    assert abs(float(v[0, 2]) - 0.15) < 0.05, np.asarray(v)
