"""Affine op tests (reference: testing/test_affine.py): identity transform
no-op, gradchecks, 2D-in-3D consistency, inverse round-trips, regrid
identities, plus scipy affine_transform cross-check."""
import numpy as np
import jax.numpy as jnp
import pytest
from jax.test_util import check_grads

import lagomorph_tpu as lm
from lagomorph_tpu.affine import affine_interp, regrid, affine_inverse, rotation_exp_map, rigid_inverse

res = 2
dims = [2, 3]
channels = [1, 2, 4]
batch_sizes = [1, 2]
TF = [True, False]


@pytest.mark.parametrize("bs", batch_sizes)
@pytest.mark.parametrize("dim", dims)
@pytest.mark.parametrize("nc", channels)
def test_affine_interp_identity(rng, bs, dim, nc):
    """Identity transform is an exact no-op (reference test_affine.py:30-40)."""
    imsh = (bs, nc) + (res,) * dim
    I = jnp.asarray(rng.standard_normal(imsh))
    A = jnp.broadcast_to(jnp.eye(dim), (bs, dim, dim)).astype(I.dtype)
    T = jnp.zeros((bs, dim), dtype=I.dtype)
    out = affine_interp(I, A, T)
    assert np.allclose(np.asarray(out), np.asarray(I))


@pytest.mark.parametrize("bs", batch_sizes)
@pytest.mark.parametrize("dim", dims)
@pytest.mark.parametrize("broadcastI", TF)
def test_affine_interp_gradcheck(rng, bs, dim, broadcastI):
    imsh = (1 if broadcastI else bs, 1) + (res,) * dim
    I = jnp.asarray(rng.standard_normal(imsh))
    A = jnp.asarray(np.eye(dim) + 0.1 * rng.standard_normal((bs, dim, dim)))
    T = jnp.asarray(rng.standard_normal((bs, dim)) * 0.3)
    check_grads(affine_interp, (I, A, T), order=1, modes=["rev"], atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("dim", dims)
def test_affine_interp_matches_scipy(rng, dim):
    """Cross-backend check against scipy.ndimage.affine_transform on interior
    points (scipy's boundary handling differs outside the domain)."""
    from scipy.ndimage import map_coordinates

    sp = (6,) * dim
    I = rng.standard_normal((1, 1) + sp)
    A = np.eye(dim) + 0.05 * rng.standard_normal((dim, dim))
    T = 0.2 * rng.standard_normal(dim)
    out = np.asarray(affine_interp(jnp.asarray(I), jnp.asarray(A[None]), jnp.asarray(T[None])))
    o = (np.asarray(sp) - 1) / 2.0
    grid = np.stack(np.meshgrid(*[np.arange(n, dtype=float) for n in sp], indexing="ij"))
    coords = np.einsum("ab,b...->a...", A, grid - o.reshape((dim,) + (1,) * dim)) + (
        T + o
    ).reshape((dim,) + (1,) * dim)
    ref = map_coordinates(I[0, 0], coords.reshape(dim, -1), order=1, mode="nearest").reshape(sp)
    assert np.allclose(out[0, 0], ref, atol=1e-12)


@pytest.mark.parametrize("bs", batch_sizes)
@pytest.mark.parametrize("nc", channels)
def test_affine_interp_2d_match_3d(rng, bs, nc):
    """2D affine embedded in a flat 3D volume matches (reference
    test_affine.py:84-111)."""
    imsh2 = (bs, nc) + (res,) * 2
    I2 = jnp.asarray(rng.standard_normal(imsh2))
    A2 = jnp.asarray(np.eye(2)[None] + 0.1 * rng.standard_normal((bs, 2, 2)))
    T2 = jnp.asarray(0.3 * rng.standard_normal((bs, 2)))
    I3 = I2[..., None]
    A3 = jnp.zeros((bs, 3, 3), dtype=I2.dtype)
    A3 = A3.at[:, :2, :2].set(A2).at[:, 2, 2].set(1.0)
    T3 = jnp.concatenate([T2, jnp.zeros((bs, 1), dtype=T2.dtype)], axis=1)
    out2 = affine_interp(I2, A2, T2)
    out3 = affine_interp(I3, A3, T3)
    assert np.allclose(np.asarray(out2)[..., None], np.asarray(out3), atol=1e-12)


@pytest.mark.parametrize("dim", dims)
def test_affine_inverse_roundtrip(rng, dim):
    """(A,T)^{-1} round-trips random points (reference test_affine.py:116-125)."""
    bs = 4
    A = jnp.asarray(np.eye(dim)[None] + 0.1 * rng.standard_normal((bs, dim, dim)))
    T = jnp.asarray(rng.standard_normal((bs, dim)))
    Ainv, Tinv = affine_inverse(A, T)
    x = rng.standard_normal((bs, dim))
    y = np.einsum("nab,nb->na", np.asarray(A), x) + np.asarray(T)
    xr = np.einsum("nab,nb->na", np.asarray(Ainv), y) + np.asarray(Tinv)
    assert np.allclose(xr, x, atol=1e-10)


def test_rotation_exp_map_2d():
    v = jnp.asarray(np.array([0.0, np.pi / 2]))
    R = np.asarray(rotation_exp_map(v))
    assert np.allclose(R[0], np.eye(2), atol=1e-12)
    assert np.allclose(R[1], np.array([[0, -1], [1, 0]]), atol=1e-12)


def test_rotation_exp_map_3d(rng):
    """3D Rodrigues (reference raises NotImplementedError; provided here)."""
    v = rng.standard_normal((5, 3))
    R = np.asarray(rotation_exp_map(jnp.asarray(v)))
    for i in range(5):
        assert np.allclose(R[i] @ R[i].T, np.eye(3), atol=1e-10)
        assert np.isclose(np.linalg.det(R[i]), 1.0, atol=1e-10)
    # zero angle -> identity
    R0 = np.asarray(rotation_exp_map(jnp.zeros((1, 3))))
    assert np.allclose(R0[0], np.eye(3), atol=1e-12)


def test_rigid_inverse(rng):
    v = jnp.asarray(rng.standard_normal(3))
    T = jnp.asarray(rng.standard_normal((3, 2)))
    vin, Tin = rigid_inverse(v, T)
    R = np.asarray(rotation_exp_map(v))
    Rin = np.asarray(rotation_exp_map(vin))
    x = np.random.default_rng(0).standard_normal((3, 2))
    y = np.einsum("nab,nb->na", R, x) + np.asarray(T)
    xr = np.einsum("nab,nb->na", Rin, y) + np.asarray(Tin)
    assert np.allclose(xr, x, atol=1e-10)


@pytest.mark.parametrize("dim", dims)
def test_regrid_same_shape_identity(rng, dim):
    """Regrid to the same shape is the identity (reference
    test_affine.py:131-136)."""
    sp = (5,) * dim
    I = jnp.asarray(rng.standard_normal((2, 1) + sp))
    out = regrid(I, shape=sp)
    assert np.allclose(np.asarray(out), np.asarray(I), atol=1e-12)


@pytest.mark.parametrize("displacement", TF)
def test_regrid_gradcheck(rng, displacement):
    I = jnp.asarray(rng.standard_normal((1, 2, 3, 3)))
    f = lambda I: regrid(I, shape=(5, 5), displacement=displacement)
    check_grads(f, (I,), order=1, modes=["rev"], atol=1e-6, rtol=1e-6)


def test_regrid_upscale_corners(rng):
    """Upscaling places corner voxels at corners (spacing rule
    (in-1)/(out-1), reference affine.py:213-215)."""
    I = jnp.asarray(rng.standard_normal((1, 1, 3, 3)))
    out = np.asarray(regrid(I, shape=(5, 5)))
    Inp = np.asarray(I)[0, 0]
    assert np.allclose(out[0, 0, 0, 0], Inp[0, 0], atol=1e-12)
    assert np.allclose(out[0, 0, -1, -1], Inp[-1, -1], atol=1e-12)
    assert np.allclose(out[0, 0, 0, -1], Inp[0, -1], atol=1e-12)
    # midpoints are averages
    assert np.allclose(out[0, 0, 1, 0], 0.5 * (Inp[0, 0] + Inp[1, 0]), atol=1e-12)
