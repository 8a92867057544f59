"""Interpolation op tests, mirroring the reference test strategy
(reference: testing/test_interp.py): gradcheck vs finite differences on tiny
float64 tensors, 2D-embedded-in-3D consistency, plus an independent
cross-backend oracle (scipy.ndimage.map_coordinates with mode='nearest' ==
CLAMP boundary, standing in for the CUDA reference)."""
import numpy as np
import jax.numpy as jnp
import pytest
from jax.test_util import check_grads

import lagomorph_tpu as lm

res = 2
dims = [2, 3]
channels = [1, 2, 4]
batch_sizes = [1, 2]
TF = [True, False]


@pytest.mark.parametrize("nc", channels)
@pytest.mark.parametrize("bs", batch_sizes)
@pytest.mark.parametrize("dim", dims)
@pytest.mark.parametrize("broadcastI", TF)
def test_interp_gradcheck(rng, bs, nc, dim, broadcastI):
    imsh = (1 if broadcastI else bs, nc) + (res,) * dim
    defsh = (bs, dim) + (res,) * dim
    I = jnp.asarray(rng.standard_normal(imsh))
    u = jnp.asarray(rng.standard_normal(defsh))
    check_grads(lm.interp, (I, u), order=1, modes=["rev"], atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("bs", batch_sizes)
@pytest.mark.parametrize("nc", channels)
@pytest.mark.parametrize("broadcastI", TF)
def test_interp_2d_match_3d(rng, bs, nc, broadcastI):
    imsh = (1 if broadcastI else bs, nc) + (res,) * 2
    defsh = (bs, 2) + (res,) * 2
    defsh3 = (bs, 3) + (res,) * 2 + (1,)
    I = jnp.asarray(rng.standard_normal(imsh))
    u = jnp.asarray(rng.standard_normal(defsh))
    I3 = I[..., None]
    u3 = jnp.zeros(defsh3, dtype=u.dtype)
    u3 = u3.at[:, :2, ...].set(u[..., None])
    Iu = lm.interp(I, u)
    Iu3 = lm.interp(I3, u3)
    assert np.allclose(np.asarray(Iu)[..., None], np.asarray(Iu3))


@pytest.mark.parametrize("dim", dims)
@pytest.mark.parametrize("dt", [1.0, 0.37, -0.5])
def test_interp_matches_scipy(rng, dim, dt):
    """Cross-backend parity: scipy map_coordinates(order=1, mode='nearest')
    implements exactly clamped multilinear interpolation."""
    from scipy.ndimage import map_coordinates

    sp = (5,) * dim
    I = rng.standard_normal((2, 3) + sp)
    u = rng.standard_normal((2, dim) + sp) * 2.5
    out = np.asarray(lm.interp(jnp.asarray(I), jnp.asarray(u), dt=dt))
    grid = np.stack(np.meshgrid(*[np.arange(n, dtype=float) for n in sp], indexing="ij"))
    for n in range(2):
        coords = grid + dt * u[n]
        for c in range(3):
            ref = map_coordinates(
                I[n, c], coords.reshape(dim, -1), order=1, mode="nearest"
            ).reshape(sp)
            assert np.allclose(out[n, c], ref, atol=1e-12)


def test_interp_identity(rng):
    """Zero displacement is a no-op."""
    I = jnp.asarray(rng.standard_normal((2, 1, 8, 8)))
    u = jnp.zeros((2, 2, 8, 8))
    assert np.allclose(np.asarray(lm.interp(I, u)), np.asarray(I))


def test_splat_is_adjoint_of_interp(rng):
    from lagomorph_tpu.deform import splat

    for dim in dims:
        sp = (4,) * dim
        I = jnp.asarray(rng.standard_normal((2, 3) + sp))
        u = jnp.asarray(rng.standard_normal((2, dim) + sp))
        g = jnp.asarray(rng.standard_normal((2, 3) + sp))
        lhs = float(jnp.sum(lm.interp(I, u) * g))
        rhs = float(jnp.sum(I * splat(g, u)))
        assert abs(lhs - rhs) < 1e-10


def test_interp_hessian_diagonal_image(rng):
    """H[v] = sum over output points of squared weights at corner v; check
    against a dense explicit Hessian diagonal of x -> interp(x, u).

    The oracle diag(J^T J) only matches where no clamped corners coincide
    (the reference splats w^2 per corner even when clamping merges corners,
    interp.h:529-532), so use small displacements and compare interior
    voxels only."""
    import jax

    sp = (8, 8)
    u = jnp.asarray(rng.uniform(-0.4, 0.4, (1, 2) + sp))
    I = jnp.asarray(rng.standard_normal((1, 1) + sp))

    H = np.asarray(lm.interp_hessian_diagonal_image(I, u))

    # dense linear operator of interp in I
    def f(Iflat):
        return lm.interp(Iflat.reshape(I.shape), u).reshape(-1)

    J = np.asarray(jax.jacfwd(f)(jnp.asarray(I).reshape(-1)))
    # Hessian of 0.5*||f(I) - y||^2 diag = diag(J^T J)
    dense = (J * J).sum(axis=0).reshape(sp)
    assert np.allclose(H[0, 0, 2:-2, 2:-2], dense[2:-2, 2:-2], atol=1e-10)


def _np_sample(I, coords, background, bg=0.0):
    """Brute-force numpy reference for multilinear sampling with the four
    reference boundary strategies (extrap.h:40-57)."""
    import itertools as it

    C = I.shape[0]
    dim = coords.shape[0]
    spatial = I.shape[1:]
    out_sp = coords.shape[1:]
    out = np.zeros((C,) + out_sp)
    floor = np.floor(coords).astype(int)
    frac = coords - np.floor(coords)
    for idx in np.ndindex(*out_sp):
        for corner in it.product((0, 1), repeat=dim):
            w = 1.0
            pos = []
            valid = True
            for d in range(dim):
                raw = floor[(d,) + idx] + corner[d]
                w *= frac[(d,) + idx] if corner[d] else 1.0 - frac[(d,) + idx]
                if background == "wrap":
                    pos.append(raw % spatial[d])
                elif background == "clamp":
                    pos.append(min(max(raw, 0), spatial[d] - 1))
                else:
                    if raw < 0 or raw >= spatial[d]:
                        valid = False
                        pos.append(0)
                    else:
                        pos.append(raw)
            for c in range(C):
                v = I[(c,) + tuple(pos)] if valid else bg
                out[(c,) + idx] += w * v
    return out


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("background", ["clamp", "wrap", "zero", "val"])
def test_background_strategies(rng, dim, background):
    """sample_linear with every reference BackgroundStrategy matches a
    brute-force numpy implementation, with coordinates far out of range."""
    from lagomorph_tpu.ops.sampling import sample_linear

    sp = (5,) * dim
    I = rng.standard_normal((1, 2) + sp)
    coords = rng.uniform(-4.0, 9.0, (1, dim) + sp)
    got = np.asarray(
        sample_linear(jnp.asarray(I), jnp.asarray(coords),
                      background=background, background_value=0.7)
    )
    want = _np_sample(I[0], coords[0], background,
                      bg=0.7 if background == "val" else 0.0)
    assert np.allclose(got[0], want, atol=1e-10), np.abs(got[0] - want).max()


def test_interp_background_param(rng):
    """interp exposes the background strategies; clamp remains default."""
    from lagomorph_tpu.ops.interp import interp

    sp = (6, 6)
    I = jnp.asarray(rng.standard_normal((1, 1) + sp))
    u = jnp.asarray(rng.uniform(-3, 3, (1, 2) + sp))
    base = interp(I, u)
    clamped = interp(I, u, background="clamp")
    assert np.array_equal(np.asarray(base), np.asarray(clamped))
    z = interp(I, u, background="zero")
    w = interp(I, u, background="wrap")
    assert not np.allclose(np.asarray(z), np.asarray(base))
    assert np.isfinite(np.asarray(w)).all()
    with pytest.raises(ValueError):
        interp(I, u, background="reflect")
