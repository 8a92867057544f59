"""Jacobian-times-vectorfield op tests (reference: testing/test_diff.py):
gradchecks, transpose/adjoint identities, 2D-embedded-in-3D consistency."""
import numpy as np
import jax.numpy as jnp
import pytest
from jax.test_util import check_grads

import lagomorph_tpu as lm

res = 2
dims = [2, 3]
batch_sizes = [1, 2]
TF = [True, False]


@pytest.fixture(params=batch_sizes, ids=["bs" + str(b) for b in batch_sizes])
def bs(request):
    return request.param


@pytest.fixture(params=dims, ids=["dim" + str(d) for d in dims])
def dim(request):
    return request.param


@pytest.fixture(params=TF, ids=["dT", "dF"])
def disp(request):
    return request.param


@pytest.fixture(params=TF, ids=["trT", "trF"])
def trans(request):
    return request.param


def test_jacobian_times_vectorfield_gradcheck(rng, bs, dim, disp, trans):
    defsh = (bs, dim) + (res,) * dim
    phiinv = jnp.asarray(rng.standard_normal(defsh))
    m = jnp.asarray(rng.standard_normal(defsh))
    foo = lambda v, w: lm.jacobian_times_vectorfield(
        v, w, displacement=disp, transpose=trans
    )
    check_grads(foo, (phiinv, m), order=1, modes=["rev"], atol=1e-6, rtol=1e-6)


def test_jacobian_times_vectorfield_transpose(rng, bs, dim, disp):
    """transpose=True gives the adjoint of the pointwise contraction."""
    defsh = (bs, dim) + (res,) * dim
    g = jnp.asarray(rng.standard_normal(defsh))
    u = jnp.asarray(rng.standard_normal(defsh))
    v = jnp.asarray(rng.standard_normal(defsh))
    Dgu = lm.jacobian_times_vectorfield(g, u, displacement=disp, transpose=False)
    Dguv = float(jnp.sum(Dgu * v))
    DgTv = lm.jacobian_times_vectorfield(g, v, displacement=disp, transpose=True)
    uDgTv = float(jnp.sum(u * DgTv))
    assert np.isclose(Dguv, uDgTv)


def test_jacobian_times_vectorfield_adjoint(rng, bs, dim):
    """adjoint op is the true adjoint in the differentiated (v) slot."""
    defsh = (bs, dim) + (res,) * dim
    u = jnp.asarray(rng.standard_normal(defsh))
    v = jnp.asarray(rng.standard_normal(defsh))
    m = jnp.asarray(rng.standard_normal(defsh))
    Duv = lm.jacobian_times_vectorfield(u, v, displacement=False, transpose=False)
    Duvm = float(jnp.sum(Duv * m))
    adjvm = lm.jacobian_times_vectorfield_adjoint(m, v)
    uadjvm = float(jnp.sum(u * adjvm))
    assert np.isclose(Duvm, uadjvm)


def test_jacobian_times_vectorfield_adjoint_gradcheck(rng, bs, dim):
    defsh = (bs, dim) + (res,) * dim
    v = jnp.asarray(rng.standard_normal(defsh))
    m = jnp.asarray(rng.standard_normal(defsh))
    check_grads(
        lm.jacobian_times_vectorfield_adjoint,
        (v, m),
        order=1,
        modes=["rev"],
        atol=1e-6,
        rtol=1e-6,
    )


def test_jacobian_times_vectorfield_2d_match_3d(rng, bs, disp, trans):
    defsh2 = (bs, 2) + (res,) * 2
    defsh3 = (bs, 3) + (res,) * 2 + (2,)
    v2 = jnp.asarray(rng.standard_normal(defsh2))
    v3 = jnp.zeros(defsh3)
    v3 = v3.at[:, :2, :, :, 0].set(v2)
    v3 = v3.at[:, :2, :, :, 1].set(v2)
    m2 = jnp.asarray(rng.standard_normal(defsh2))
    m3 = jnp.zeros(defsh3)
    m3 = m3.at[:, :2, :, :, 0].set(m2)
    m3 = m3.at[:, :2, :, :, 1].set(m2)
    dvm2 = lm.jacobian_times_vectorfield(v2, m2, displacement=disp, transpose=trans)
    dvm3 = lm.jacobian_times_vectorfield(v3, m3, displacement=disp, transpose=trans)
    assert np.allclose(np.asarray(dvm3[:, :2, :, :, 0]), np.asarray(dvm2))


def test_jacobian_times_vectorfield_adjoint_2d_match_3d(rng, bs):
    defsh2 = (bs, 2) + (res,) * 2
    defsh3 = (bs, 3) + (res,) * 2 + (2,)
    v2 = jnp.asarray(rng.standard_normal(defsh2))
    v3 = jnp.zeros(defsh3)
    v3 = v3.at[:, :2, :, :, 0].set(v2)
    v3 = v3.at[:, :2, :, :, 1].set(v2)
    m2 = jnp.asarray(rng.standard_normal(defsh2))
    m3 = jnp.zeros(defsh3)
    m3 = m3.at[:, :2, :, :, 0].set(m2)
    m3 = m3.at[:, :2, :, :, 1].set(m2)
    dvm2 = lm.jacobian_times_vectorfield_adjoint(v2, m2)
    dvm3 = lm.jacobian_times_vectorfield_adjoint(v3, m3)
    assert np.allclose(np.asarray(dvm3[:, :2, :, :, 0]), np.asarray(dvm2))


def test_finite_difference_against_dense(rng):
    """Check the clamped central difference against an explicit dense matrix."""
    n = 5
    a = rng.standard_normal(n)
    D = np.zeros((n, n))
    for i in range(n):
        D[i, min(i + 1, n - 1)] += 0.5
        D[i, max(i - 1, 0)] -= 0.5
    from lagomorph_tpu.ops.boundary import diff_central, diff_central_adjoint

    got = np.asarray(diff_central(jnp.asarray(a), axis=0))
    assert np.allclose(got, D @ a)
    got_t = np.asarray(diff_central_adjoint(jnp.asarray(a), axis=0))
    assert np.allclose(got_t, D.T @ a)


def test_thin_dimension_rejected(rng):
    v = jnp.asarray(rng.standard_normal((1, 2, 1, 4)))
    with pytest.raises(ValueError):
        lm.jacobian_times_vectorfield(v, v)
