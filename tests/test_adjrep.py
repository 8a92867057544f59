"""Adjoint-representation tests (reference: testing/test_adjrep.py)."""
import numpy as np
import jax.numpy as jnp
import pytest
from jax.test_util import check_grads

import lagomorph_tpu as lm

res = 2
dims = [2, 3]
batch_sizes = [1, 2]


@pytest.mark.parametrize("bs", batch_sizes)
@pytest.mark.parametrize("dim", dims)
def test_Ad_star_gradcheck(rng, bs, dim):
    defsh = (bs, dim) + (res,) * dim
    phiinv = jnp.asarray(rng.standard_normal(defsh))
    m = jnp.asarray(rng.standard_normal(defsh))
    check_grads(lm.Ad_star, (phiinv, m), order=1, modes=["rev"], atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("bs", batch_sizes)
@pytest.mark.parametrize("dim", dims)
def test_ad_star_is_adjoint_of_ad(rng, bs, dim):
    """<ad(v,w), m> == <w, ad_star(v, m)> in the discrete inner product."""
    defsh = (bs, dim) + (res + 1,) * dim
    v = jnp.asarray(rng.standard_normal(defsh))
    w = jnp.asarray(rng.standard_normal(defsh))
    m = jnp.asarray(rng.standard_normal(defsh))
    lhs = float(jnp.sum(lm.ad(v, w) * m))
    rhs = float(jnp.sum(w * lm.ad_star(v, m)))
    assert np.isclose(lhs, rhs), (lhs, rhs)


@pytest.mark.parametrize("dim", dims)
def test_ad_dagger_is_metric_adjoint(rng, dim):
    """<ad(x,y), z>_M == <y, ad_dagger(x,z)>_M with <a,b>_M = <flat(a), b>."""
    metric = lm.FluidMetric([0.1, 0.01, 0.001])
    defsh = (1, dim) + (3,) * dim
    x = jnp.asarray(rng.standard_normal(defsh))
    y = jnp.asarray(rng.standard_normal(defsh))
    z = jnp.asarray(rng.standard_normal(defsh))
    lhs = float(jnp.sum(metric.flat(lm.ad(x, y)) * z))
    rhs = float(jnp.sum(metric.flat(y) * lm.ad_dagger(x, z, metric)))
    assert np.isclose(lhs, rhs, atol=1e-8), (lhs, rhs)


def test_Ad_is_adjoint_of_Ad_star(rng):
    """<Ad(phi, v), m> == <v, Ad_star(phi, m)> — checks the splat-based Ad
    (NotImplemented in the reference, adjrep.py:50-66)."""
    dim = 2
    defsh = (2, dim) + (4,) * dim
    phi = jnp.asarray(rng.standard_normal(defsh))
    v = jnp.asarray(rng.standard_normal(defsh))
    m = jnp.asarray(rng.standard_normal(defsh))
    lhs = float(jnp.sum(lm.Ad(phi, v) * m))
    rhs = float(jnp.sum(v * lm.Ad_star(phi, m)))
    assert np.isclose(lhs, rhs), (lhs, rhs)


def test_sym_dagger_consistency(rng):
    """<sym(x,y), z>_M == <y, sym_dagger(x, z)>_M."""
    metric = lm.FluidMetric([0.1, 0.01, 0.001])
    dim = 2
    defsh = (1, dim) + (3,) * dim
    x = jnp.asarray(rng.standard_normal(defsh))
    y = jnp.asarray(rng.standard_normal(defsh))
    z = jnp.asarray(rng.standard_normal(defsh))
    lhs = float(jnp.sum(metric.flat(lm.sym(x, y, metric)) * z))
    rhs = float(jnp.sum(metric.flat(y) * lm.sym_dagger(x, z, metric)))
    assert np.isclose(lhs, rhs, atol=1e-8), (lhs, rhs)
