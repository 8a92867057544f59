"""Fluid metric tests (reference: testing/test_metric.py): gradchecks of
sharp/flat, flat∘sharp inverse round-trip, plus multiplier-vs-dense-operator
checks unique to this implementation."""
import numpy as np
import jax.numpy as jnp
import pytest
from jax.test_util import check_grads

import lagomorph_tpu as lm

res = 3
dims = [2, 3]
batch_sizes = [1, 2]
fluid_params = [0.1, 0.01, 0.001]


@pytest.mark.parametrize("bs", batch_sizes)
@pytest.mark.parametrize("dim", dims)
def test_fluid_sharp_gradcheck(rng, bs, dim):
    defsh = (bs, dim) + (res,) * dim
    m = jnp.asarray(rng.standard_normal(defsh))
    metric = lm.FluidMetric(fluid_params)
    check_grads(metric.sharp, (m,), order=1, modes=["rev"], atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("bs", batch_sizes)
@pytest.mark.parametrize("dim", dims)
def test_fluid_flat_gradcheck(rng, bs, dim):
    defsh = (bs, dim) + (res,) * dim
    v = jnp.asarray(rng.standard_normal(defsh))
    metric = lm.FluidMetric(fluid_params)
    check_grads(metric.flat, (v,), order=1, modes=["rev"], atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("bs", batch_sizes)
@pytest.mark.parametrize("dim", dims)
def test_fluid_inverse(rng, bs, dim):
    defsh = (bs, dim) + (res,) * dim
    m = jnp.asarray(rng.standard_normal(defsh))
    metric = lm.FluidMetric(fluid_params)
    v = metric.sharp(m)
    vm = metric.flat(v)
    assert np.allclose(np.asarray(vm), np.asarray(m), atol=1e-3)


@pytest.mark.parametrize("dim", dims)
def test_fluid_flat_matches_dense_operator(rng, dim):
    """flat == (gamma - alpha*Lap - beta*grad div)^2 applied via the discrete
    periodic stencils.  Build the dense circulant operator explicitly from
    its definition and compare."""
    sp = (4,) * dim
    metric = lm.FluidMetric(fluid_params)
    alpha, beta, gamma = fluid_params

    def S(x, a):  # periodic second difference (symbol 2cos-2 = -w)
        return np.roll(x, -1, axis=1 + a) + np.roll(x, 1, axis=1 + a) - 2 * x

    def C(x, a):  # periodic central first difference (symbol i*sin)
        return (np.roll(x, -1, axis=1 + a) - np.roll(x, 1, axis=1 + a)) / 2

    def apply_L(v):
        """One application of the discrete operator whose per-frequency
        symbol is the reference's LUT matrix l (metric.cu:186-192):
        component a: (gamma - alpha*Lap) v_a + beta*S_a v_a
                     - beta * sum_{b != a} C_a C_b v_b."""
        v = np.asarray(v)
        out = gamma * v.copy()
        for a in range(dim):
            # vector Laplacian on component a
            for b in range(dim):
                out[:, a] -= alpha * S(v[:, a], b)
            # grad-div: same-axis term uses the second difference
            out[:, a] += beta * S(v[:, a], a)
            for b in range(dim):
                if b != a:
                    out[:, a] -= beta * C(C(v[:, b], b), a)
        return out

    v = rng.standard_normal((1, dim) + sp)
    got = np.asarray(metric.flat(jnp.asarray(v)))
    want = apply_L(apply_L(v))
    assert np.allclose(got, want, atol=1e-8), np.abs(got - want).max()


def test_fluid_selfadjoint(rng):
    metric = lm.FluidMetric(fluid_params)
    m = jnp.asarray(rng.standard_normal((1, 2, 4, 4)))
    w = jnp.asarray(rng.standard_normal((1, 2, 4, 4)))
    a = float(jnp.sum(metric.flat(m) * w))
    b = float(jnp.sum(m * metric.flat(w)))
    assert np.isclose(a, b)
    a = float(jnp.sum(metric.sharp(m) * w))
    b = float(jnp.sum(m * metric.sharp(w)))
    assert np.isclose(a, b)


def test_fluid_zero_gamma_regularized():
    """With gamma=0 and beta=0 the zero-frequency mode hits the safe_sqrt
    floor; the operator must stay finite (no NaN/Inf)."""
    metric = lm.FluidMetric([0.1, 0.0, 0.0])
    m = jnp.ones((1, 2, 4, 4))
    v = metric.sharp(m)
    assert np.isfinite(np.asarray(v)).all()


@pytest.mark.parametrize("inverse", [False, True])
@pytest.mark.parametrize("dim", dims)
def test_traced_multiplier_matches_concrete(dim, inverse):
    """The live traced (iota-built) multiplier must equal the concrete numpy
    reference implementation entry-for-entry."""
    import jax
    from lagomorph_tpu.ops.fluid import (
        fluid_multiplier,
        _fluid_multiplier_traced,
    )

    spatial = tuple(range(4, 4 + dim))  # anisotropic: (4,5) / (4,5,6)
    params = tuple(fluid_params)
    M = fluid_multiplier(spatial, params, inverse, np.float64)
    ent = jax.jit(
        lambda: _fluid_multiplier_traced(spatial, params, inverse, jnp.float64)
    )()
    for a in range(dim):
        for b in range(a + 1):
            got = np.asarray(ent[(a, b)])
            assert np.allclose(got, M[a, b], atol=1e-12), (a, b)


@pytest.mark.parametrize("inverse", [False, True])
@pytest.mark.parametrize(
    "B,dim,beta",
    [(4, 3, 0.0), (2, 3, 0.01), (1, 3, 0.0), (3, 2, 0.0), (2, 2, 0.01),
     (3, 3, 0.02), (1, 2, 0.03)]  # odd B + beta!=0 -> batch_pad mode
)
def test_packed_fft_matches_rfftn(rng, B, dim, beta, inverse):
    """Packed-pair complex transforms (one fftn per two real fields; valid
    because the multiplier is even in k) must match the rfftn path to f32
    roundoff for every packing mode / dimension / beta."""
    import jax
    from lagomorph_tpu.ops.fluid import (
        _packing_mode,
        fluid_operator,
        set_fluid_packing,
    )

    params = (0.1, beta, 0.01)
    sp = tuple(range(6, 6 + dim))  # anisotropic
    mv = jnp.asarray(rng.standard_normal((B, dim) + sp), dtype=jnp.float32)
    ref = jax.jit(lambda x: fluid_operator(x, params, inverse))(mv)
    prev = set_fluid_packing(True)
    try:
        assert _packing_mode(mv.shape, params, mv.dtype) is not None
        got = jax.jit(lambda x: fluid_operator(x, params, inverse))(mv)
        # gradient path too (self-adjoint custom VJP re-applies the op)
        g = jax.jit(
            jax.grad(lambda x: jnp.sum(fluid_operator(x, params, inverse) ** 2))
        )(mv)
    finally:
        set_fluid_packing(prev)
    gref = jax.jit(
        jax.grad(lambda x: jnp.sum(fluid_operator(x, params, inverse) ** 2))
    )(mv)
    scale = float(jnp.abs(ref).max())
    assert float(jnp.abs(got - ref).max()) / scale < 1e-5
    gscale = max(float(jnp.abs(gref).max()), 1e-30)
    assert float(jnp.abs(g - gref).max()) / gscale < 1e-5
