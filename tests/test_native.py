"""Native C++ component tests: CPU-oracle parity (the cross-backend test
role of reference testing/test_affine.py:66-78) and the readahead batch
cache."""
import numpy as np
import jax.numpy as jnp
import pytest

import lagomorph_tpu as lm
from lagomorph_tpu.native import (
    native_available,
    cpu_interp,
    cpu_affine_interp,
    NativeBatchCache,
)

needs_native = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain available"
)


@needs_native
@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_native_interp_matches_jax(rng, dim, dtype):
    sp = (5,) * dim
    I = rng.standard_normal((2, 3) + sp).astype(dtype)
    u = (rng.standard_normal((2, dim) + sp) * 2).astype(dtype)
    ref = np.asarray(lm.interp(jnp.asarray(I), jnp.asarray(u), dt=0.6))
    got = cpu_interp(I, u, dt=0.6)
    atol = 1e-5 if dtype == np.float32 else 1e-12
    assert np.allclose(got, ref, atol=atol)


@needs_native
@pytest.mark.parametrize("dim", [2, 3])
def test_native_interp_broadcast(rng, dim):
    sp = (4,) * dim
    I = rng.standard_normal((1, 2) + sp).astype(np.float64)
    u = rng.standard_normal((3, dim) + sp).astype(np.float64)
    ref = np.asarray(lm.interp(jnp.asarray(I), jnp.asarray(u)))
    got = cpu_interp(I, u)
    assert np.allclose(got, ref, atol=1e-12)


@needs_native
@pytest.mark.parametrize("dim", [2, 3])
def test_native_affine_matches_jax(rng, dim):
    sp = (5,) * dim
    I = rng.standard_normal((2, 2) + sp).astype(np.float64)
    A = np.eye(dim)[None] + 0.1 * rng.standard_normal((2, dim, dim))
    T = 0.5 * rng.standard_normal((2, dim))
    ref = np.asarray(lm.affine_interp(jnp.asarray(I), jnp.asarray(A), jnp.asarray(T)))
    got = cpu_affine_interp(I, A, T)
    assert np.allclose(got, ref, atol=1e-12)


@needs_native
def test_native_batch_cache_roundtrip(rng, tmp_path):
    batches = [rng.standard_normal((4, 1, 8, 8)).astype(np.float32) for _ in range(5)]
    cache = NativeBatchCache(batches, cache_dir=str(tmp_path))
    try:
        # sequential iteration (readahead path)
        got = list(cache)
        for a, b in zip(got, batches):
            assert np.allclose(a, b)
        # random access
        assert np.allclose(cache[3], batches[3])
        assert np.allclose(cache[0], batches[0])
        # two full epochs
        got2 = list(cache)
        for a, b in zip(got2, batches):
            assert np.allclose(a, b)
    finally:
        cache.close()
