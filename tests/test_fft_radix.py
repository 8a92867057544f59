"""Radix-2 FFT reference (ops/fft_radix.py) and the Pallas fluid-FFT
kernels (ops/pallas/fft_unit.py, exercised in interpret mode on CPU).

The production TPU path is additionally validated bit-for-bit against a
float64 numpy oracle on hardware by scripts/tpu_checks.py /
scripts/fft_probe5.py.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lagomorph_tpu.ops import fft_radix as fr
from lagomorph_tpu.ops import fluid as fl


def test_dif_matches_numpy_bitreversed():
    rng = np.random.default_rng(0)
    for n in (4, 8, 32, 128):
        x = rng.standard_normal((3, n))
        y = rng.standard_normal((3, n))
        re, im = fr.fft_dif(jnp.asarray(x), jnp.asarray(y), 1)
        ref = np.fft.fft(x + 1j * y, axis=1)
        p = fr.bitrev_perm(n)
        got = np.asarray(re) + 1j * np.asarray(im)
        assert np.abs(got - ref[:, p]).max() < 1e-10 * max(1.0, np.abs(ref).max())


def test_fftn_roundtrip_and_numpy():
    rng = np.random.default_rng(1)
    sp = (8, 16, 32)
    axes = (1, 2, 3)
    x = rng.standard_normal((2,) + sp)
    y = rng.standard_normal((2,) + sp)
    re, im = fr.fftn_br(jnp.asarray(x), jnp.asarray(y), axes)
    out = np.asarray(re) + 1j * np.asarray(im)
    for a, n in zip(axes, sp):
        out = np.take(out, fr.bitrev_perm(n), axis=a)
    ref = np.fft.fftn(x + 1j * y, axes=axes)
    assert np.abs(out - ref).max() < 1e-10 * np.abs(ref).max()
    re2, im2 = fr.ifftn_br(re, im, axes)
    assert np.abs(np.asarray(re2) - x).max() < 1e-12
    assert np.abs(np.asarray(im2) - y).max() < 1e-12


@pytest.mark.parametrize("params", [(0.1, 0.0, 0.01), (0.1, 0.03, 0.01)])
@pytest.mark.parametrize("inverse", [True, False])
def test_fluid_radix_ref_matches_production(params, inverse):
    rng = np.random.default_rng(2)
    mv = jnp.asarray(
        rng.standard_normal((4, 3, 16, 16, 16)), dtype=jnp.float32
    )
    a = fl._fluid_apply(mv, params, inverse)
    b = fr.fluid_apply_radix_ref(mv, params, inverse)
    scale = float(jnp.abs(a).max())
    assert float(jnp.abs(a - b).max()) < 5e-6 * scale


def test_bitrev_multiplier_is_permuted_multiplier():
    sp = (8, 16, 32)
    params = (0.1, 0.05, 0.01)
    M = fl._fluid_multiplier_traced(
        sp, params, True, jnp.float32, full_spectrum=True
    )
    Mbr = fl._fluid_multiplier_traced(
        sp, params, True, jnp.float32, full_spectrum=True, bitrev=True
    )
    for key in M:
        A = np.asarray(M[key])
        for ax, n in enumerate(sp):
            A = np.take(A, fr.bitrev_perm(n), axis=ax)
        assert np.abs(A - np.asarray(Mbr[key])).max() < 1e-6


def test_fluid_flat_pallas_interpret_matches_radix_ref():
    import functools
    from jax.experimental import pallas as pl
    from lagomorph_tpu.ops.pallas import fft_unit

    orig = fft_unit.pl.pallas_call
    fft_unit.pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        rng = np.random.default_rng(3)
        X, Y, Z = 16, 8, 32
        x1 = jnp.asarray(rng.standard_normal((3, X, Y, Z)), jnp.float32)
        x2 = jnp.asarray(rng.standard_normal((3, X, Y, Z)), jnp.float32)
        params = (0.1, 0.0, 0.01)
        Mbr = fl._fluid_multiplier_traced(
            (X, Y, Z), params, True, jnp.float32,
            full_spectrum=True, bitrev=True,
        )[(0, 0)]
        re, im = fft_unit.fluid_flat_pallas(x1, x2, Mbr)
        rr, ii = fr.fftn_br(x1, x2, (1, 2, 3))
        rr, ii = rr * Mbr[None], ii * Mbr[None]
        rr, ii = fr.ifftn_br(rr, ii, (1, 2, 3))
        scale = float(jnp.abs(rr).max())
        assert float(jnp.abs(re - rr).max()) < 5e-6 * scale
        assert float(jnp.abs(im - ii).max()) < 5e-6 * scale
    finally:
        fft_unit.pl.pallas_call = orig


def test_fluid_flat_mxu_interpret_matches_oracle():
    import functools
    from lagomorph_tpu.ops.pallas import fft_unit

    orig = fft_unit.pl.pallas_call
    fft_unit.pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        rng = np.random.default_rng(5)
        X, Y, Z = 16, 8, 128
        x1 = jnp.asarray(rng.standard_normal((3, X, Y, Z)), jnp.float32)
        x2 = jnp.asarray(rng.standard_normal((3, X, Y, Z)), jnp.float32)
        params = (0.1, 0.0, 0.01)
        Mn = fl._fluid_multiplier_traced(
            (X, Y, Z), params, True, jnp.float32, full_spectrum=True
        )[(0, 0)]
        fwd = tuple(fl._dft_pair(n, jnp.float32, False) for n in (X, Y, Z))
        inv = tuple(fl._dft_pair(n, jnp.float32, True) for n in (X, Y, Z))
        re, im = fft_unit.fluid_flat_mxu(x1, x2, Mn, fwd, inv)
        Mf = np.asarray(Mn, np.float64)

        def oracle(x):
            F = np.fft.fftn(np.asarray(x, np.float64), axes=(1, 2, 3))
            return np.real(np.fft.ifftn(Mf[None] * F, axes=(1, 2, 3)))

        r1, r2 = oracle(x1), oracle(x2)
        s = max(np.abs(r1).max(), np.abs(r2).max())
        # f32 matmul roundoff amplified by the 1/gamma^2 low-frequency
        # gain; hardware HIGHEST measures 4.1e-5 at 128^3 (fft_probe5)
        assert np.abs(np.asarray(re) - r1).max() / s < 2e-4
        assert np.abs(np.asarray(im) - r2).max() / s < 2e-4
    finally:
        fft_unit.pl.pallas_call = orig


def test_fft_kernel_gate_rejects_unsupported():
    from lagomorph_tpu.ops.pallas import fft_unit

    # non-power-of-two, 2D, f64 all rejected regardless of backend
    assert not fft_unit.fft_kernel_supported((96, 96, 96), jnp.float32)
    assert not fft_unit.fft_kernel_supported((128, 128), jnp.float32)
    assert not fft_unit.fft_kernel_supported((64, 64, 64), jnp.float64)
