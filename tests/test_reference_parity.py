"""Golden-output parity against the mounted reference implementation.

The only reference op runnable without a CUDA GPU is the C++ CPU forward of
``affine_interp`` (reference lagomorph/extension/cpu/affine.cpp).  We build
it with torch's C++ extension machinery directly from the read-only
reference tree (a test-only oracle, not shipped code) and require
bit-level-tight agreement — the same role the reference's own CUDA-vs-CPU
cross-check plays (testing/test_affine.py:66-78).

The reference's *pure-Python* layers (matrix inverses, rotation maps) run on
CPU torch as-is, giving additional oracle coverage.
"""
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

import lagomorph_tpu as lm

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_affine_cpu(tmp_path_factory):
    """Build the reference CPU affine_interp forward as a torch extension."""
    torch = pytest.importorskip("torch")
    from torch.utils import cpp_extension

    build_dir = str(tmp_path_factory.mktemp("refext"))
    binding = os.path.join(build_dir, "binding.cpp")
    with open(binding, "w") as f:
        f.write(
            """
#include <torch/extension.h>
at::Tensor affine_interp_cpu_forward(at::Tensor I, at::Tensor A, at::Tensor T);
PYBIND11_MODULE(TORCH_EXTENSION_NAME, m) {
  m.def("affine_interp_cpu_forward", &affine_interp_cpu_forward);
}
"""
        )
    # the reference targets torch~1.x; shim its deprecated dispatch API
    # (.type() -> .scalar_type()) in a temp copy so it builds on modern torch
    src = open(os.path.join(REF, "lagomorph/extension/cpu/affine.cpp")).read()
    src = src.replace('.type(), "', '.scalar_type(), "')
    patched = os.path.join(build_dir, "ref_affine.cpp")
    with open(patched, "w") as f:
        f.write(src)
    try:
        mod = cpp_extension.load(
            name="ref_affine_cpu",
            sources=[binding, patched],
            extra_include_paths=[os.path.join(REF, "lagomorph/extension/include")],
            build_directory=build_dir,
            verbose=False,
        )
    except Exception as e:  # toolchain/env issues: skip, don't fail
        pytest.skip(f"could not build reference CPU extension: {e}")
    return mod


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("bs", [1, 3])
@pytest.mark.parametrize("nc", [1, 2])
def test_affine_interp_matches_reference_cpu(ref_affine_cpu, rng, dim, bs, nc):
    import torch

    sp = (6,) * dim
    I = rng.standard_normal((bs, nc) + sp)
    A = np.eye(dim)[None] + 0.15 * rng.standard_normal((bs, dim, dim))
    T = 0.8 * rng.standard_normal((bs, dim))

    ref = ref_affine_cpu.affine_interp_cpu_forward(
        torch.tensor(I), torch.tensor(A), torch.tensor(T)
    ).numpy()
    got = np.asarray(
        lm.affine_interp(jnp.asarray(I), jnp.asarray(A), jnp.asarray(T))
    )
    assert np.allclose(got, ref, atol=1e-12), np.abs(got - ref).max()


def test_affine_interp_broadcast_matches_reference_cpu(ref_affine_cpu, rng):
    import torch

    sp = (5, 5)
    I = rng.standard_normal((1, 1) + sp)
    A = np.eye(2)[None] + 0.1 * rng.standard_normal((4, 2, 2))
    T = 0.5 * rng.standard_normal((4, 2))
    ref = ref_affine_cpu.affine_interp_cpu_forward(
        torch.tensor(I), torch.tensor(A), torch.tensor(T)
    ).numpy()
    got = np.asarray(
        lm.affine_interp(jnp.asarray(I), jnp.asarray(A), jnp.asarray(T))
    )
    assert np.allclose(got, ref, atol=1e-12)


def _stub_ref_imports():
    """Stub the modules the reference needs so its pure-Python layers import
    from the read-only tree (same trick its docs build uses —
    docs/source/sphinxpypath)."""
    import types

    if "lagomorph_ext" not in sys.modules:
        ext = types.ModuleType("lagomorph_ext")
        ext.set_debug_mode = lambda *a, **k: None
        sys.modules["lagomorph_ext"] = ext
    if "pkg_resources" not in sys.modules:
        pr = types.ModuleType("pkg_resources")

        class _Dist:
            version = "0.0.0-test"

        pr.get_distribution = lambda *a, **k: _Dist()
        pr.DistributionNotFound = Exception
        sys.modules["pkg_resources"] = pr
    if REF not in sys.path:
        sys.path.insert(0, REF)


def _ref_python():
    _stub_ref_imports()
    import lagomorph.affine as ref_affine

    return ref_affine


def test_matrix_inverses_match_reference(rng):
    torch = pytest.importorskip("torch")
    ref_affine = _ref_python()
    for dim in (2, 3):
        A = np.eye(dim)[None] + 0.2 * rng.standard_normal((5, dim, dim))
        T = rng.standard_normal((5, dim))
        rA, rT = ref_affine.affine_inverse(torch.tensor(A), torch.tensor(T))
        gA, gT = lm.affine_inverse(jnp.asarray(A), jnp.asarray(T))
        assert np.allclose(np.asarray(gA), rA.numpy(), atol=1e-12)
        assert np.allclose(np.asarray(gT), rT.numpy(), atol=1e-12)


def test_rotation_exp_map_2d_matches_reference(rng):
    torch = pytest.importorskip("torch")
    ref_affine = _ref_python()
    v = rng.standard_normal(7)
    ref = ref_affine.rotation_exp_map(torch.tensor(v)).numpy()
    got = np.asarray(lm.rotation_exp_map(jnp.asarray(v)))
    assert np.allclose(got, ref, atol=1e-12)


def test_identity_matches_reference(rng):
    pytest.importorskip("torch")
    _stub_ref_imports()
    import lagomorph.deform as ref_deform

    for shape in ((2, 2, 5, 7), (1, 3, 4, 5, 6)):
        ref = ref_deform.identity(shape)
        got = np.asarray(lm.identity(shape))
        assert np.allclose(got, ref)
