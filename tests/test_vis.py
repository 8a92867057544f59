"""Smoke + shape tests for the 2D visualization helpers."""
import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg")

from matplotlib import pyplot as plt  # noqa: E402

from lagomorph_tpu import vis  # noqa: E402


def test_to_numpy_roundtrip():
    import jax.numpy as jnp

    a = jnp.arange(6.0).reshape(2, 3)
    n = vis.to_numpy(a)
    assert isinstance(n, np.ndarray)
    assert np.allclose(n, np.arange(6.0).reshape(2, 3))


def test_to_numpy_rejects_garbage():
    class Bad:
        def __array__(self):
            raise RuntimeError("no")

    with pytest.raises(TypeError):
        vis.to_numpy(Bad())


def test_gridplot_zero_displacement_is_regular_grid(rng):
    u = np.zeros((1, 2, 32, 32), dtype=np.float32)
    fig, ax = plt.subplots()
    vis.gridplot(u, Nx=8, Ny=8, ax=ax)
    (lc,) = ax.collections
    segs = lc.get_segments()
    # 8 rows + 8 columns of grid lines
    assert len(segs) == 16
    # zero displacement: the first grid row is the horizontal line r=0
    first = segs[0]
    assert np.allclose(first[:, 1], 0.0)
    assert ax.yaxis_inverted()
    plt.close(fig)


def test_gridplot_offsets_lines(rng):
    u = np.zeros((1, 2, 16, 16), dtype=np.float32)
    u[0, 0] = 2.0  # constant shift along axis 0
    fig, ax = plt.subplots()
    vis.gridplot(u, Nx=4, Ny=4, ax=ax)
    segs = ax.collections[0].get_segments()
    assert np.allclose(segs[0][:, 1], 2.0)  # row 0 plotted at r=2
    plt.close(fig)


def test_gridplot_rejects_batched_or_3d():
    with pytest.raises(ValueError):
        vis.gridplot(np.zeros((2, 2, 8, 8), dtype=np.float32))
    with pytest.raises(ValueError):
        vis.gridplot(np.zeros((1, 3, 8, 8, 8), dtype=np.float32))


def test_quiver_smoke(rng):
    u = rng.standard_normal((1, 2, 16, 16)).astype(np.float32)
    fig, ax = plt.subplots()
    vis.quiver(u, Nx=4, Ny=4, ax=ax)
    assert len(ax.collections) == 1
    plt.close(fig)
