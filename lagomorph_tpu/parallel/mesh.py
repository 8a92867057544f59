"""Global device mesh management and sharding helpers."""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_MESH = None


def get_mesh(axis_name: str = "data", devices=None) -> Mesh:
    """Return (and cache) a 1D data-parallel mesh over all devices.

    Multi-host: uses all global devices — call
    ``jax.distributed.initialize()`` first (handled by the CLI Tool).
    """
    global _MESH
    if _MESH is not None and devices is None:
        return _MESH
    if devices is None:
        devices = jax.devices()
    mesh = Mesh(np.asarray(devices), (axis_name,))
    if devices is None or len(devices) == len(jax.devices()):
        _MESH = mesh
    return mesh


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding that splits the leading (batch) axis over the mesh."""
    axis = mesh.axis_names[0]
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spatial_sharding(mesh: Mesh, ndim: int, spatial_axis: int = 0) -> NamedSharding:
    """Sharding that splits one spatial axis of an NC+spatial array over the
    mesh (spatial/grid parallelism — the TPU analogue of sequence
    parallelism for volumetric grids, SURVEY.md §5).  ``ndim`` is the total
    array rank; ``spatial_axis`` indexes into the spatial dims (0 = first
    spatial axis, i.e. array axis 2).

    Under jit, GSPMD turns the stencil/interp/FFT ops into halo exchanges
    and reshards automatically; correctness is identical to replicated
    execution (see tests/test_parallel.py)."""
    axis = mesh.axis_names[0]
    spec = [None] * ndim
    spec[2 + spatial_axis] = axis
    return NamedSharding(mesh, P(*spec))


def shard_batch(x, mesh: Mesh):
    """Place an array with its leading axis sharded over the mesh."""
    return jax.device_put(x, data_sharding(mesh))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, replicated_sharding(mesh))


def pad_batch_to_multiple(x: np.ndarray, multiple: int):
    """Pad the leading axis up to a multiple (needed to shard uneven final
    minibatches).  Returns (padded, original_size)."""
    n = x.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = np.repeat(x[-1:], rem, axis=0)
    return np.concatenate([x, pad], axis=0), n
