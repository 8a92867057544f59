"""Multi-process (multi-host) data-parallel helpers.

The reference shards subjects across MPI ranks with a DistributedSampler and
combines gradients/losses with NCCL all_reduce (reference lddmm.py:164-168,
196-198; utils.py:148-166).  The TPU-native equivalent implemented here:

* each process owns an interleaved shard of the dataset
  (:func:`process_shard_indices` — the DistributedSampler analogue);
* per-iteration minibatches are process-local numpy arrays assembled into
  one *global* batch-sharded ``jax.Array`` with
  ``jax.make_array_from_process_local_data`` (:func:`put_global`);
* the jitted update step runs on the global mesh — GSPMD inserts the psum
  collectives that replace the reference's explicit all_reduce calls;
* updated per-subject state (momenta) is extracted back to process-local
  numpy with :func:`local_shard`.

Everything degrades to plain single-process behavior when
``jax.process_count() == 1``.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def process_shard_indices(n: int, world: int | None = None, rank: int | None = None):
    """This process's subject indices: interleaved ``rank, rank+world, ...``
    (same assignment rule as torch's DistributedSampler without padding)."""
    world = jax.process_count() if world is None else world
    rank = jax.process_index() if rank is None else rank
    return list(range(rank, n, world))


def shard_sizes(n: int, world: int) -> list:
    """Number of subjects owned by each process."""
    return [len(range(r, n, world)) for r in range(world)]


def put_global(local_np: np.ndarray, sharding) -> jax.Array:
    """Assemble a process-local batch (equal leading size on every process)
    into a global batch-sharded array; plain device_put single-process."""
    local_np = np.asarray(local_np)
    if jax.process_count() == 1:
        return jax.device_put(local_np, sharding)
    gshape = (local_np.shape[0] * jax.process_count(),) + local_np.shape[1:]
    return jax.make_array_from_process_local_data(sharding, local_np, gshape)


def local_shard(garr: jax.Array) -> np.ndarray:
    """This process's rows of a batch-sharded global array, in global row
    order (the inverse of :func:`put_global`)."""
    if jax.process_count() == 1:
        return np.asarray(garr)
    shards = sorted(
        garr.addressable_shards, key=lambda s: s.index[0].start or 0
    )
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def allsum_hosts(x) -> np.ndarray:
    """Elementwise sum of a (small) host array across processes.

    float64 inputs keep (close to) float64 precision even when jax x64 is
    disabled: the value is split into a hi/lo float32 pair (double-float
    representation) for the device allgather and recombined in float64 on
    host, so the multi-process atlas-mean init matches the single-process
    ``batch_average`` float64 accumulation."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    x = np.asarray(x)
    if x.dtype == np.float64 and not jax.config.jax_enable_x64:
        hi = x.astype(np.float32)
        lo = (x - hi.astype(np.float64)).astype(np.float32)
        ghi, glo = multihost_utils.process_allgather(
            (jnp.asarray(hi), jnp.asarray(lo))
        )
        pairs = np.asarray(ghi, dtype=np.float64) + np.asarray(
            glo, dtype=np.float64
        )
        return pairs.sum(axis=0)
    g = multihost_utils.process_allgather(jnp.asarray(x))
    return np.asarray(g).sum(axis=0)
