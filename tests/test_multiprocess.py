"""True multi-process data-parallel training: 2 jax.distributed processes
(4 virtual CPU devices each) train the LDDMM atlas and must match a
single-process run over the same global batches.

This exercises the full multi-host path the reference reaches via
mpirun+NCCL (reference utils.py:148-166, lddmm.py:164-198): per-process
dataset shards, jax.make_array_from_process_local_data staging, GSPMD psum
across processes, and per-rank momenta extraction.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests.test_atlas import make_synth_images

HELPER = os.path.join(os.path.dirname(__file__), "helpers", "mp_atlas_train.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.parametrize("keep", [False, True], ids=["stream", "on_device"])
def test_two_process_atlas_matches_single(rng, tmp_path, keep):
    n, res = 16, 12
    imgs = make_synth_images(rng, n=n, res=res)
    data_path = str(tmp_path / "imgs.npy")
    np.save(data_path, imgs)

    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, HELPER, str(r), "2", str(port), data_path,
             str(tmp_path), "keep" if keep else "stream"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for r in range(2)
    ]
    outs = [p.communicate(timeout=800)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    r0 = np.load(tmp_path / "rank0.npz")
    r1 = np.load(tmp_path / "rank1.npz")

    # the HDF5 checkpoints must exist and hold each rank's real momenta rows
    import h5py

    for r, rr in enumerate((r0, r1)):
        with h5py.File(tmp_path / f"ckpt_rank{r}.h5", "r") as f:
            assert f["momenta"].shape[0] == rr["momenta"].shape[0]
            assert np.allclose(f["momenta"][...], rr["momenta"], atol=1e-7)

    # both ranks must hold the identical (replicated) atlas
    assert np.allclose(r0["atlas"], r1["atlas"], atol=1e-6)
    # and identical global losses
    assert np.allclose(r0["iter_losses"], r1["iter_losses"], atol=1e-7)

    # single-process equivalent: per-process shards are interleaved
    # (rank, rank+2, ...) and each global batch k concatenates rank 0's k-th
    # local batch with rank 1's; reorder the dataset so batch_size=8
    # single-process batches reproduce the global batches exactly
    import lagomorph_tpu as lm
    from lagomorph_tpu.lddmm import LDDMMAtlasBuilder

    shard0 = list(range(0, n, 2))
    shard1 = list(range(1, n, 2))
    bs = 4
    order = []
    for k in range(len(shard0) // bs):
        order += shard0[k * bs:(k + 1) * bs] + shard1[k * bs:(k + 1) * bs]
    builder = LDDMMAtlasBuilder(
        [imgs[i] for i in order],
        num_epochs=2,
        batch_size=2 * bs,
        lddmm_integration_steps=3,
        metric=lm.FluidMetric([0.1, 0.0, 0.01]),
        learning_rate_pose=1e-3,
        learning_rate_image=1e2,
        progress_bar=False,
    )
    builder.run()

    atlas_sp = np.asarray(builder.I)
    assert np.allclose(r0["atlas"], atlas_sp, atol=1e-4), (
        np.abs(r0["atlas"] - atlas_sp).max()
    )
    assert np.allclose(
        r0["iter_losses"], np.asarray(builder.iter_losses), rtol=1e-5, atol=1e-7
    )

    # per-subject momenta must match the single-process run subject-by-subject
    ms_sp = np.concatenate([np.asarray(m) for m in builder.ms], axis=0)
    mp_momenta = {}
    for r in (r0, r1):
        for subj, m in zip(r["subjects"], r["momenta"]):
            mp_momenta[int(subj)] = m
    for pos, subj in enumerate(order):
        assert np.allclose(mp_momenta[subj], ms_sp[pos], atol=1e-6), subj
