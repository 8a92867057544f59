"""Data layer and CLI tests (dataset zoo, HDF5 IO, batch_average, CLI verbs).

The reference has no tests for its data layer; these cover the mirrored
surface (reference lagomorph/data.py)."""
import subprocess
import sys
import os

import numpy as np
import h5py
import pytest

from lagomorph_tpu import data as ld

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def h5file(tmp_path, rng):
    fn = str(tmp_path / "in.h5")
    imgs = rng.standard_normal((6, 1, 8, 8)).astype(np.float32)
    labels = (np.arange(6) % 2).astype(np.int64)
    with h5py.File(fn, "w") as f:
        f.create_dataset("images", data=imgs)
        f.create_dataset("labels", data=labels)
    return fn, imgs, labels


def test_h5dataset(h5file):
    fn, imgs, labels = h5file
    ds = ld.H5Dataset(fn, key="images")
    assert len(ds) == 6
    assert np.allclose(ds[2], imgs[2])
    # multi-key
    ds2 = ld.H5Dataset(fn, key=("images", "labels"))
    im, lab = ds2[3]
    assert np.allclose(im, imgs[3]) and lab == labels[3]
    # force_dim prepends axes
    ds3 = ld.H5Dataset(fn, key="images", force_dim=4)
    assert ds3[0].shape == (1, 1, 1, 8, 8)


def test_dataset_wrappers(h5file):
    fn, imgs, _ = h5file
    ds = ld.H5Dataset(fn, key="images")
    ids = ld.IndexedDataset(ds)
    i, x = ids[4]
    assert i == 4 and np.allclose(x, imgs[4])
    sub = ld.SubsetDataset(ds, [5, 0])
    assert np.allclose(sub[0], imgs[5]) and len(sub) == 2
    mp = ld.MapDataset(ds, lambda x: 2 * x)
    assert np.allclose(mp[1], 2 * imgs[1])
    mem = ld.MemoryDataset(ds, progress_bar=False)
    assert np.allclose(mem[3], imgs[3])
    crop = ld.CropDataset(ds, [(1, 7, None), (2, 6, None)])
    assert crop[0].shape == (1, 6, 4)
    assert np.allclose(crop[0], imgs[0][:, 1:7, 2:6])
    ne = ld.NumexprDataset(ds, "x/2")
    assert np.allclose(ne[0], imgs[0] / 2)


def test_downscaled_dataset(h5file):
    fn, imgs, _ = h5file
    ds = ld.H5Dataset(fn, key="images")
    dd = ld.DownscaledDataset(ds, 2)
    out = dd[0]
    assert out.shape == (1, 4, 4)
    assert np.allclose(out[0, 0, 0], imgs[0, 0, :2, :2].mean())


def test_cached_datasets(h5file, tmp_path):
    fn, imgs, _ = h5file
    ds = ld.H5Dataset(fn, key="images")
    pre = ld.PreCachedDataset(ds, cache_dir=str(tmp_path))
    assert np.allclose(pre[2], imgs[2])
    lazy = ld.LazyCachedDataset(ds, cache_dir=str(tmp_path))
    assert np.allclose(lazy[1], imgs[1])
    assert np.allclose(lazy[1], imgs[1])  # second hit from cache
    batches = ld.batch_iterator(ds, 4)
    cdl = ld.CachedDataLoader(batches, cache_dir=str(tmp_path), progress_bar=False)
    got = list(cdl)
    assert len(got) == 2 and got[0].shape == (4, 1, 8, 8)
    assert np.allclose(np.concatenate(got), imgs)


def test_batch_iterator_and_average(h5file):
    fn, imgs, _ = h5file
    ds = ld.H5Dataset(fn, key="images")
    batches = list(ld.batch_iterator(ds, 4))
    assert batches[0].shape == (4, 1, 8, 8) and batches[1].shape == (2, 1, 8, 8)
    avg = ld.batch_average(batches, progress_bar=False)
    assert np.allclose(avg, imgs.mean(axis=0), atol=1e-6)
    # indexed variant
    ibatches = list(ld.batch_iterator(ld.IndexedDataset(ds), 4))
    ix, arr = ibatches[0]
    assert list(ix) == [0, 1, 2, 3]
    avg2 = ld.batch_average(ibatches, progress_bar=False)
    assert np.allclose(avg2, avg)


def test_write_load_roundtrip(h5file, tmp_path):
    fn, imgs, _ = h5file
    ds = ld.H5Dataset(fn, key="images")
    out = str(tmp_path / "out.h5")
    ld.write_dataset(ds, out, key="images")
    ds2 = ld.load_dataset(out, key="images")
    assert len(ds2) == 6
    assert np.allclose(ds2[3], imgs[3])


def run_cli(args, cwd=REPO):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # only the repo on PYTHONPATH: the environment's sitecustomize would
    # otherwise force the remote TPU platform in the subprocess
    env["PYTHONPATH"] = REPO
    return subprocess.run(
        [sys.executable, "-m", "lagomorph_tpu"] + args,
        capture_output=True,
        text=True,
        cwd=cwd,
        env=env,
    )


def test_cli_average(h5file, tmp_path):
    fn, imgs, _ = h5file
    out = str(tmp_path / "avg.h5")
    r = run_cli(["data", "average", fn, out])
    assert r.returncode == 0, r.stderr
    with h5py.File(out, "r") as f:
        got = np.asarray(f["average_image"])
        assert np.allclose(got[0], imgs.mean(axis=0), atol=1e-6)
        assert "lagomorph_version" in f["average_image"].attrs
        assert "command_args" in f["average_image"].attrs


def test_cli_downscale_and_crop(h5file, tmp_path):
    fn, imgs, _ = h5file
    out = str(tmp_path / "ds.h5")
    r = run_cli(["data", "downscale", fn, out, "--scale", "2", "--copy_other_keys"])
    assert r.returncode == 0, r.stderr
    with h5py.File(out, "r") as f:
        assert f["images"].shape == (6, 1, 4, 4)
        assert "labels" in f  # copied

    out2 = str(tmp_path / "crop.h5")
    r = run_cli(["data", "crop", fn, out2, "--slices", "0:6,0:4"])
    assert r.returncode == 0, r.stderr
    with h5py.File(out2, "r") as f:
        assert f["images"].shape == (6, 1, 6, 4)


def test_cli_split(h5file, tmp_path):
    fn, _, _ = h5file
    tr = str(tmp_path / "train.h5")
    te = str(tmp_path / "test.h5")
    r = run_cli(
        ["data", "split", fn, tr, te, "--h5keys", "images,labels", "--test_size", "0.5"]
    )
    assert r.returncode == 0, r.stderr
    with h5py.File(tr, "r") as f, h5py.File(te, "r") as g:
        assert f["images"].shape[0] + g["images"].shape[0] == 6


def test_profiling_utils():
    import jax.numpy as jnp
    from lagomorph_tpu.profiling import device_time, Timer

    t = device_time(lambda x: jnp.sum(x * 2), jnp.ones((64, 64)))
    assert t >= 0
    tm = Timer()
    with tm("a"):
        pass
    s = tm.summary()
    assert s["a"]["count"] == 1


def test_numexpr_fallback_is_vetted(monkeypatch):
    """Without numexpr the fallback is an AST-whitelisted evaluator, not a
    bare eval: arithmetic works, arbitrary code is rejected (round-2
    advisor/VERDICT security finding)."""
    ds = [np.full((1, 4, 4), 2.0)]
    monkeypatch.setitem(sys.modules, "numexpr", None)  # import -> ImportError
    out = ld.NumexprDataset(ds, "sqrt(x)*3 + 1")[0]
    assert np.allclose(out, np.sqrt(2.0) * 3 + 1)
    out = ld.NumexprDataset(ds, "where(x > 1, x, 0)")[0]
    assert np.allclose(out, 2.0)
    for bad in (
        "__import__('os').system('true')",
        "x.dtype",
        "x[0]",
        "(lambda: 1)()",
        "[i for i in (1,)]",
        "open('/etc/passwd')",
        "y + 1",
    ):
        with pytest.raises(ValueError):
            ld.NumexprDataset(ds, bad)[0]


def test_process_prefetcher_basics(h5file, tmp_path):
    """ProcessPrefetcher: worker processes deliver the same bytes as direct
    reads, in any fetch order, with fallback for unsubmitted indices."""
    fn, imgs, _ = h5file
    ds = ld.H5Dataset(fn, key="images")
    batches = ld.CachedDataLoader(
        ld.batch_iterator(ds, 2), cache_dir=str(tmp_path), progress_bar=False
    )
    pf = ld.ProcessPrefetcher(batches, workers=2)
    try:
        pf.submit(0)
        pf.submit(2)
        # out-of-submission-order fetch + unsubmitted fallback
        assert np.array_equal(pf.get(2), batches[2])
        assert np.array_equal(pf.get(1), batches[1])  # never submitted
        assert np.array_equal(pf.get(0), batches[0])
        # resubmission after fetch (next epoch)
        pf.submit(0)
        assert np.array_equal(pf.get(0), batches[0])
    finally:
        pf.close()
    pf.close()  # idempotent


def test_process_prefetcher_oversize_and_errors():
    """Batches larger than the slot travel through the queue; worker
    exceptions re-raise in the parent; a ring full of unfetched batches is
    an error rather than a deadlock."""

    class Weird:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            if i == 3:
                raise ValueError("boom")
            # batch 0 (the slot-size probe) is SMALLER than batch 2
            return np.full((2 + 4 * i,), float(i), np.float32)

    pf = ld.ProcessPrefetcher(Weird(), workers=1, depth=2)
    try:
        pf.submit(1)
        pf.submit(2)  # oversize vs the batch-0 probe
        assert np.array_equal(pf.get(2), np.full((10,), 2.0, np.float32))
        assert np.array_equal(pf.get(1), np.full((6,), 1.0, np.float32))
        pf.submit(3)
        import pytest as _pytest

        with _pytest.raises(ValueError, match="boom"):
            pf.get(3)
        pf.submit(0)
        pf.submit(1)
        pf.get(0), pf.get(1)
    finally:
        pf.close()


def test_process_prefetcher_degrades_instead_of_hanging(monkeypatch):
    """Watchdog: a worker pool that never delivers (wedged fork / dead
    workers) degrades to direct in-process reads within the timeout rather
    than blocking get() forever."""
    monkeypatch.setenv("LM_PREFETCH_TIMEOUT", "2")

    class Stuck:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            if os.getpid() != _PARENT_PID:  # in a worker: never deliver
                import time as _t

                _t.sleep(3600)
            return np.full((4,), float(i), np.float32)

    global _PARENT_PID
    _PARENT_PID = os.getpid()
    pf = ld.ProcessPrefetcher(Stuck(), workers=1, depth=2)
    try:
        pf.submit(1)
        with pytest.warns(RuntimeWarning, match="degraded"):
            out = pf.get(1)  # returns via direct read after the timeout
        assert np.array_equal(out, np.full((4,), 1.0, np.float32))
        assert pf._failed and not pf._procs
        pf.submit(2)  # no-op once degraded
        assert np.array_equal(pf.get(2), np.full((4,), 2.0, np.float32))

        # dead-pool branch: killed workers are detected well before the
        # timeout (liveness check each 1 s poll chunk)
        pf2 = ld.ProcessPrefetcher(Stuck(), workers=1, depth=2)
        pf2.submit(1)
        for p in pf2._procs:
            p.kill()
            p.join()
        with pytest.warns(RuntimeWarning, match="degraded"):
            assert np.array_equal(
                pf2.get(1), np.full((4,), 1.0, np.float32)
            )
        pf2.close()
    finally:
        pf.close()


def test_atlas_builder_process_loader(h5file, tmp_path):
    """LDDMMAtlasBuilder(loader_workers=2, loader_mode='process') trains to
    the same state as synchronous staging."""
    import lagomorph_tpu as lm
    from lagomorph_tpu.lddmm import LDDMMAtlasBuilder

    fn, imgs, _ = h5file
    ds = ld.H5Dataset(fn, key="images", force_dim=3)
    kw = dict(
        num_epochs=2, batch_size=2, lddmm_integration_steps=2,
        reg_weight=0.5, learning_rate_pose=1e-4, learning_rate_image=1e-2,
        metric=lm.FluidMetric([0.1, 0.0, 1.0]), progress_bar=False,
        dataloader_cache=str(tmp_path / "cache"),
    )
    sync = LDDMMAtlasBuilder(ds, **kw)
    sync.run()
    par = LDDMMAtlasBuilder(ds, loader_workers=2, loader_mode="process", **kw)
    par.run()
    assert par._img_prefetch is None  # closed after run()
    assert np.allclose(np.asarray(par.I), np.asarray(sync.I))
    for a, b in zip(par.ms, sync.ms):
        assert np.allclose(np.asarray(a), np.asarray(b))
    assert np.allclose(par.epoch_losses, sync.epoch_losses)
