"""End-to-end atlas building tests on synthetic data, single-device and
data-parallel over the virtual 8-device CPU mesh.  The reference has no
atlas or distributed tests at all (SURVEY.md §4); these close that gap."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import lagomorph_tpu as lm
from lagomorph_tpu.data import batch_iterator


def make_synth_images(rng, n=8, res=16, dim=2, shift_scale=1.5):
    """Blobs with random offsets: a dataset whose atlas is a centered blob."""
    grid = np.stack(
        np.meshgrid(*[np.arange(res, dtype=np.float64)] * dim, indexing="ij")
    )
    c = (res - 1) / 2.0
    imgs = []
    for i in range(n):
        off = rng.uniform(-shift_scale, shift_scale, dim)
        r2 = sum((grid[d] - c - off[d]) ** 2 for d in range(dim))
        imgs.append(np.exp(-r2 / (2 * (res / 6) ** 2)))
    return np.stack(imgs)[:, None].astype(np.float32)  # (n, 1, *sp)


def test_affine_atlas_reduces_loss(rng):
    imgs = make_synth_images(rng, n=8, res=16)
    n = imgs.shape[0]
    As = np.zeros((n, 2, 2), dtype=np.float32)
    Ts = np.zeros((n, 2), dtype=np.float32)
    I, As, Ts, epoch_losses, iter_losses = lm.affine_atlas(
        list(imgs),
        As,
        Ts,
        num_epochs=5,
        batch_size=4,
        learning_rate_A=1e-4,
        learning_rate_T=1e-2,
        learning_rate_I=1e2,
        progress_bar=False,
    )
    assert epoch_losses[-1] < epoch_losses[0]
    assert np.isfinite(np.asarray(I)).all()
    assert np.abs(Ts).max() > 0  # translations actually moved


def test_affine_atlas_mesh_matches_single(rng):
    """Data-parallel mesh run must match the single-device run exactly
    (deterministic arithmetic, same global batches)."""
    from lagomorph_tpu.parallel import get_mesh

    imgs = make_synth_images(rng, n=8, res=12)
    n = imgs.shape[0]

    def run(mesh):
        As = np.zeros((n, 2, 2), dtype=np.float32)
        Ts = np.zeros((n, 2), dtype=np.float32)
        return lm.affine_atlas(
            list(imgs),
            As,
            Ts,
            num_epochs=2,
            batch_size=8,
            learning_rate_A=1e-4,
            learning_rate_T=1e-2,
            learning_rate_I=1e2,
            mesh=mesh,
            progress_bar=False,
        )

    I0, As0, Ts0, el0, _ = run(None)
    mesh = get_mesh()
    I1, As1, Ts1, el1, _ = run(mesh)
    assert np.allclose(np.asarray(I0), np.asarray(I1), atol=1e-5)
    assert np.allclose(As0, As1, atol=1e-6)
    assert np.allclose(Ts0, Ts1, atol=1e-6)
    assert np.allclose(el0, el1, rtol=1e-4)


def test_lddmm_atlas_builder(rng, tmp_path):
    imgs = make_synth_images(rng, n=4, res=12)
    builder = lm.LDDMMAtlasBuilder(
        list(imgs),
        num_epochs=2,
        batch_size=2,
        lddmm_integration_steps=3,
        reg_weight=1e-1,
        learning_rate_pose=1e-4,
        learning_rate_image=1e2,
        metric=lm.FluidMetric([0.01, 0.0, 0.1]),
        progress_bar=False,
    )
    builder.run()
    assert builder.epoch_losses[-1] < builder.epoch_losses[0]
    # checkpoint round trip (schema matches reference lddmm.py:238-285)
    fn = str(tmp_path / "atlas.h5")
    builder.save(fn)
    import h5py

    with h5py.File(fn, "r") as f:
        assert set(f.keys()) == {
            "atlas",
            "momenta",
            "epoch_losses",
            "epoch_reg_terms",
            "iter_losses",
            "iter_reg_terms",
        }
        assert f["momenta"].shape[0] == 4

    b2 = lm.LDDMMAtlasBuilder(
        list(imgs),
        num_epochs=1,
        batch_size=2,
        lddmm_integration_steps=3,
        metric=lm.FluidMetric([0.01, 0.0, 0.1]),
        progress_bar=False,
    )
    b2.load(fn)
    b2.initialize()
    assert np.allclose(np.asarray(b2.I).squeeze(), np.asarray(builder.I).squeeze())
    assert np.allclose(b2.ms[0], builder.ms[0])


def test_lddmm_atlas_mesh_matches_single(rng):
    from lagomorph_tpu.parallel import get_mesh

    imgs = make_synth_images(rng, n=8, res=12)

    def run(mesh):
        builder = lm.LDDMMAtlasBuilder(
            list(imgs),
            num_epochs=2,
            batch_size=8,
            lddmm_integration_steps=3,
            reg_weight=1e-1,
            learning_rate_pose=1e-4,
            learning_rate_image=1e2,
            metric=lm.FluidMetric([0.01, 0.0, 0.1]),
            mesh=mesh,
            progress_bar=False,
        )
        builder.run()
        return builder

    b0 = run(None)
    b1 = run(get_mesh())
    assert np.allclose(np.asarray(b0.I), np.asarray(b1.I), atol=1e-5)
    assert np.allclose(b0.ms[0], b1.ms[0], atol=1e-5)
    assert np.allclose(b0.epoch_losses, b1.epoch_losses, rtol=1e-4)


def test_lddmm_atlas_momentum_downscale(rng):
    """Multiscale path: momenta on a coarser grid than the image
    (reference --deformation_downscale, lddmm.py:459-464,501-509)."""
    imgs = make_synth_images(rng, n=2, res=16)
    builder = lm.LDDMMAtlasBuilder(
        list(imgs),
        num_epochs=1,
        batch_size=2,
        lddmm_integration_steps=2,
        momentum_shape=(8, 8),
        metric=lm.FluidMetric([0.01, 0.0, 0.1]),
        progress_bar=False,
    )
    builder.run()
    assert builder.ms[0].shape == (2, 2, 8, 8)
    assert np.isfinite(builder.ms[0]).all()


def test_lddmm_atlas_momentum_preconditioning(rng):
    imgs = make_synth_images(rng, n=2, res=8)
    builder = lm.LDDMMAtlasBuilder(
        list(imgs),
        num_epochs=1,
        batch_size=2,
        lddmm_integration_steps=2,
        momentum_preconditioning=True,
        metric=lm.FluidMetric([0.01, 0.0, 0.1]),
        progress_bar=False,
    )
    builder.run()
    assert np.isfinite(builder.ms[0]).all()


def test_lddmm_atlas_dataloader_cache(rng, tmp_path):
    """Disk-cached minibatches (native readahead or Python fallback) give
    identical training results."""
    imgs = make_synth_images(rng, n=4, res=10)

    def run(cache):
        b = lm.LDDMMAtlasBuilder(
            list(imgs),
            num_epochs=1,
            batch_size=2,
            lddmm_integration_steps=2,
            metric=lm.FluidMetric([0.01, 0.0, 0.1]),
            dataloader_cache=str(tmp_path) if cache else None,
            progress_bar=False,
        )
        b.run()
        return b

    b0 = run(False)
    b1 = run(True)
    assert np.allclose(np.asarray(b0.I), np.asarray(b1.I))
    assert np.allclose(b0.ms[0], b1.ms[0])


def test_lddmm_atlas_keep_data_on_device(rng, tmp_path):
    """On-device data staging gives identical results to host streaming."""
    imgs = make_synth_images(rng, n=5, res=10)

    def run(on_device):
        b = lm.LDDMMAtlasBuilder(
            list(imgs),
            num_epochs=2,
            batch_size=2,  # uneven final batch exercises padding
            lddmm_integration_steps=2,
            learning_rate_pose=1e-4,
            learning_rate_image=10.0,
            metric=lm.FluidMetric([0.01, 0.0, 0.1]),
            keep_data_on_device=on_device,
            progress_bar=False,
        )
        b.run()
        return b

    b0 = run(False)
    b1 = run(True)
    assert np.allclose(np.asarray(b0.I), np.asarray(b1.I), atol=1e-6)
    for m0, m1 in zip(b0._momenta_host(), b1._momenta_host()):
        assert m0.shape == m1.shape
        assert np.allclose(m0, m1, atol=1e-6)
    fn = str(tmp_path / "ondev.h5")
    b1.save(fn)
    import h5py

    with h5py.File(fn, "r") as f:
        assert f["momenta"].shape[0] == 5


def test_affine_atlas_keep_data_on_device(rng):
    imgs = make_synth_images(rng, n=5, res=12)

    def run(on_device):
        As = np.zeros((5, 2, 2), dtype=np.float32)
        Ts = np.zeros((5, 2), dtype=np.float32)
        return lm.affine_atlas(
            list(imgs), As, Ts,
            num_epochs=3, batch_size=2,  # uneven final batch
            learning_rate_A=1e-4, learning_rate_T=1e-2, learning_rate_I=1e2,
            keep_data_on_device=on_device, progress_bar=False,
        )

    I0, As0, Ts0, el0, _ = run(False)
    I1, As1, Ts1, el1, _ = run(True)
    assert np.allclose(np.asarray(I0), np.asarray(I1), atol=1e-6)
    assert np.allclose(As0, As1, atol=1e-6)
    assert np.allclose(Ts0, Ts1, atol=1e-6)
    assert np.allclose(el0, el1, rtol=1e-5)


def test_lddmm_atlas_loader_workers_matches_sync(rng, tmp_path):
    """Async prefetch staging (loader_workers>0) must be bit-identical to
    synchronous staging — it only overlaps transfers with compute."""
    from lagomorph_tpu.lddmm import LDDMMAtlasBuilder

    imgs = make_synth_images(rng, n=6, res=12)
    metric = lm.FluidMetric([0.1, 0.0, 0.01])

    def run(workers):
        b = LDDMMAtlasBuilder(
            list(imgs),
            num_epochs=2,
            batch_size=4,  # uneven final batch exercises the pad+mask path
            metric=metric,
            learning_rate_pose=1e-3,
            learning_rate_image=1e2,
            loader_workers=workers,
            progress_bar=False,
        )
        b.run()
        return np.asarray(b.I), [np.asarray(m) for m in b.ms], b.iter_losses

    I0, ms0, l0 = run(0)
    I2, ms2, l2 = run(2)
    assert np.array_equal(I0, I2)
    for a, b_ in zip(ms0, ms2):
        assert np.array_equal(a, b_)
    assert l0 == l2


def test_cached_loader_random_access(rng, tmp_path):
    """CachedDataLoader supports O(1) indexed access into its .npy files."""
    from lagomorph_tpu.data import CachedDataLoader

    batches = [rng.standard_normal((3, 1, 4, 4)).astype(np.float32) for _ in range(4)]
    cdl = CachedDataLoader(iter(batches), cache_dir=str(tmp_path), progress_bar=False)
    assert len(cdl) == 4
    # indexed access out of order
    for i in (2, 0, 3, 1):
        assert np.array_equal(cdl[i], batches[i])
    # iteration still replays in order
    for got, want in zip(cdl, batches):
        assert np.array_equal(got, want)


def test_lddmm_atlas_cli_loader_flags(rng, tmp_path):
    """The lddmm atlas CLI accepts --dataloader_cache/--loader_workers."""
    import subprocess
    import sys
    import h5py

    imgs = make_synth_images(rng, n=4, res=8)
    inp = str(tmp_path / "in.h5")
    outp = str(tmp_path / "out.h5")
    with h5py.File(inp, "w") as f:
        f.create_dataset("images", data=imgs)
    cache = str(tmp_path / "cache")
    import os

    os.makedirs(cache, exist_ok=True)
    cmd = [
        sys.executable, "-m", "lagomorph_tpu", "lddmm", "atlas", inp, outp,
        "--num_epochs", "1", "--batch_size", "2",
        "--lddmm_integration_steps", "2",
        "--dataloader_cache", cache, "--loader_workers", "2",
        "--platform", "cpu",
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    with h5py.File(outp, "r") as f:
        assert f["atlas"].shape[-1] == 8
        assert f["momenta"].shape[0] == 4


def test_lddmm_atlas_bf16_image_storage(rng):
    """bf16 image storage trains close to the f32 run (storage-only
    rounding: compute stays f32)."""
    from lagomorph_tpu.lddmm import LDDMMAtlasBuilder

    imgs = make_synth_images(rng, n=4, res=12)
    metric = lm.FluidMetric([0.1, 0.0, 0.01])

    def run(image_dtype):
        b = LDDMMAtlasBuilder(
            list(imgs),
            num_epochs=2,
            batch_size=4,
            lddmm_integration_steps=2,
            metric=metric,
            learning_rate_pose=1e-3,
            learning_rate_image=1e2,
            image_dtype=image_dtype,
            progress_bar=False,
        )
        b.run()
        return np.asarray(b.I), np.asarray(b.iter_losses)

    I32, l32 = run(None)
    I16, l16 = run("bfloat16")
    assert np.isfinite(l16).all()
    # bf16 has ~3 decimal digits; trajectories stay close
    assert np.allclose(l16, l32, rtol=2e-2)
    assert np.allclose(I16, I32, rtol=0, atol=2e-2 * np.abs(I32).max())


def test_functional_lddmm_atlas_threads_loader_kwargs(rng, tmp_path):
    """The functional wrapper must pass keep_data_on_device / loader /
    image-dtype kwargs through to the builder (round-2 seam) and produce
    the same result as the default staging path."""
    imgs = make_synth_images(rng, n=4, res=12)
    kwargs = dict(
        num_epochs=2,
        batch_size=2,
        lddmm_integration_steps=3,
        reg_weight=1e-1,
        learning_rate_pose=1e-4,
        learning_rate_image=1e2,
        metric=lm.FluidMetric([0.01, 0.0, 0.1]),
        progress_bar=False,
    )
    I_ref, ms_ref, el_ref, *_ = lm.lddmm_atlas(list(imgs), **kwargs)
    I, ms, el, *_ = lm.lddmm_atlas(
        list(imgs),
        keep_data_on_device=True,
        dataloader_cache=str(tmp_path / "cache"),
        image_dtype="float32",
        **kwargs,
    )
    assert np.allclose(np.asarray(I), np.asarray(I_ref), atol=1e-6)
    assert np.allclose(np.asarray(el), np.asarray(el_ref), rtol=1e-6)
