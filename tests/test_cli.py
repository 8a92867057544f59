"""End-to-end CLI workflow tests: affine atlas -> standardize, lddmm atlas
(the reference's main entry points, SURVEY.md §3.1/3.4/3.5 — untested in
the reference)."""
import os
import subprocess
import sys

import numpy as np
import h5py
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # drop any sitecustomize dirs that force a hardware platform; keep only
    # the repo on PYTHONPATH so the subprocess really runs on CPU
    env["PYTHONPATH"] = REPO
    return subprocess.run(
        [sys.executable, "-m", "lagomorph_tpu"] + args,
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=600,
    )


@pytest.fixture
def image_h5(tmp_path, rng):
    fn = str(tmp_path / "imgs.h5")
    res = 12
    grid = np.stack(np.meshgrid(*[np.arange(res, dtype=float)] * 2, indexing="ij"))
    c = (res - 1) / 2
    imgs = []
    for i in range(6):
        off = rng.uniform(-1.5, 1.5, 2)
        r2 = (grid[0] - c - off[0]) ** 2 + (grid[1] - c - off[1]) ** 2
        imgs.append(np.exp(-r2 / (2 * (res / 5) ** 2)))
    imgs = np.stack(imgs)[:, None].astype(np.float32)
    with h5py.File(fn, "w") as f:
        f.create_dataset("images", data=imgs)
    return fn


def test_cli_affine_atlas_and_standardize(image_h5, tmp_path):
    atlas = str(tmp_path / "affine_atlas.h5")
    r = run_cli(
        [
            "affine",
            "atlas",
            image_h5,
            atlas,
            "--num_epochs",
            "3",
            "--batch_size",
            "6",
            "--learning_rate_I",
            "100",
        ]
    )
    assert r.returncode == 0, r.stderr[-3000:]
    with h5py.File(atlas, "r") as f:
        assert set(f.keys()) == {"atlas", "A", "T", "epoch_losses", "iter_losses"}
        assert f["A"].shape == (6, 2, 2)
        assert "lagomorph_version" in f["atlas"].attrs
        losses = np.asarray(f["epoch_losses"])
        assert losses[-1] <= losses[0]

    out = str(tmp_path / "standardized.h5")
    r = run_cli(["affine", "standardize", image_h5, atlas, out])
    assert r.returncode == 0, r.stderr[-3000:]
    with h5py.File(out, "r") as f:
        assert f["images"].shape == (6, 1, 12, 12)
        assert np.isfinite(np.asarray(f["images"])).all()


def test_cli_lddmm_atlas(image_h5, tmp_path):
    atlas = str(tmp_path / "lddmm_atlas.h5")
    r = run_cli(
        [
            "lddmm",
            "atlas",
            image_h5,
            atlas,
            "--num_epochs",
            "2",
            "--batch_size",
            "6",
            "--lddmm_integration_steps",
            "2",
            "--fluid_alpha",
            "0.01",
            "--fluid_gamma",
            "0.1",
            "--learning_rate_m",
            "1e-4",
            "--learning_rate_I",
            "100",
        ]
    )
    assert r.returncode == 0, r.stderr[-3000:]
    with h5py.File(atlas, "r") as f:
        assert "atlas" in f and "momenta" in f
        assert f["momenta"].shape == (6, 2, 12, 12)
        assert "lagomorph_version" in f["atlas"].attrs
        losses = np.asarray(f["epoch_losses"])
        assert losses[-1] <= losses[0]


def test_cli_lddmm_atlas_warmstart_checkpoint(image_h5, tmp_path):
    atlas = str(tmp_path / "a1.h5")
    ckpt = str(tmp_path / "ck_{epoch}.h5")
    r = run_cli(
        [
            "lddmm", "atlas", image_h5, atlas,
            "--num_epochs", "1", "--batch_size", "6",
            "--lddmm_integration_steps", "2",
            "--checkpoint", ckpt,
        ]
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.isfile(str(tmp_path / "ck_0.h5"))
    # warm start from the checkpoint
    atlas2 = str(tmp_path / "a2.h5")
    r = run_cli(
        [
            "lddmm", "atlas", image_h5, atlas2,
            "--num_epochs", "1", "--batch_size", "6",
            "--lddmm_integration_steps", "2",
            "--initial_atlas", str(tmp_path / "ck_0.h5"),
        ]
    )
    assert r.returncode == 0, r.stderr[-3000:]


def test_cli_help():
    r = run_cli(["--help"])
    assert r.returncode == 0
    for sub in ("affine", "data", "lddmm"):
        assert sub in r.stdout


def test_cli_fluid_transform_and_warp_mode_flags(image_h5, tmp_path):
    """--fluid_transform / --warp_mode compute flags are accepted and the
    atlas still trains (values equal the default path to f32 tolerance)."""
    out = str(tmp_path / "atlas_flags.h5")
    r = run_cli(
        [
            "lddmm", "atlas", image_h5, out,
            "--num_epochs", "1", "--batch_size", "2",
            "--lddmm_integration_steps", "2",
            "--fluid_transform", "packed",
            "--warp_mode", "general",
        ]
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    import h5py

    with h5py.File(out, "r") as f:
        assert np.isfinite(f["atlas"][...]).all()
