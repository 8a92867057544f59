"""DeepLDDMMAtlas on synthetic data (script analogue of the reference's
examples/DeepLDDMMAtlas.ipynb, an LFS stub in the snapshot): a CNN predicts
per-subject initial momenta; the atlas image and network are trained jointly
through differentiable geodesic shooting.

Run:  python examples/deep_lddmm_atlas.py
"""
import argparse

import numpy as np

import lagomorph_tpu as lm
from lagomorph_tpu.models import DeepLDDMMAtlas


def make_dataset(n=32, res=32, seed=0):
    rng = np.random.default_rng(seed)
    grid = np.stack(np.meshgrid(*[np.arange(res, dtype=np.float64)] * 2, indexing="ij"))
    c = (res - 1) / 2
    imgs = []
    for _ in range(n):
        off = rng.uniform(-2.5, 2.5, 2)
        w = res / 6 * (1 + 0.2 * rng.standard_normal())
        r2 = (grid[0] - c - off[0]) ** 2 + (grid[1] - c - off[1]) ** 2
        imgs.append(np.exp(-r2 / (2 * w**2)))
    return np.stack(imgs)[:, None].astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--res", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=20)
    args = ap.parse_args()

    imgs = make_dataset(args.n, args.res)
    model = DeepLDDMMAtlas(
        list(imgs),
        metric=lm.FluidMetric([0.05, 0.0, 0.05]),
        batch_size=8,
        integration_steps=4,
        reg_weight=1e-2,
        learning_rate_net=1e-3,
        learning_rate_image=30.0,
    )
    model.fit(num_epochs=args.epochs)
    print(f"loss: {model.epoch_losses[0]:.6f} -> {model.epoch_losses[-1]:.6f}")


if __name__ == "__main__":
    main()
