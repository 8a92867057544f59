"""2D LDDMM atlas building on synthetic data.

Builds a dataset of warped blobs, recovers the atlas and per-subject
momenta with the LDDMM atlas builder, optionally over all local devices
(data parallel).

Run:  python examples/lddmm_atlas.py [--mesh]
"""
import argparse

import numpy as np

import lagomorph_tpu as lm


def make_dataset(n=16, res=32, seed=0):
    rng = np.random.default_rng(seed)
    grid = np.stack(np.meshgrid(*[np.arange(res, dtype=np.float64)] * 2, indexing="ij"))
    c = (res - 1) / 2
    imgs = []
    for _ in range(n):
        off = rng.uniform(-2, 2, 2)
        w = res / 6 * (1 + 0.15 * rng.standard_normal())
        r2 = (grid[0] - c - off[0]) ** 2 + (grid[1] - c - off[1]) ** 2
        imgs.append(np.exp(-r2 / (2 * w**2)))
    return np.stack(imgs)[:, None].astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--res", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--mesh", action="store_true", help="data-parallel over all devices")
    args = ap.parse_args()

    mesh = None
    if args.mesh:
        from lagomorph_tpu.parallel import get_mesh

        mesh = get_mesh()

    imgs = make_dataset(args.n, args.res)
    builder = lm.LDDMMAtlasBuilder(
        list(imgs),
        num_epochs=args.epochs,
        batch_size=args.n,
        lddmm_integration_steps=5,
        reg_weight=1e-2,
        learning_rate_pose=1e-3,
        learning_rate_image=50.0,
        metric=lm.FluidMetric([0.05, 0.0, 0.05]),
        mesh=mesh,
    )
    builder.run()
    print(f"loss: {builder.epoch_losses[0]:.6f} -> {builder.epoch_losses[-1]:.6f}")
    builder.save("lddmm_atlas_example.h5")
    print("wrote lddmm_atlas_example.h5")


if __name__ == "__main__":
    main()
