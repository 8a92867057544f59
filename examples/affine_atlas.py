"""Affine atlas building on synthetic data (script analogue of the
reference's examples/AffineAtlas.ipynb, an LFS stub in the snapshot).

Builds a randomly shifted/sheared blob dataset, recovers per-subject affine
transforms and the atlas, and (optionally) renders results.

Run:  python examples/affine_atlas.py [--plot]
"""
import argparse

import numpy as np
import jax.numpy as jnp

import lagomorph_tpu as lm


def make_dataset(n=32, res=64, seed=0):
    rng = np.random.default_rng(seed)
    grid = np.stack(np.meshgrid(*[np.arange(res, dtype=np.float64)] * 2, indexing="ij"))
    c = (res - 1) / 2
    imgs = []
    for _ in range(n):
        A = np.eye(2) + 0.05 * rng.standard_normal((2, 2))
        t = rng.uniform(-3, 3, 2)
        x = np.einsum("ab,b...->a...", A, grid - c) + (t + c)[:, None, None]
        r2 = ((x[0] - c) / (res / 5)) ** 2 + ((x[1] - c) / (res / 7)) ** 2
        imgs.append(np.exp(-r2 / 2))
    return np.stack(imgs)[:, None].astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--plot", action="store_true")
    args = ap.parse_args()

    imgs = make_dataset(args.n, args.res)
    As = np.zeros((args.n, 2, 2), dtype=np.float32)
    Ts = np.zeros((args.n, 2), dtype=np.float32)

    I, As, Ts, epoch_losses, _ = lm.affine_atlas(
        list(imgs),
        As,
        Ts,
        num_epochs=args.epochs,
        batch_size=args.n,
        learning_rate_A=1e-3,
        learning_rate_T=1e-1,
        learning_rate_I=1e2,
    )
    print(f"loss: {epoch_losses[0]:.6f} -> {epoch_losses[-1]:.6f}")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib import pyplot as plt

        eye = np.eye(2, dtype=np.float32)
        Idef = lm.affine_interp(
            jnp.asarray(imgs[:8]), jnp.asarray(As[:8] + eye), jnp.asarray(Ts[:8])
        )
        fig, axes = plt.subplots(3, 8, figsize=(16, 6))
        for i in range(8):
            axes[0, i].imshow(imgs[i, 0])
            axes[1, i].imshow(np.asarray(Idef)[i, 0])
            axes[2, i].imshow(np.asarray(I)[0, 0])
        for ax in axes.ravel():
            ax.axis("off")
        axes[0, 0].set_title("inputs")
        axes[1, 0].set_title("aligned")
        axes[2, 0].set_title("atlas")
        fig.savefig("affine_atlas_example.png", dpi=80)
        print("wrote affine_atlas_example.png")


if __name__ == "__main__":
    main()
