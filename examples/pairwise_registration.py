"""Pairwise LDDMM registration of two synthetic 2D images (BASELINE.json
config 3) with a deformed-grid plot of the recovered transformation.

Run:  python examples/pairwise_registration.py [--plot]
"""
import argparse

import numpy as np
import jax.numpy as jnp

import lagomorph_tpu as lm
from lagomorph_tpu.models import lddmm_register


def blob(res, cx, cy, wx, wy):
    g = np.stack(np.meshgrid(*[np.arange(res, dtype=np.float64)] * 2, indexing="ij"))
    return np.exp(
        -(((g[0] - cx) / wx) ** 2 + ((g[1] - cy) / wy) ** 2) / 2
    ).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--plot", action="store_true")
    args = ap.parse_args()

    res = args.res
    c = (res - 1) / 2
    src = blob(res, c, c, res / 6, res / 6)[None, None]
    tgt = blob(res, c + 3, c - 2, res / 5, res / 7)[None, None]

    metric = lm.FluidMetric([0.1, 0.0, 0.03])
    m, phiinv, losses = lddmm_register(
        jnp.asarray(src),
        jnp.asarray(tgt),
        metric,
        num_iters=args.iters,
        learning_rate=5e-2,
        reg_weight=1e-3,
        integration_steps=5,
    )
    print(f"loss: {float(losses[0]):.6f} -> {float(losses[-1]):.6f}")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib import pyplot as plt

        Idef = lm.interp(jnp.asarray(src), phiinv)
        fig, axes = plt.subplots(1, 4, figsize=(14, 4))
        axes[0].imshow(src[0, 0]); axes[0].set_title("source")
        axes[1].imshow(tgt[0, 0]); axes[1].set_title("target")
        axes[2].imshow(np.asarray(Idef)[0, 0]); axes[2].set_title("warped source")
        plt.sca(axes[3])
        lm.vis.gridplot(np.asarray(phiinv), Nx=24, Ny=24)
        axes[3].set_title("deformation")
        for ax in axes[:3]:
            ax.axis("off")
        fig.savefig("pairwise_registration.png", dpi=80)
        print("wrote pairwise_registration.png")


if __name__ == "__main__":
    main()
