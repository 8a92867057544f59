"""DeepLDDMMAtlas: a CNN predicts per-subject initial momenta; gradients
flow from the image-match loss through differentiable geodesic shooting
into both the network parameters and the atlas image.

This realizes the capability of the reference's DeepLDDMMAtlas example
(examples/DeepLDDMMAtlas.ipynb, an LFS stub in the snapshot; SURVEY.md §7
step 8), TPU-first: flax CNN + optax optimizer + one jitted update step,
data-parallel over a mesh batch axis like the classic atlas builder.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

try:
    import flax.linen as nn
    import optax

    _HAVE_FLAX = True
except ImportError:  # pragma: no cover
    _HAVE_FLAX = False
    nn = None

from ..deform import interp
from ..lddmm import expmap
from ..metric import FluidMetric
from ..utils import tqdm

__all__ = ["MomentumNet", "DeepLDDMMAtlas"]


if _HAVE_FLAX:

    class MomentumNet(nn.Module):
        """Small conv encoder-decoder predicting a momentum field from an
        image.  Dimension-generic (2D/3D) via nn.Conv with Python-tuple
        kernels; channels-last internally (TPU-friendly), NC*spatial at the
        API boundary."""

        dim: int = 2
        features: int = 16
        scale: float = 1e-3

        @nn.compact
        def __call__(self, img):
            # img: (N, C, *spatial) -> channels-last
            perm = (0,) + tuple(range(2, 2 + self.dim)) + (1,)
            x = jnp.transpose(img, perm)
            k = (3,) * self.dim
            x = nn.Conv(self.features, k)(x)
            x = nn.gelu(x)
            x = nn.Conv(self.features, k)(x)
            x = nn.gelu(x)
            x = nn.Conv(self.features, k)(x)
            x = nn.gelu(x)
            x = nn.Conv(self.dim, k)(x)
            # back to channels-first; small init scale keeps early
            # deformations in the stable regime
            inv = (0, 1 + self.dim) + tuple(range(1, 1 + self.dim))
            return self.scale * jnp.transpose(x, inv)

else:  # pragma: no cover

    class MomentumNet:  # type: ignore
        def __init__(self, *a, **k):
            raise ImportError("flax is required for MomentumNet")


class DeepLDDMMAtlas:
    """Train a momentum-prediction network and atlas image jointly.

    loss = MSE(I ∘ phi^{-1}(f_theta(img)), img)/|Ω| + reg_weight*<v, m>/|Ω|
    """

    def __init__(
        self,
        dataset,
        metric=None,
        net=None,
        batch_size=8,
        integration_steps=5,
        reg_weight=1e-1,
        learning_rate_net=1e-4,
        learning_rate_image=1e3,
        mesh=None,
        seed=0,
        dtype=np.float32,
        progress_bar=True,
    ):
        if not _HAVE_FLAX:  # pragma: no cover
            raise ImportError("flax and optax are required for DeepLDDMMAtlas")
        from ..data import batch_average, batch_iterator

        self.metric = metric or FluidMetric([0.1, 0.0, 0.01])
        self.batches = list(batch_iterator(dataset, batch_size, dtype=dtype))
        self.n_examples = sum(b.shape[0] for b in self.batches)
        self.integration_steps = integration_steps
        self.reg_weight = reg_weight
        self.progress_bar = progress_bar
        self.mesh = mesh

        I0 = batch_average(self.batches, progress_bar=False).squeeze()
        self.dim = I0.ndim
        self.I = jnp.asarray(I0[None, None], dtype=dtype)
        self.net = net or MomentumNet(dim=self.dim)

        example = jnp.asarray(self.batches[0], dtype=dtype)
        self.params = self.net.init(jax.random.PRNGKey(seed), example)
        self.tx = optax.adam(learning_rate_net)
        self.opt_state = self.tx.init(self.params)
        self.lr_I = learning_rate_image
        self.epoch_losses = []

        metric_ = self.metric
        steps_ = integration_steps
        rw = reg_weight
        net_ = self.net

        def loss_fn(params, I, img, mask):
            # mask: (B,) 0/1 weights so batches padded up to a mesh-divisible
            # size contribute nothing (all-ones mask == the unpadded loss)
            m = net_.apply(params, img)
            v = metric_.sharp(m)  # shared with the peeled first step
            h = expmap(metric_, m, num_steps=steps_, v0=v)
            Idef = interp(I, h)
            sq = jnp.sum((Idef - img) ** 2, axis=tuple(range(1, img.ndim)))
            vm = jnp.sum(v * m, axis=tuple(range(1, m.ndim)))
            numel = jnp.sum(mask) * float(np.prod(img.shape[1:]))
            return jnp.sum(sq * mask) / numel + rw * jnp.sum(vm * mask) / numel

        def train_step(params, opt_state, I, img, mask):
            loss, (gp, gI) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                params, I, img, mask
            )
            updates, opt_state = self.tx.update(gp, opt_state, params)
            params = optax.apply_updates(params, updates)
            I = I - self.lr_I * gI / jnp.sum(mask)
            return params, opt_state, I, loss

        if mesh is not None:
            from ..parallel import data_sharding, replicated_sharding

            bs_ = data_sharding(mesh)
            rs_ = replicated_sharding(mesh)
            self._pad_multiple = int(mesh.devices.size)
            self._train_step = jax.jit(
                train_step,
                in_shardings=(rs_, rs_, rs_, bs_, bs_),
                out_shardings=(rs_, rs_, rs_, rs_),
            )
        else:
            self._pad_multiple = 1
            self._train_step = jax.jit(train_step)

    def fit(self, num_epochs=10):
        epbar = range(num_epochs)
        if self.progress_bar:
            epbar = tqdm(epbar, desc="epoch")
        for _ in epbar:
            total = 0.0
            for b in self.batches:
                from ..parallel import pad_batch_to_multiple

                n_real = b.shape[0]
                b_pad, _ = pad_batch_to_multiple(np.asarray(b), self._pad_multiple)
                mask = np.zeros(b_pad.shape[0], dtype=b_pad.dtype)
                mask[:n_real] = 1.0
                self.params, self.opt_state, self.I, loss = self._train_step(
                    self.params, self.opt_state, self.I,
                    jnp.asarray(b_pad), jnp.asarray(mask),
                )
                total += float(loss) * (n_real / self.n_examples)
            self.epoch_losses.append(total)
            if self.progress_bar:
                epbar.set_postfix(loss=total)
        return self

    def predict_momenta(self, img):
        return self.net.apply(self.params, jnp.asarray(img))

    def deform_atlas(self, img):
        m = self.predict_momenta(img)
        h = expmap(self.metric, m, num_steps=self.integration_steps)
        return interp(self.I, h)
