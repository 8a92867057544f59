"""Affine registration and atlas building.

API mirror of the reference's lagomorph/affine.py, TPU-first: the per-batch
registration update is a single jitted function (affine interp -> MSE+ridge
-> grads for A, T, I -> SGD on A and T), data-parallel over a mesh batch
axis with GSPMD-inserted collectives.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .ops.affine import affine_interp, regrid  # noqa: F401  (regrid re-export)
from .utils import tqdm, Tool

__all__ = [
    "affine_interp",
    "regrid",
    "det_2x2",
    "invert_2x2",
    "minor",
    "invert_3x3",
    "affine_inverse",
    "rotation_exp_map",
    "rigid_inverse",
    "affine_atlas",
    "StandardizedDataset",
]


# --- batched small-matrix helpers (reference affine.py:49-117) -------------

def det_2x2(A):
    return A[:, 0, 0] * A[:, 1, 1] - A[:, 0, 1] * A[:, 1, 0]


def invert_2x2(A):
    """Invert a batch of 2x2 matrices by the closed-form adjugate
    (reference affine.py:53-60)."""
    det = det_2x2(A)
    Ainv = jnp.stack(
        [A[:, 1, 1], -A[:, 0, 1], -A[:, 1, 0], A[:, 0, 0]], axis=1
    ).reshape(-1, 2, 2) / det.reshape(-1, 1, 1)
    return Ainv


def minor(A, i, j):
    assert A.shape[1] == A.shape[2]
    n = A.shape[1]
    rows = [r for r in range(n) if r != i]
    cols = [c for c in range(n) if c != j]
    return A[:, rows][:, :, cols]


def invert_3x3(A):
    """Invert a batch of 3x3 matrices via minors/cofactors (reference
    affine.py:71-100)."""
    cof = jnp.stack(
        [
            det_2x2(minor(A, 0, 0)),
            -det_2x2(minor(A, 0, 1)),
            det_2x2(minor(A, 0, 2)),
            -det_2x2(minor(A, 1, 0)),
            det_2x2(minor(A, 1, 1)),
            -det_2x2(minor(A, 1, 2)),
            det_2x2(minor(A, 2, 0)),
            -det_2x2(minor(A, 2, 1)),
            det_2x2(minor(A, 2, 2)),
        ],
        axis=1,
    ).reshape(-1, 3, 3).transpose(0, 2, 1)
    det = (
        cof[:, 0, 0] * A[:, 0, 0]
        + cof[:, 1, 0] * A[:, 0, 1]
        + cof[:, 2, 0] * A[:, 0, 2]
    )
    return cof / det.reshape(-1, 1, 1)


def affine_inverse(A, T):
    """Invert an affine transformation: ``(A, T)^{-1} = (A^{-1}, -A^{-1} T)``
    (reference affine.py:103-117)."""
    assert A.shape[1] == A.shape[2]
    assert A.shape[1] == T.shape[1]
    dim = A.shape[1]
    assert dim in (2, 3)
    Ainv = invert_2x2(A) if dim == 2 else invert_3x3(A)
    Tinv = -jnp.einsum("nab,nb->na", Ainv, T)
    return (Ainv, Tinv)


def rotation_exp_map(v):
    """Exponential map from rotation tangent vectors to rotation matrices.

    2D: ``v`` is a vector of angles.  3D: ``v`` is (n, 3) axis-angle,
    converted by Rodrigues' formula.  (The reference implements only 2D and
    raises NotImplementedError for 3D — affine.py:120-138; 3D is provided
    here since it is pure jnp.)"""
    v = jnp.asarray(v)
    if v.ndim == 1:
        c = jnp.cos(v).reshape(-1, 1)
        s = jnp.sin(v).reshape(-1, 1)
        return jnp.stack([c, -s, s, c], axis=1).reshape(-1, 2, 2)
    elif v.ndim == 2 and v.shape[1] == 3:
        # Series-safe Rodrigues on the UNNORMALIZED axis-angle vector:
        #   R = I + A [v]_x + B [v]_x^2,  A = sin θ / θ,  B = (1 - cos θ)/θ².
        # A and B are analytic in θ² (removable singularity at 0), so a
        # Taylor branch below the threshold keeps both the value AND the
        # gradient exact at v = 0 — normalizing v (k = v/θ) gives NaN grads
        # there, and a constant-identity where-branch gives ZERO grads,
        # either of which kills a rigid optimization started at v = 0.
        theta2 = jnp.sum(v * v, axis=1)[:, None, None]
        small = theta2 < 1e-8
        t2s = jnp.where(small, 1.0, theta2)
        theta = jnp.sqrt(t2s)
        A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
        B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / t2s)
        vx, vy, vz = v[:, 0], v[:, 1], v[:, 2]
        zeros = jnp.zeros_like(vx)
        K = jnp.stack(
            [zeros, -vz, vy, vz, zeros, -vx, -vy, vx, zeros], axis=1
        ).reshape(-1, 3, 3)
        eye = jnp.eye(3, dtype=v.dtype)[None]
        return eye + A * K + B * jnp.einsum("nab,nbc->nac", K, K)
    else:
        raise Exception(f"Cannot infer dimension from v shape {v.shape}")


def rigid_inverse(v, T):
    """Invert a rigid transformation: ``(R(v), T)^{-1} = (R(-v), -R(-v) T)``
    (reference affine.py:141-148)."""
    negv = -jnp.asarray(v)
    Rinv = rotation_exp_map(negv)
    Tinv = -jnp.einsum("nab,nb->na", Rinv, T)
    return (negv, Tinv)


# --- atlas building --------------------------------------------------------

def make_affine_atlas_step(
    spatial_dim,
    affine_steps=1,
    reg_weightA=0.0,
    reg_weightT=0.0,
    learning_rate_A=1e-3,
    learning_rate_T=1e-2,
):
    """Build the jitted per-minibatch affine atlas update.

    Returns ``step(I, A, T, img) -> (A, T, I_grad, loss)``; semantics match
    the reference's inner loop (affine.py:354-388): ``affine_steps`` SGD
    steps on (A, T) per minibatch, with the atlas-image gradient taken at
    the last step."""
    eye = np.eye(spatial_dim, dtype=np.float64)

    def loss_fn(A, T, I, img, mask):
        Idef = affine_interp(I, A + jnp.asarray(eye, dtype=A.dtype), T)
        numel = 1.0
        for s in I.shape[2:]:
            numel *= s
        axes = tuple(range(1, img.ndim))
        sq = jnp.sum((Idef - img) ** 2, axis=axes) / numel  # per subject
        regA = 0.5 * reg_weightA * jnp.sum(A * A, axis=(1, 2)) if reg_weightA > 0 else 0.0
        regT = 0.5 * reg_weightT * jnp.sum(T * T, axis=1) if reg_weightT > 0 else 0.0
        per = sq + regA + regT
        if mask is None:
            return jnp.sum(per) / img.shape[0]
        return jnp.sum(per * mask) / jnp.sum(mask)

    def step(I, A, T, img, mask=None):
        loss = None
        gI = None
        for it in range(affine_steps):
            last = it == affine_steps - 1
            if last:
                loss, (gA, gT, gI) = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
                    A, T, I, img, mask
                )
            else:
                loss, (gA, gT) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                    A, T, I, img, mask
                )
            A = A - learning_rate_A * gA
            T = T - learning_rate_T * gT
        return A, T, gI, loss

    return step


def affine_atlas(
    dataset,
    As,
    Ts,
    I=None,
    num_epochs=1000,
    batch_size=50,
    image_update_freq=0,
    affine_steps=1,
    reg_weightA=0e1,
    reg_weightT=0e1,
    learning_rate_A=1e-3,
    learning_rate_T=1e-2,
    learning_rate_I=1e5,
    mesh=None,
    progress_bar=True,
    keep_data_on_device=False,
    loader_workers=None,
    gpu=None,
    world_size=None,
    rank=None,
):
    """Affine atlas building (reference affine.py:288-415).

    ``dataset`` yields items or (index, item) pairs; ``As``/``Ts`` are
    numpy arrays of per-image transforms updated in place (returned).

    Returns ``(I, As, Ts, epoch_losses, iter_losses)``.
    """
    from .data import IndexedDataset, batch_average, batch_iterator

    As = np.asarray(As)
    Ts = np.asarray(Ts)
    probe = dataset[0]
    indexed = isinstance(probe, tuple) and len(probe) == 2 and np.isscalar(probe[0])
    if not indexed:
        dataset = IndexedDataset(dataset)

    batches = list(batch_iterator(dataset, batch_size, dtype=As.dtype))
    n_total = sum(b[1].shape[0] for b in batches)

    if I is None:
        I = batch_average(batches, progress_bar=progress_bar)
    I = np.asarray(I, dtype=As.dtype).squeeze()
    dim = I.ndim
    I = jnp.asarray(I[None, None])

    step = make_affine_atlas_step(
        dim,
        affine_steps=affine_steps,
        reg_weightA=reg_weightA,
        reg_weightT=reg_weightT,
        learning_rate_A=learning_rate_A,
        learning_rate_T=learning_rate_T,
    )
    if mesh is not None:
        from .parallel import data_sharding, replicated_sharding

        bs_ = data_sharding(mesh)
        rs_ = replicated_sharding(mesh)
        step = jax.jit(
            step,
            in_shardings=(rs_, bs_, bs_, bs_, bs_),
            out_shardings=(bs_, bs_, rs_, rs_),
            donate_argnums=(1, 2),
        )
        pad_multiple = int(mesh.devices.size)
    else:
        step = jax.jit(step, donate_argnums=(1, 2))
        pad_multiple = 1

    def image_update(I, g, n):
        return I - learning_rate_I * (g / n)

    image_update = jax.jit(image_update)

    from .parallel import pad_batch_to_multiple

    # pre-stage padded batches (and masks); optionally resident on device
    staged = []
    for ix, img in batches:
        n_real = img.shape[0]
        img_np, _ = pad_batch_to_multiple(np.asarray(img), pad_multiple)
        mask = np.zeros(img_np.shape[0], dtype=img_np.dtype)
        mask[:n_real] = 1.0
        if keep_data_on_device:
            img_np = jnp.asarray(img_np)
            mask = jnp.asarray(mask)
        staged.append((ix, img_np, mask, n_real))

    # per-batch transform params, on device when requested
    dev_AT = {}

    epoch_losses = []
    iter_losses = []
    epbar = range(num_epochs)
    if progress_bar:
        epbar = tqdm(epbar, desc="epoch")
    Igrad = jnp.zeros_like(I)
    image_iters = 0
    for epoch in epbar:
        epoch_loss = 0.0
        itbar = staged
        if progress_bar:
            itbar = tqdm(staged, desc="iter", leave=False)
        for bi, (ix, img_np, mask, n_real) in enumerate(itbar):
            if keep_data_on_device and bi in dev_AT:
                A_in, T_in = dev_AT[bi]
            else:
                A_np, _ = pad_batch_to_multiple(As[ix], pad_multiple)
                T_np, _ = pad_batch_to_multiple(Ts[ix], pad_multiple)
                A_in, T_in = jnp.asarray(A_np), jnp.asarray(T_np)
            A, T, gI, loss = step(
                I, A_in, T_in, jnp.asarray(img_np), jnp.asarray(mask)
            )
            if keep_data_on_device:
                dev_AT[bi] = (A, T)
            else:
                As[ix] = np.asarray(A)[:n_real]
                Ts[ix] = np.asarray(T)[:n_real]
            Igrad = Igrad + gI
            image_iters += 1
            li = float(loss) * (n_real / n_total)
            iter_losses.append(li)
            epoch_loss += li
            if image_update_freq > 0 and image_iters >= image_update_freq:
                I = image_update(I, Igrad, float(image_iters))
                Igrad = jnp.zeros_like(I)
                image_iters = 0
        if image_iters > 0:
            I = image_update(I, Igrad, float(image_iters))
            Igrad = jnp.zeros_like(I)
            image_iters = 0
        epoch_losses.append(epoch_loss)
        if progress_bar:
            epbar.set_postfix(epoch_loss=epoch_loss)
    if keep_data_on_device:
        # write device-resident transforms back to the host arrays
        for bi, (ix, _img, _mask, n_real) in enumerate(staged):
            if bi in dev_AT:
                A, T = dev_AT[bi]
                As[ix] = np.asarray(A)[:n_real]
                Ts[ix] = np.asarray(T)[:n_real]
    return I, As, Ts, epoch_losses, iter_losses


class StandardizedDataset:
    """Lazily apply inverse affine transforms to dataset items (reference
    affine.py:418-438)."""

    def __init__(self, dataset, As, Ts):
        self.dataset = dataset
        self.As = np.asarray(As)
        self.Ts = np.asarray(Ts)
        dim = self.Ts.shape[1]
        self.eye = np.eye(dim, dtype=self.As.dtype)

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, idx):
        J = np.asarray(self.dataset[idx])
        if J.dtype not in (np.float32, np.float64):
            J = J.astype(np.float32)
        A = jnp.asarray(self.As[[idx]])
        T = jnp.asarray(self.Ts[[idx]])
        Ainv, Tinv = affine_inverse(A + jnp.asarray(self.eye), T)
        out = affine_interp(jnp.asarray(J[None]), Ainv, Tinv)
        return np.asarray(out[0])


class _Tool(Tool):
    """Affine registration methods"""

    module_name = "lagomorph_tpu affine"
    subcommands = ["atlas", "standardize"]

    def atlas(self):
        """
        Build affine atlas from HDF5 image dataset.

        Writes an HDF5 file with datasets: atlas, A, T, epoch_losses,
        iter_losses; provenance attrs are stamped on 'atlas'.
        """
        import sys

        parser = self.new_parser("atlas")
        dg = parser.add_argument_group("data parameters")
        dg.add_argument("input", type=str, help="Path to input image HDF5 file")
        dg.add_argument(
            "--force_dim",
            default=None,
            type=int,
            help="Force dimension of images instead of determining based on dataset shape",
        )
        dg.add_argument(
            "--h5key", "-k", default="images", help="Name of dataset in input HDF5 file"
        )
        dg.add_argument(
            "--data_inmemory",
            action="store_true",
            help="Load entire dataset into memory first",
        )
        dg.add_argument("output", type=str, help="Path to output HDF5 file")
        ag = parser.add_argument_group("algorithm parameters")
        ag.add_argument("--num_epochs", default=1000, type=int, help="Number of epochs")
        ag.add_argument("--batch_size", default=50, type=int, help="Batch size")
        ag.add_argument(
            "--image_update_freq",
            default=0,
            type=int,
            help="Update base image every N iterations. 0 for once per epoch",
        )
        ag.add_argument(
            "--affine_steps",
            default=1,
            type=int,
            help="Affine gradient steps to take each iteration",
        )
        ag.add_argument("--reg_weight_A", default=1e-1, type=float)
        ag.add_argument("--reg_weight_T", default=1e-1, type=float)
        ag.add_argument("--learning_rate_A", default=1e-3, type=float)
        ag.add_argument("--learning_rate_T", default=1e-2, type=float)
        ag.add_argument("--learning_rate_I", default=1e4, type=float)
        ag.add_argument(
            "--keep_data_on_device",
            action="store_true",
            help="Stage all batches and transforms in device memory once",
        )
        self._compute_args(parser)
        args = parser.parse_args(sys.argv[2:])
        self._initialize_compute(args)

        from .data import IndexedDataset, MemoryDataset, load_dataset

        dataset = load_dataset(args.input, key=args.h5key, force_dim=args.force_dim)
        if args.data_inmemory:
            dataset = MemoryDataset(dataset)
        dataset = IndexedDataset(dataset)

        n = len(dataset)
        ds0 = dataset[0][1]
        dim = ds0.ndim - 1
        del ds0
        As = np.zeros((n, dim, dim), dtype=np.float32)
        Ts = np.zeros((n, dim), dtype=np.float32)

        I, As, Ts, epoch_losses, iter_losses = affine_atlas(
            dataset,
            As=As,
            Ts=Ts,
            num_epochs=args.num_epochs,
            batch_size=args.batch_size,
            affine_steps=args.affine_steps,
            image_update_freq=args.image_update_freq,
            reg_weightA=args.reg_weight_A,
            reg_weightT=args.reg_weight_T,
            learning_rate_A=args.learning_rate_A,
            learning_rate_T=args.learning_rate_T,
            learning_rate_I=args.learning_rate_I,
            keep_data_on_device=args.keep_data_on_device,
            mesh=self.mesh,
            progress_bar=self.rank == 0,
        )

        import h5py

        with h5py.File(args.output, "w") as f:
            atds = f.create_dataset("atlas", data=np.asarray(I))
            self._stamp_dataset(atds, args)
            f.create_dataset("A", data=np.asarray(As))
            f.create_dataset("T", data=np.asarray(Ts))
            f.create_dataset("epoch_losses", data=np.asarray(epoch_losses))
            f.create_dataset("iter_losses", data=np.asarray(iter_losses))

    def standardize(self):
        """
        Standardize a dataset using transforms found during atlas building.
        """
        import sys

        parser = self.new_parser("standardize")
        parser.add_argument("inputimages", type=str, help="Path to input image HDF5 file")
        parser.add_argument(
            "atlasoutput",
            type=str,
            help="Path to HDF5 output from affine atlas building",
        )
        parser.add_argument(
            "standardizedoutput", type=str, help="Path to output HDF5 file"
        )
        parser.add_argument(
            "--h5key", "-k", default="images", help="Name of dataset in input and HDF5 files"
        )
        parser.add_argument(
            "--copy_other_keys",
            action="store_true",
            help="Copy all other keys from input file into output verbatim",
        )
        parser.add_argument(
            "--rescale",
            default=None,
            type=float,
            help="Amount by which to rescale translations. Default: automatic",
        )
        args = parser.parse_args(sys.argv[2:])

        from .data import H5Dataset, write_dataset_h5

        dataset = H5Dataset(args.inputimages, key=args.h5key)

        import h5py

        with h5py.File(args.atlasoutput, "r") as f:
            As = np.asarray(f["A"])
            Ts = np.asarray(f["T"])
            if args.rescale is None:
                # infer translation rescale from shape ratio
                # (reference affine.py:640-656)
                d = Ts.shape[1]
                shnew = dataset[0].shape[-d:]
                shatlas = f["atlas"].shape[-d:]
                if tuple(shnew) != tuple(shatlas):
                    args.rescale = shnew[0] / shatlas[0]
                    for sn, sa in zip(shnew, shatlas):
                        if sn != args.rescale * sa:
                            raise Exception(
                                "Unclear how to rescale translations. You must pass the --rescale argument directly."
                            )
                else:
                    args.rescale = 1.0
        Ts = Ts * args.rescale

        std_ds = StandardizedDataset(dataset, As, Ts)
        write_dataset_h5(std_ds, args.standardizedoutput, key=args.h5key)
        with h5py.File(args.standardizedoutput, "a") as fw:
            self._stamp_dataset(fw[args.h5key], args)
        if args.copy_other_keys:
            with h5py.File(args.inputimages, "r") as fi, h5py.File(
                args.standardizedoutput, "a"
            ) as fo:
                for k in tqdm(fi.keys(), desc="other keys"):
                    if k != args.h5key:
                        fi.copy(k, fo)
