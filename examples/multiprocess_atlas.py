"""Multi-process (multi-host) data-parallel LDDMM atlas building.

The TPU-native analogue of the reference's ``mpirun -np N python -m
lagomorph lddmm atlas ...`` workflow: one process per host, each owning an
interleaved shard of the subjects; gradients and losses combine across
processes through GSPMD collectives inside the jitted step.

Launch one process per host (the builder handles the rest):

    # host 0
    python examples/multiprocess_atlas.py --coordinator host0:1234 \
        --num_processes 2 --process_id 0 data.h5 out_rank{rank}.h5
    # host 1
    python examples/multiprocess_atlas.py --coordinator host0:1234 \
        --num_processes 2 --process_id 1 data.h5 out_rank{rank}.h5

or equivalently through the CLI, which wires the same flags:

    python -m lagomorph_tpu lddmm atlas data.h5 out_rank{rank}.h5 \
        --coordinator_address host0:1234 --num_processes 2 --process_id 0 ...

Single-process demo (no flags): trains on synthetic data over the local
devices only.  For a runnable 2-process CPU recipe see
tests/helpers/mp_atlas_train.py (used by tests/test_multiprocess.py, which
proves subject-for-subject equality with single-process training).
"""
import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input", nargs="?", default=None)
    ap.add_argument("output", nargs="?", default="atlas_rank{rank}.h5")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num_processes", type=int, default=None)
    ap.add_argument("--process_id", type=int, default=None)
    ap.add_argument("--num_epochs", type=int, default=20)
    ap.add_argument("--batch_size", type=int, default=8)
    args = ap.parse_args()

    import jax

    if args.coordinator:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    import lagomorph_tpu as lm
    from lagomorph_tpu.parallel import get_mesh

    if args.input:
        dataset = lm.data.H5Dataset(args.input)
    else:
        rng = np.random.default_rng(0)
        res = 32
        grid = np.stack(
            np.meshgrid(*[np.arange(res, dtype=np.float64)] * 2, indexing="ij")
        )
        c = (res - 1) / 2
        imgs = [
            np.exp(
                -((grid[0] - c - o[0]) ** 2 + (grid[1] - c - o[1]) ** 2)
                / (2 * (res / 6) ** 2)
            )
            for o in rng.uniform(-2, 2, (16, 2))
        ]
        dataset = list(np.stack(imgs)[:, None].astype(np.float32))

    builder = lm.LDDMMAtlasBuilder(
        dataset,
        num_epochs=args.num_epochs,
        batch_size=args.batch_size,  # per process
        metric=lm.FluidMetric([0.1, 0.0, 0.01]),
        learning_rate_pose=1e-3,
        learning_rate_image=1e2,
        mesh=get_mesh() if jax.device_count() > 1 else None,
        progress_bar=jax.process_index() == 0,
    )
    builder.run()

    out = args.output.format(rank=jax.process_index())
    if jax.process_count() == 1 or "{rank}" in args.output or jax.process_index() == 0:
        builder.save(out)
        print(f"rank {jax.process_index()}: saved {out}; "
              f"final epoch loss {builder.epoch_losses[-1]:.6f}")


if __name__ == "__main__":
    main()
