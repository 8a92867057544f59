"""Helper: one process of a 2-process LDDMM atlas training run (CPU mesh).

Launched by tests/test_multiprocess.py:
    python mp_atlas_train.py <proc_id> <num_procs> <port> <data.npy> <outdir>

Trains a tiny LDDMM atlas data-parallel over jax.distributed and writes this
rank's results (atlas, per-subject momenta with their global subject ids,
iteration losses) to <outdir>/rank<r>.npz.
"""
import os
import sys

proc_id = int(sys.argv[1])
num_procs = int(sys.argv[2])
port = int(sys.argv[3])
data_path = sys.argv[4]
outdir = sys.argv[5]
keep_on_device = len(sys.argv) > 6 and sys.argv[6] == "keep"

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=num_procs,
    process_id=proc_id,
)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import lagomorph_tpu as lm  # noqa: E402
from lagomorph_tpu.lddmm import LDDMMAtlasBuilder  # noqa: E402
from lagomorph_tpu.parallel import get_mesh, process_shard_indices  # noqa: E402

imgs = np.load(data_path)
n = imgs.shape[0]

builder = LDDMMAtlasBuilder(
    list(imgs),
    num_epochs=2,
    batch_size=4,  # per-process
    lddmm_integration_steps=3,
    metric=lm.FluidMetric([0.1, 0.0, 0.01]),
    learning_rate_pose=1e-3,
    learning_rate_image=1e2,
    mesh=get_mesh(),
    keep_data_on_device=keep_on_device,
    progress_bar=False,
)
builder.run()

# also exercise the HDF5 checkpoint path (multi-process + keep_data_on_device
# must extract this process's local momenta shard, not np.asarray a global
# sharded array)
builder.save(os.path.join(outdir, f"ckpt_rank{proc_id}.h5"))

my_subjects = process_shard_indices(n, num_procs, proc_id)
ms = np.concatenate(builder._momenta_host(), axis=0)
assert ms.shape[0] == len(my_subjects)
np.savez(
    os.path.join(outdir, f"rank{proc_id}.npz"),
    atlas=np.asarray(builder.I),
    momenta=ms,
    subjects=np.asarray(my_subjects),
    iter_losses=np.asarray(builder.iter_losses),
    epoch_losses=np.asarray(builder.epoch_losses),
)
print(f"rank {proc_id} done", flush=True)
