import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
import lagomorph_tpu as lm
from lagomorph_tpu.lddmm import make_lddmm_atlas_step

res = int(sys.argv[1]) if len(sys.argv) > 1 else 64
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
sp = (res, res, res)
rng = np.random.default_rng(0)
metric = lm.FluidMetric([0.1, 0.0, 0.01])
step = make_lddmm_atlas_step(metric, reg_weight=0.1, learning_rate_pose=1e-6,
                             integration_steps=5)
jstep = jax.jit(step)

def fresh():
    I = jnp.asarray(rng.standard_normal((1, 1) + sp), dtype=jnp.float32)
    m = jnp.asarray(rng.standard_normal((B, 3) + sp) * 2e-6, dtype=jnp.float32)
    img = jnp.asarray(rng.standard_normal((B, 1) + sp), dtype=jnp.float32)
    return I, m, img

I, m, img = fresh()
out = jstep(I, m, img); jax.block_until_ready(out)
for trial in range(3):
    I, m, img = fresh()
    jax.block_until_ready((I, m, img))
    t0 = time.perf_counter()
    out = jstep(I, m, img)
    # force full completion via scalar fetch
    s = float(out[2])
    t1 = time.perf_counter()
    print(f"single atlas step: {1000*(t1-t0):.1f} ms (loss={s:.4f})", flush=True)
