"""Probe which gather/scatter patterns Mosaic (Pallas TPU) supports on this
backend — determines the design space for a fast warp kernel."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn):
    try:
        out = fn()
        out = np.asarray(out)
        print(f"{name:44s} OK  {out.shape}", flush=True)
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"{name:44s} FAIL {msg}", flush=True)
        return False


rng = np.random.default_rng(0)

# 1. take_along_axis along last (lane) axis inside kernel
def taa_lane():
    x = jnp.asarray(rng.standard_normal((8, 128)), dtype=jnp.float32)
    idx = jnp.asarray(rng.integers(0, 128, (8, 128)), dtype=jnp.int32)

    def kernel(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)


# 2. take_along_axis along sublane axis
def taa_sublane():
    x = jnp.asarray(rng.standard_normal((64, 128)), dtype=jnp.float32)
    idx = jnp.asarray(rng.integers(0, 64, (64, 128)), dtype=jnp.int32)

    def kernel(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)


# 3. flat 1D-style gather from a big VMEM block (take along minor of (1, N))
def flat_take():
    N = 64 * 1024
    x = jnp.asarray(rng.standard_normal((8, N // 8)), dtype=jnp.float32)
    idx = jnp.asarray(rng.integers(0, N // 8, (8, 128)), dtype=jnp.int32)

    def kernel(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)


# 4. dynamic per-element write (scatter) into VMEM scratch
def scatter_vmem():
    x = jnp.asarray(rng.standard_normal((8, 128)), dtype=jnp.float32)
    idx = jnp.asarray(rng.integers(0, 128, (8, 128)), dtype=jnp.int32)

    def kernel(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.zeros_like(o_ref)
        z = jnp.zeros((8, 128), jnp.float32)
        z = z.at[jnp.arange(8)[:, None], i_ref[:]].add(x_ref[:])
        o_ref[:] = z

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)


# 5. pltpu dynamic_gather if exposed
def dyn_gather_api():
    names = [n for n in dir(pltpu) if "gather" in n.lower()]
    print("   pltpu gather-ish symbols:", names, flush=True)
    return jnp.zeros(())


# 6. one-hot matmul gather within kernel (always supported; MXU cost check)
def onehot_gather():
    x = jnp.asarray(rng.standard_normal((128, 128)), dtype=jnp.float32)
    idx = jnp.asarray(rng.integers(0, 128, (128,)), dtype=jnp.int32)

    def kernel(x_ref, i_ref, o_ref):
        oh = (i_ref[:].reshape(-1, 1) == jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)).astype(jnp.float32)
        o_ref[:] = jnp.dot(oh, x_ref[:], preferred_element_type=jnp.float32)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)


probe("take_along_axis lane (8,128)", taa_lane)
probe("take_along_axis sublane (64,128)", taa_sublane)
probe("flat take minor (8,8192)->(8,128)", flat_take)
probe("scatter .at add in-kernel", scatter_vmem)
probe("pltpu gather symbols", dyn_gather_api)
probe("one-hot matmul gather", onehot_gather)

# correctness spot check for whichever worked
x = jnp.asarray(rng.standard_normal((8, 128)), dtype=jnp.float32)
idx = jnp.asarray(rng.integers(0, 128, (8, 128)), dtype=jnp.int32)
try:
    def kernel(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)
    ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1)
    print("taa lane correctness:", np.allclose(np.asarray(out), ref))
except Exception:
    pass
