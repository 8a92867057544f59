"""Probe (VERDICT r4 #9): can the MXU absorb the tap-shift chains that make
the fused backwards roll-bound?

Round-4 finding (CLAUDE.md): the fused stencil backwards are ROLL/DMA-bound
— removing ~300 mult-unit ops changed nothing while removing 9 of 18 rolls
bought 1.3 ms.  A lane-axis shift is also expressible as a matmul with a
constant 0/1 banded shift matrix, which runs on the (otherwise idle) MXU
and can fold the CLAMP edge-fix select into the same matrix (the edge row
keeps the clamped voxel), removing the roll AND the select from the VPU.

This microbench times, at the y-blocked backward's working shape
((3, BX+16, (BY+2)*Z) blocks, grid-repeated), per shift applied:
  roll    — pltpu.roll on the lane axis + edge-fix select (today's ztap)
  mxu     — dot_general against a resident (L, L) banded f32 matrix
            (L = (BY+2)*Z lanes; clamp folded into the matrix)
  mxu_z   — reshape the lane axis to (.., Z) and dot a (Z, Z) matrix
            (Z-sized matmul, 10x fewer MACs; exercises a lane-split
            reshape Mosaic may refuse)
Each variant sums S shifted copies (S=6: z +-1, y +-1 expressed in the
flattened lane axis as +-Z) so per-shift cost = (t - t0)/S with t0 the
no-shift baseline kernel.

Usage: python scripts/mxu_tap_probe.py [BX BY Z S]
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BX = int(sys.argv[1]) if len(sys.argv) > 1 else 16
BY = int(sys.argv[2]) if len(sys.argv) > 2 else 8
Z = int(sys.argv[3]) if len(sys.argv) > 3 else 128
S = int(sys.argv[4]) if len(sys.argv) > 4 else 6
BXW = BX + 16
L = (BY + 2) * Z
GRID = (4, 8, 16)  # (n, xb, yb)-like repetition


def shifts(S):
    base = [1, -1, Z, -Z]
    out = []
    i = 0
    while len(out) < S:
        out.append(base[i % len(base)] * (1 + i // len(base)))
        i += 1
    return out


SHIFTS = shifts(S)


def shift_matrix(L, s):
    """(L, L) one-hot: out[i] = in[i+s] clamped to [0, L)."""
    src = np.clip(np.arange(L) + s, 0, L - 1)
    M = np.zeros((L, L), dtype=np.float32)
    M[src, np.arange(L)] = 1.0
    return M


def k_base(a_ref, o_ref):
    A = a_ref[0]
    o_ref[0] = A * 1.0000001


def k_roll(a_ref, o_ref):
    A = a_ref[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, A.shape, 2)
    z = lane % Z
    acc = A * 1.0000001
    for s in SHIFTS:
        r = pltpu.roll(A, (-s) % L, 2)
        if abs(s) < Z:
            edge = z == (Z - 1 if s > 0 else 0)
        else:
            edge = (lane // Z) == ((L // Z) - 1 if s > 0 else 0)
        acc = acc + jnp.where(edge, A, r)
    o_ref[0] = acc


def k_mxu(a_ref, m_ref, o_ref):
    A = a_ref[0]  # (3, BXW, L)
    A2 = A.reshape(3 * BXW, L)
    acc = A2 * 1.0000001
    for i in range(S):
        M = m_ref[i]
        acc = acc + jax.lax.dot(
            A2, M, precision=jax.lax.Precision.HIGHEST
        )
    o_ref[0] = acc.reshape(3, BXW, L)


def k_mxu_z(a_ref, m_ref, o_ref):
    A = a_ref[0]
    A2 = A.reshape(3 * BXW * (L // Z), Z)
    acc = A2 * 1.0000001
    for i in range(S):
        M = m_ref[i]
        acc = acc + jax.lax.dot(
            A2, M, precision=jax.lax.Precision.HIGHEST
        )
    o_ref[0] = acc.reshape(3, BXW, L)


def run(name, kernel, extra=None):
    N = GRID[0] * GRID[1] * GRID[2]
    ins = [
        pl.BlockSpec((1, 3, BXW, L), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM)
    ]
    args = []
    if extra is not None:
        ins.append(
            pl.BlockSpec(extra.shape, lambda i: (0,) * extra.ndim,
                         memory_space=pltpu.VMEM)
        )
        args.append(jnp.asarray(extra))
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, 3, BXW, L), jnp.float32),
        grid=(N,),
        in_specs=ins,
        out_specs=pl.BlockSpec((1, 3, BXW, L), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
    )

    @jax.jit
    def body(x):
        return jnp.sum(f(x, *args))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, 3, BXW, L)), dtype=jnp.float32)
    try:
        _ = float(body(x))
    except Exception as e:
        print(f"{name:8s} FAILED: {str(e).splitlines()[0][:140]}")
        return None
    ts = []
    for i in range(5):
        xi = x * (1.0 + 1e-6 * i)
        jax.block_until_ready(xi)
        t0 = time.perf_counter()
        _ = float(body(xi))
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts)) * 1e3
    print(f"{name:8s} {t:8.3f} ms  ({t/N*1e3:7.2f} us/block)")
    return t


def main():
    print(f"shape (3,{BXW},{L}) Z={Z} S={S} shifts={SHIFTS} "
          f"grid={np.prod(GRID)} blocks")
    t0 = run("base", k_base)
    tr = run("roll", k_roll)
    Ms = np.stack([shift_matrix(L, s) for s in SHIFTS])
    tm = run("mxu", k_mxu, Ms)
    Mz = np.stack([shift_matrix(Z, s) for s in SHIFTS if abs(s) < Z])
    if Mz.shape[0] == S:
        tz = run("mxu_z", k_mxu_z, Mz)
    else:
        # z-sized matrices only implement |s|<Z shifts; pad the set by
        # reusing the first so the kernel still applies S matmuls (timing
        # only — the point is the per-matmul cost)
        Mz = np.stack([shift_matrix(Z, SHIFTS[i % max(1, Mz.shape[0])]
                                    if abs(SHIFTS[i % len(SHIFTS)]) < Z
                                    else 1)
                       for i in range(S)])
        tz = run("mxu_z", k_mxu_z, Mz)
    if t0 and tr:
        print(f"per-shift roll : {(tr-t0)/S:7.3f} ms")
    if t0 and tm:
        print(f"per-shift mxu  : {(tm-t0)/S:7.3f} ms")
    if t0 and tz:
        print(f"per-shift mxu_z: {(tz-t0)/S:7.3f} ms")


if __name__ == "__main__":
    main()
