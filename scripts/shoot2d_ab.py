"""Same-run A/B of the 2D whole-shoot backward variants (VERDICT r4 #3).

Variants:
  stash  — the shipped round-4 backward: the VJP-forward writes three
           (N, T, 2, H, W) trajectory tensors (phiinv_t, v_t, mw_t) to HBM
           and the backward reads them (shoot2d._shoot_bwd_dispatch).
  replay — the variant it replaced, upgraded: the backward kernel re-runs
           the T forward steps, stashing the trajectory in VMEM scratch
           (incl. mw, which the round-4 original recomputed in the reverse
           sweep), then reverse-sweeps.  No HBM trajectory traffic; ~2x the
           forward stencil work inside the backward.

Also times the full 2D atlas step (loop + scan) with each variant so the
winner is judged on the production number, not the kernel in isolation.

Usage: python scripts/shoot2d_ab.py [res] [batch] [T]
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

import lagomorph_tpu as lm
from lagomorph_tpu.lddmm import make_lddmm_atlas_step
import lagomorph_tpu.ops.pallas.shoot2d as s2

K = 8


def measure(name, fn, make_input, rest=(), samples=3):
    try:
        runs = {}
        for reps in (1, K):
            def body(x, rest, reps=reps):
                def step(c, _):
                    out = fn(c, *rest)
                    leaf = jax.tree_util.tree_leaves(out)[0]
                    return c * (1.0 + 1e-30 * jnp.sum(leaf)), None
                c, _ = jax.lax.scan(step, x, None, length=reps)
                return jnp.sum(c)
            runs[reps] = jax.jit(body)
            _ = float(runs[reps](make_input(), rest))
        vals = []
        for _s in range(samples):
            ts = {}
            for reps in (1, K):
                x = make_input()
                jax.block_until_ready(x)
                t0 = time.perf_counter()
                _ = float(runs[reps](x, rest))
                ts[reps] = time.perf_counter() - t0
            vals.append((ts[K] - ts[1]) / (K - 1) * 1000)
        vals.sort()
        per = vals[len(vals) // 2]
        print(f"{name:52s} {per:9.3f} ms", flush=True)
        return per
    except Exception as e:
        print(f"{name:52s} FAILED {str(e)[:160]}", flush=True)


# ---------------------------------------------------------------------------
# replay backward: forward re-run into VMEM scratch, then reverse sweep
# ---------------------------------------------------------------------------


def _replay_bwd_kernel(T, s, H, W, m0_ref, p0_ref, g_ref, mn_ref, *rest):
    mat_refs = rest[:8]
    dm0_ref, dp0_ref = rest[8], rest[9]
    traj_p, traj_v, traj_m = rest[10], rest[11], rest[12]
    mats = tuple(r[...] for r in mat_refs)
    Mn = mn_ref[...]
    m0 = m0_ref[0]

    phiinv = p0_ref[0]
    for t in range(T):
        traj_p[t] = phiinv
        m, mw = s2._adstar_body(H, W, phiinv, m0)
        traj_m[t] = mw
        v = s2._fluid_body(m, Mn, mats)
        traj_v[t] = v
        phiinv = s2._compose_body(H, W, s, phiinv, v)

    g = g_ref[0]
    dm0 = jnp.zeros((2, H, W), dtype=g.dtype)
    for t in reversed(range(T)):
        p_t = traj_p[t]
        dp_prev, dv = s2._compose_bwd_body(H, W, s, p_t, traj_v[t], g)
        dm = s2._fluid_body(dv, Mn, mats)
        dpa, dm0_t = s2._adstar_bwd_body(H, W, p_t, m0, dm, traj_m[t])
        g = dp_prev + dpa
        dm0 = dm0 + dm0_t
    dm0_ref[0] = dm0
    dp0_ref[0] = g


def _replay_bwd_dispatch(m0b, phiinv0, g, params, s, T):
    N, _, H, W = g.shape
    Mn, mats = s2._spectral_inputs(H, W, params, g.dtype)
    dm0, dp0 = pl.pallas_call(
        partial(_replay_bwd_kernel, T, s, H, W),
        out_shape=[
            jax.ShapeDtypeStruct(g.shape, g.dtype),
            jax.ShapeDtypeStruct(g.shape, g.dtype),
        ],
        grid=(N,),
        in_specs=[s2._field_spec(H, W)] * 3
        + [s2._full_spec((H, W))]
        + [s2._full_spec(m.shape) for m in mats],
        out_specs=[s2._field_spec(H, W)] * 2,
        scratch_shapes=[pltpu.VMEM((T, 2, H, W), jnp.float32)] * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(m0b, phiinv0, g, Mn, *mats)
    return dm0, dp0


def install_replay_vjp():
    """Swap shoot2d's custom VJP to the replay variant (trajectory-free
    forward + replaying backward)."""

    def fwd(phiinv0, m0b, params, s, T):
        out, flags = s2._shoot_fwd_dispatch(
            phiinv0, m0b, params, s, T, stash=False
        )
        return (out, flags), (m0b, phiinv0)

    def bwd(params, s, T, res, cts):
        g, _ = cts
        m0b, phiinv0 = res
        dm0, dp0 = _replay_bwd_dispatch(m0b, phiinv0, g, params, s, T)
        return dp0, dm0

    s2._shoot2d_cvjp.defvjp(fwd, bwd)


def install_stash_vjp():
    s2._shoot2d_cvjp.defvjp(s2._shoot2d_fwd, s2._shoot2d_bwd)


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    T = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    rng = np.random.default_rng(0)
    sp = (res, res)
    params = (0.1, 0.0, 0.01)
    metric = lm.FluidMetric(list(params))
    dt = 1.0 / T

    I = jnp.asarray(rng.standard_normal((1, 1) + sp), dtype=jnp.float32)
    img = jnp.asarray(rng.standard_normal((B, 1) + sp), dtype=jnp.float32)

    def mk_m():
        return jnp.asarray(
            rng.standard_normal((B, 2) + sp) * 2e-6, dtype=jnp.float32
        )

    m0 = mk_m()
    p0 = jnp.zeros((B, 2) + sp, jnp.float32)

    # correctness: replay == stash gradients (same math, same stashed values)
    def lossf(m):
        h, _ = s2.shoot2d(p0, m, params, -dt, T)
        return jnp.sum(h * h)

    install_stash_vjp()
    g_stash = jax.jit(jax.grad(lossf))(m0)
    install_replay_vjp()
    g_replay = jax.jit(jax.grad(lossf))(m0)
    err = float(jnp.abs(g_stash - g_replay).max())
    scale = float(jnp.abs(g_stash).max()) or 1.0
    print(f"replay-vs-stash grad maxerr: {err:.3e} (rel {err / scale:.3e})",
          flush=True)

    step = make_lddmm_atlas_step(
        metric, reg_weight=0.1, learning_rate_pose=1e-6,
        lddmm_steps=1, integration_steps=T,
    )

    results = {}
    # interleave variants so relay drift hits both equally
    for rnd in range(2):
        for name, install in (("stash", install_stash_vjp),
                              ("replay", install_replay_vjp)):
            install()
            t = measure(
                f"[{name}] shoot2d fwd+bwd (round {rnd})",
                lambda m: jax.grad(
                    lambda mm: jnp.sum(
                        s2.shoot2d(p0, mm, params, -dt, T)[0] ** 2
                    )
                )(m), mk_m)
            results.setdefault(name + ":kernel", []).append(t)
            t = measure(
                f"[{name}] full 2D atlas step (round {rnd})",
                lambda m: step(I, m, img)[0], mk_m)
            results.setdefault(name + ":step", []).append(t)
    install_stash_vjp()
    print("--- medians ---", flush=True)
    for k, v in sorted(results.items()):
        v = [x for x in v if x is not None]
        if v:
            print(f"{k:24s} {sorted(v)[len(v) // 2]:9.3f} ms", flush=True)


if __name__ == "__main__":
    main()
