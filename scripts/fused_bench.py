"""Fast iteration harness for the fused EPDiff kernels: validate the fused
Ad* / compose ops against the composed XLA/warp path, then micro-bench
fwd and fwd+bwd with scan-amortized timing.

Usage: python scripts/fused_bench.py [res] [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import lagomorph_tpu as lm
import lagomorph_tpu.ops.pallas.warp_unit as wu
import lagomorph_tpu.ops.pallas.epdiff_unit as eu
from lagomorph_tpu.ops.diff import jacobian_times_vectorfield as jtv
from lagomorph_tpu.ops.sampling import sample_displacement_unit

K = 6


def measure(name, fn, make_input):
    runs = {}
    for reps in (1, K):
        def body(x, reps=reps):
            def step(c, _):
                out = fn(c)
                leaf = jax.tree_util.tree_leaves(out)[0]
                return c * (1.0 + 1e-30 * jnp.sum(leaf)), None
            c, _ = jax.lax.scan(step, x, None, length=reps)
            return jnp.sum(c)
        runs[reps] = jax.jit(body)
        _ = float(runs[reps](make_input()))
    ts = {}
    for reps in (1, K):
        x = make_input()
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        _ = float(runs[reps](x))
        ts[reps] = time.perf_counter() - t0
    per = (ts[K] - ts[1]) / (K - 1) * 1000
    print(f"{name:44s} {per:9.2f} ms", flush=True)
    return per


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sp = (res,) * 3
    rng = np.random.default_rng(0)
    ok = True

    p = jnp.asarray(rng.uniform(-1.0, 0.999, (B, 3) + sp), dtype=jnp.float32)
    m0 = jnp.asarray(rng.standard_normal((B, 3) + sp), dtype=jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, 3) + sp), dtype=jnp.float32)
    s = 0.2

    # --- validation ---
    def adstar_ref(p_, m_):
        return jtv(p_, sample_displacement_unit(m_, p_), displacement=True)

    got = jax.jit(eu.ad_star_unit_pallas)(p, m0)
    ref = jax.jit(adstar_ref)(p, m0)
    err = float(jnp.abs(got - ref).max())
    scale = float(jnp.abs(ref).max())
    print(f"adstar fwd maxerr: {err:.3e} (scale {scale:.1f})")
    ok &= err < 1e-4 * max(scale, 1.0)

    f_vjp = jax.jit(lambda p_, m_, g_: jax.vjp(eu.ad_star_unit_pallas, p_, m_)[1](g_))
    r_vjp = jax.jit(lambda p_, m_, g_: jax.vjp(adstar_ref, p_, m_)[1](g_))
    gf, gr = f_vjp(p, m0, g), r_vjp(p, m0, g)
    for name, a, b in (("d_p", gf[0], gr[0]), ("d_m0", gf[1], gr[1])):
        err = float(jnp.abs(a - b).max())
        sc = float(jnp.abs(b).max())
        print(f"adstar bwd {name} maxerr: {err:.3e} (scale {sc:.1f})")
        ok &= err < 1e-3 * max(sc, 1.0)

    def comp_ref(p_, v_):
        return s * v_ + sample_displacement_unit(p_, s * v_)

    v = jnp.asarray(rng.uniform(-4.0, 4.0, (B, 3) + sp), dtype=jnp.float32)
    got = jax.jit(lambda p_, v_: eu.compose_disp_vel_pallas(p_, v_, s))(p, v)
    ref = jax.jit(comp_ref)(p, v)
    err = float(jnp.abs(got - ref).max())
    print(f"compose fwd maxerr: {err:.3e}")
    ok &= err < 1e-5

    cf_vjp = jax.jit(
        lambda p_, v_, g_: jax.vjp(
            lambda a, b: eu.compose_disp_vel_pallas(a, b, s), p_, v_
        )[1](g_)
    )
    cr_vjp = jax.jit(lambda p_, v_, g_: jax.vjp(comp_ref, p_, v_)[1](g_))
    gf, gr = cf_vjp(p, v, g), cr_vjp(p, v, g)
    for name, a, b in (("d_p", gf[0], gr[0]), ("d_v", gf[1], gr[1])):
        err = float(jnp.abs(a - b).max())
        print(f"compose bwd {name} maxerr: {err:.3e}")
        ok &= err < 1e-4

    print("VALIDATION", "OK" if ok else "FAILED", flush=True)
    if not ok:
        sys.exit(1)

    # --- micro-bench ---
    def mk_p():
        return jnp.asarray(rng.uniform(-0.9, 0.9, (B, 3) + sp), dtype=jnp.float32)

    def gr_of(fn):
        return lambda x: jax.grad(lambda y: jnp.sum(jnp.sin(fn(y))))(x)

    if res < 128:
        # the K-rep scan of the composed XLA path exceeds the remote
        # compiler's 2 GiB program limit at 128^3 b4 — composed numbers at
        # large res come from scripts/step_profile.py instead
        measure("adstar composed fwd", lambda x: adstar_ref(x, m0), mk_p)
        measure("adstar composed fwd+bwd",
                gr_of(lambda x: adstar_ref(x, m0)), mk_p)
        measure("compose composed fwd", lambda x: comp_ref(x, v), mk_p)
        measure("compose composed fwd+bwd", gr_of(lambda x: comp_ref(x, v)), mk_p)
    measure("adstar fused fwd", lambda x: eu.ad_star_unit_pallas(x, m0), mk_p)
    measure("adstar fused fwd+bwd",
            gr_of(lambda x: eu.ad_star_unit_pallas(x, m0)), mk_p)
    measure("compose fused fwd",
            lambda x: eu.compose_disp_vel_pallas(x, v, s), mk_p)
    measure("compose fused fwd+bwd",
            gr_of(lambda x: eu.compose_disp_vel_pallas(x, v, s)), mk_p)

    # end-to-end substep
    metric = lm.FluidMetric([0.1, 0.0, 0.01])
    mm = jnp.asarray(rng.standard_normal((B, 3) + sp) * 2e-6, dtype=jnp.float32)

    def substep(x):
        return lm.EPDiff_step(metric, mm, 0.2, x,
                              transport_mode="unit", compose_mode="unit")

    measure("EPDiff substep fused fwd", substep, mk_p)
    measure("EPDiff substep fused fwd+bwd", gr_of(substep), mk_p)


if __name__ == "__main__":
    main()
