"""Probe: does the whole-Y fused Ad* backward fit scoped VMEM at 64^3 now
that mw is a forward residual (round 4)?  The round-3 kernel wanted 26M vs
the 16M limit (in-kernel mw enumeration + window weights); with mw external
the live set shrinks — if it compiles, time it against the composed
backward and validate vs the XLA reference.

Usage: python scripts/wholey64_probe.py [X [Y Z [B]]]   (default 64^3 b4)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import lagomorph_tpu.ops.pallas.epdiff_unit as eu
from lagomorph_tpu.ops.sampling import sample_displacement_unit
from lagomorph_tpu.ops.diff import jacobian_times_vectorfield as jtv


def adstar_ref(p, m):
    return jtv(p, sample_displacement_unit(m, p), displacement=True)


def main():
    X = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    Y = int(sys.argv[2]) if len(sys.argv) > 2 else X
    Z = int(sys.argv[3]) if len(sys.argv) > 3 else X
    B = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    envelope = int(os.environ.get("LM_WY_ENVELOPE", "200000"))

    rng = np.random.default_rng(0)
    shp = (B, 3, X, Y, Z)
    p = jnp.asarray(rng.uniform(-0.9, 0.9, shp), dtype=jnp.float32)
    m = jnp.asarray(rng.standard_normal(shp), dtype=jnp.float32)
    g = jnp.asarray(rng.standard_normal(shp), dtype=jnp.float32)

    # composed baseline timing (current 64^3 path) via the public custom vjp
    def loss_grad(p_):
        return jax.grad(
            lambda q: jnp.sum(jnp.sin(eu.ad_star_unit_pallas(q, m)))
        )(p_)

    def timed(fn, x, reps=6):
        o = fn(x)
        jax.block_until_ready(o)
        xs = [x * (1.0 + 1e-6 * i) for i in range(reps)]
        for xi in xs:
            jax.block_until_ready(xi)
        t0 = time.perf_counter()
        outs = [fn(xi) for xi in xs]
        jax.block_until_ready(outs)
        return (time.perf_counter() - t0) / reps * 1000

    jcomposed = jax.jit(loss_grad)
    t_composed = timed(jcomposed, p)
    print(f"composed fwd+bwd @ {X}x{Y}x{Z} b{B}: {t_composed:.2f} ms", flush=True)

    # the dispatch gate covers 64^3 since round 4 (100k window lanes)
    def fused_bwd(p_):
        _, mw = eu._adstar_fwd_dispatch(p_, m, want_mw=True)
        res = eu._adstar_bwd_fused_dispatch(p_, m, g, mw)
        assert res is not None
        return res

    try:
        jf = jax.jit(fused_bwd)
        out = jf(p)
        jax.block_until_ready(out)
    except Exception as e:
        print(f"whole-Y fused bwd does NOT fit: {str(e)[:400]}", flush=True)
        return

    # validate (residuals as jit ARGS — a closed-over vjp bakes the fields
    # into the program and blows the relay's 100MB program limit)
    gr = jax.jit(
        lambda p_, m_, g_: jax.vjp(adstar_ref, p_, m_)[1](g_)
    )(p, m, g)
    dp, dm = out
    for name, a, b in (("d_p", dp, gr[0]), ("d_m0", dm, gr[1])):
        err = float(jnp.abs(a - b).max())
        sc = max(float(jnp.abs(b).max()), 1.0)
        print(f"whole-Y fused bwd {name} maxerr: {err:.3e} (scale {sc:.1f})",
              flush=True)

    t_fused = timed(jf, p)
    print(f"whole-Y fused bwd-only (incl fwd for mw): {t_fused:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
