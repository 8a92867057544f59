"""On-TPU correctness checks for the Pallas fast-path kernels (the pytest
suite runs on a CPU mesh where these kernels are bypassed; run this script
on real TPU hardware after kernel changes).

Usage: python scripts/tpu_checks.py [--quick] [res] [batch]

--quick: core fused kernels + hoisted dispatch only (one shape) — the
run-before-bench gate wired into bench.py so a kernel regression cannot
produce a green BENCH result.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import lagomorph_tpu as lm
import lagomorph_tpu.ops.pallas.warp_unit as wu
from lagomorph_tpu.ops.sampling import sample_displacement_unit


def check_fluid_ground_truth():
    """Production fluid sharp vs a float64 numpy ground truth at the
    headline bench shape class (128^3, batch 4 => 12 transforms).

    Guards against the XLA TPU rfftn/irfftn batching bug found 2026-08-17:
    the rfftn->irfftn round trip silently produces garbage (~1.7 roundtrip
    error) for >= 12 batched 128^3 transforms, which is exactly the bench
    config — the packed-C2C default avoids it, and this check fails loudly
    if the production path ever regresses into the broken envelope."""
    import numpy.fft as nf
    from lagomorph_tpu.ops.fluid import fluid_multiplier, fluid_operator

    rng = np.random.default_rng(7)
    sp = (128, 128, 128)
    params = (0.1, 0.0, 0.01)
    m = jnp.asarray(rng.standard_normal((4, 3) + sp), dtype=jnp.float32)
    got = np.asarray(jax.jit(lambda x: fluid_operator(x, params, True))(m))
    M = fluid_multiplier(sp, params, True, np.float64)
    ok = True
    # beta == 0: the multiplier is diagonal with equal entries — one
    # channel's scalar multiply is the exact ground truth per channel
    for b, c in ((0, 0), (3, 2)):
        x = np.asarray(m[b, c], dtype=np.float64)
        want = nf.irfftn(nf.rfftn(x) * M[0, 0], s=sp, axes=(0, 1, 2))
        err = np.abs(got[b, c] - want).max() / np.abs(want).max()
        print(f"fluid sharp 128^3 b4 vs f64 ground truth [{b},{c}]: "
              f"{err:.3e}", flush=True)
        ok &= err < 1e-4
    return ok


def main():
    args = [a for a in sys.argv[1:] if a != "--quick"]
    quick = "--quick" in sys.argv[1:]
    res = int(args[0]) if len(args) > 0 else 64
    B = int(args[1]) if len(args) > 1 else 2
    rng = np.random.default_rng(0)
    sp = (res,) * 3
    ok = True

    assert wu.pallas_warp_enabled(), "pallas warp not enabled on this backend"

    I = jnp.asarray(rng.standard_normal((B, 3) + sp), dtype=jnp.float32)
    d = jnp.asarray(rng.uniform(-1.0, 0.999, (B, 3) + sp), dtype=jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, 3) + sp), dtype=jnp.float32)

    got = wu.sample_displacement_unit_pallas(I, d)
    ref = sample_displacement_unit(I, d)
    err = float(jnp.abs(got - ref).max())
    print(f"fwd maxerr: {err:.3e}")
    ok &= err < 1e-5

    _, vjp_p = jax.vjp(wu.sample_displacement_unit_pallas, I, d)
    _, vjp_x = jax.vjp(sample_displacement_unit, I, d)
    gp, gx = vjp_p(g), vjp_x(g)
    for name, a, b in (("d_I", gp[0], gx[0]), ("d_disp", gp[1], gx[1])):
        err = float(jnp.abs(a - b).max())
        print(f"bwd {name} maxerr: {err:.3e}")
        ok &= err < 1e-4

    # broadcast image batch
    if quick:
        ok &= check_fluid_ground_truth()
        _quick_rest(rng, res, B, sp, ok)
        return
    I1 = jnp.asarray(rng.standard_normal((1, 1) + sp), dtype=jnp.float32)
    got = wu.sample_displacement_unit_pallas(I1, d)
    ref = sample_displacement_unit(I1, d)
    err = float(jnp.abs(got - ref).max())
    print(f"bcast fwd maxerr: {err:.3e}")
    ok &= err < 1e-5
    _, vjp_p = jax.vjp(wu.sample_displacement_unit_pallas, I1, d)
    _, vjp_x = jax.vjp(sample_displacement_unit, I1, d)
    g1 = jnp.asarray(rng.standard_normal((B, 1) + sp), dtype=jnp.float32)
    gp, gx = vjp_p(g1), vjp_x(g1)
    for name, a, b in (("d_I", gp[0], gx[0]), ("d_disp", gp[1], gx[1])):
        err = float(jnp.abs(a - b).max())
        print(f"bcast bwd {name} maxerr: {err:.3e}")
        ok &= err < 1e-4

    # universal-coverage shapes (padded-kernel path): 96^3 (z-pad to 128),
    # anisotropic, odd-ish sizes — bit-exact vs the XLA formulation
    for spc in ((96, 96, 96), (40, 96, 160), (24, 36, 40)):
        Ic = jnp.asarray(rng.standard_normal((2, 2) + spc), dtype=jnp.float32)
        dc = jnp.asarray(rng.uniform(-1.0, 0.999, (2, 3) + spc), dtype=jnp.float32)
        gc = jnp.asarray(rng.standard_normal((2, 2) + spc), dtype=jnp.float32)
        if not wu.fastpath_supported(Ic.shape, dc.shape, dc.dtype):
            print(f"shape {spc}: fastpath not supported (skipped)")
            continue
        got = wu.sample_displacement_unit_pallas(Ic, dc)
        ref = sample_displacement_unit(Ic, dc)
        err = float(jnp.abs(got - ref).max())
        print(f"shape {spc} fwd maxerr: {err:.3e}")
        ok &= err < 1e-5
        _, vjp_p = jax.vjp(wu.sample_displacement_unit_pallas, Ic, dc)
        _, vjp_x = jax.vjp(sample_displacement_unit, Ic, dc)
        gp, gx = vjp_p(gc), vjp_x(gc)
        for name, a, b in (("d_I", gp[0], gx[0]), ("d_disp", gp[1], gx[1])):
            err = float(jnp.abs(a - b).max())
            print(f"shape {spc} bwd {name} maxerr: {err:.3e}")
            ok &= err < 1e-4

    # fused Ad* kernel vs the composed XLA/warp path (values + both grads),
    # across geometry variants (whole-Y, y-blocked via res, padded)
    import lagomorph_tpu.ops.pallas.epdiff_unit as eu
    from lagomorph_tpu.ops.diff import jacobian_times_vectorfield as jtv

    def adstar_ref(p, m):
        return jtv(p, sample_displacement_unit(m, p), displacement=True)

    for spc in ((res,) * 3, (96, 96, 96), (40, 96, 160)):
        p_ = jnp.asarray(rng.uniform(-1.0, 0.999, (B, 3) + spc), dtype=jnp.float32)
        m_ = jnp.asarray(rng.standard_normal((B, 3) + spc), dtype=jnp.float32)
        g_ = jnp.asarray(rng.standard_normal((B, 3) + spc), dtype=jnp.float32)
        if not eu.ad_star_supported(p_.shape, m_.shape, p_.dtype):
            print(f"adstar {spc}: not supported (skipped)")
            continue
        got = eu.ad_star_unit_pallas(p_, m_)
        ref = adstar_ref(p_, m_)
        err = float(jnp.abs(got - ref).max())
        print(f"adstar {spc} fwd maxerr: {err:.3e}")
        ok &= err < 1e-4
        _, vjp_f = jax.vjp(eu.ad_star_unit_pallas, p_, m_)
        _, vjp_r = jax.vjp(adstar_ref, p_, m_)
        gf, gr = vjp_f(g_), vjp_r(g_)
        for name, a, b in (("d_p", gf[0], gr[0]), ("d_m0", gf[1], gr[1])):
            err = float(jnp.abs(a - b).max())
            print(f"adstar {spc} bwd {name} maxerr: {err:.3e}")
            ok &= err < 1e-3

    # fused composition kernel vs the composed path (values + both grads)
    for spc in ((res,) * 3, (96, 96, 96)):
        p_ = jnp.asarray(rng.uniform(-3.0, 3.0, (B, 3) + spc), dtype=jnp.float32)
        v_ = jnp.asarray(rng.uniform(-4.0, 4.0, (B, 3) + spc), dtype=jnp.float32)
        g_ = jnp.asarray(rng.standard_normal((B, 3) + spc), dtype=jnp.float32)
        s = 0.2
        if not eu.compose_supported(p_.shape, v_.shape, p_.dtype):
            print(f"compose {spc}: not supported (skipped)")
            continue

        def comp_ref(p, v):
            return s * v + sample_displacement_unit(p, s * v)

        got = eu.compose_disp_vel_pallas(p_, v_, s)
        ref = comp_ref(p_, v_)
        err = float(jnp.abs(got - ref).max())
        print(f"compose {spc} fwd maxerr: {err:.3e}")
        ok &= err < 1e-5
        _, vjp_f = jax.vjp(lambda p, v: eu.compose_disp_vel_pallas(p, v, s), p_, v_)
        _, vjp_r = jax.vjp(comp_ref, p_, v_)
        gf, gr = vjp_f(g_), vjp_r(g_)
        for name, a, b in (("d_p", gf[0], gr[0]), ("d_v", gf[1], gr[1])):
            err = float(jnp.abs(a - b).max())
            print(f"compose {spc} bwd {name} maxerr: {err:.3e}")
            ok &= err < 1e-4

    # end-to-end expmap consistency: pallas on vs off
    metric = lm.FluidMetric([0.05, 0.0, 0.05])
    m = jnp.asarray(rng.standard_normal((B, 3) + sp) * 1e-6, dtype=jnp.float32)

    def shoot_loss(m):
        h = lm.expmap(metric, m, num_steps=3)
        return jnp.sum(h * h)

    # jit: eager per-op dispatch of the FFT is unsupported on the remote
    # backend (and slow everywhere)
    v1, g1_ = jax.jit(jax.value_and_grad(shoot_loss))(m)
    prev = wu.set_pallas_warp(False)
    try:
        v0, g0_ = jax.jit(jax.value_and_grad(shoot_loss))(m)
    finally:
        wu.set_pallas_warp(prev)
    verr = abs(float(v1) - float(v0)) / max(abs(float(v0)), 1e-30)
    gerr = float(jnp.abs(g1_ - g0_).max())
    print(f"expmap value relerr: {verr:.3e}, grad maxerr: {gerr:.3e}")
    ok &= verr < 1e-5
    ok &= gerr < 1e-4

    # hoisted-regime dispatch: in-regime momenta must take the fused fast
    # path and match the per-warp static path; out-of-regime momenta must
    # fall back to the general tier and match it
    msmall = jnp.asarray(rng.standard_normal((B, 3) + sp) * 1e-6, dtype=jnp.float32)
    mbig = jnp.asarray(rng.standard_normal((B, 3) + sp) * 0.3, dtype=jnp.float32)
    for name, mm, tmode, cmode in (
        ("hoisted-in-regime", msmall, "unit", "unit"),
        ("hoisted-fallback", mbig, "general", "general"),
    ):
        h_auto = jax.jit(lambda m_: lm.expmap(metric, m_, num_steps=3))(mm)
        h_ref = jax.jit(
            lambda m_: lm.expmap(metric, m_, num_steps=3,
                                 transport_mode=tmode, compose_mode=cmode)
        )(mm)
        scale = max(float(jnp.abs(h_ref).max()), 1e-30)
        err = float(jnp.abs(h_auto - h_ref).max()) / scale
        print(f"{name} relerr: {err:.3e}")
        ok &= err < 1e-5

    ok &= check_fluid_ground_truth()

    print("ALL OK" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)


def _quick_rest(rng, res, B, sp, ok):
    """Quick-mode tail: fused Ad*/compose fwd+bwd at a whole-Y shape AND a
    y-blocked shape (the 128^3-class geometry the bench actually runs,
    covering the BX=32/BY=16 block envelope) + the hoisted-regime dispatch
    equivalence."""
    import lagomorph_tpu.ops.pallas.epdiff_unit as eu
    from lagomorph_tpu.ops.diff import jacobian_times_vectorfield as jtv

    def adstar_ref(p, m):
        return jtv(p, sample_displacement_unit(m, p), displacement=True)

    p_ = jnp.asarray(rng.uniform(-1.0, 0.999, (B, 3) + sp), dtype=jnp.float32)
    m_ = jnp.asarray(rng.standard_normal((B, 3) + sp), dtype=jnp.float32)
    g_ = jnp.asarray(rng.standard_normal((B, 3) + sp), dtype=jnp.float32)
    assert eu.ad_star_supported(p_.shape, m_.shape, p_.dtype)
    err = float(jnp.abs(eu.ad_star_unit_pallas(p_, m_) - adstar_ref(p_, m_)).max())
    print(f"quick adstar fwd maxerr: {err:.3e}")
    ok &= err < 1e-4
    _, vjp_f = jax.vjp(eu.ad_star_unit_pallas, p_, m_)
    _, vjp_r = jax.vjp(adstar_ref, p_, m_)
    gf, gr = vjp_f(g_), vjp_r(g_)
    for name, a, b in (("d_p", gf[0], gr[0]), ("d_m0", gf[1], gr[1])):
        err = float(jnp.abs(a - b).max())
        print(f"quick adstar bwd {name} maxerr: {err:.3e}")
        ok &= err < 1e-3

    # y-blocked geometry (Y*Z > 8192, Z % 128 == 0) at the round-3 block
    # envelope (BX=32, BY=16): the bench's 128^3 kernels are this variant
    spb = (32, 96, 128)
    pb = jnp.asarray(rng.uniform(-1.0, 0.999, (1, 3) + spb), dtype=jnp.float32)
    mb = jnp.asarray(rng.standard_normal((1, 3) + spb), dtype=jnp.float32)
    gb = jnp.asarray(rng.standard_normal((1, 3) + spb), dtype=jnp.float32)
    _, mwb = eu._adstar_fwd_dispatch(pb, mb, want_mw=True)
    bw = eu._adstar_bwd_fused_dispatch(pb, mb, gb, mwb)
    assert bw is not None, "yb fused bwd dispatch did not engage"
    _, vjp_rb = jax.vjp(adstar_ref, pb, mb)
    grb = vjp_rb(gb)
    for name, a, b in (("d_p", bw[0], grb[0]), ("d_m0", bw[1], grb[1])):
        err = float(jnp.abs(a - b).max())
        print(f"quick adstar yb bwd {name} maxerr: {err:.3e}")
        ok &= err < 1e-3
    cb = eu._compose_bwd_fused_dispatch(pb, mb, 0.2, gb)
    assert cb is not None, "yb fused compose bwd dispatch did not engage"

    def comp_refb(p, v):
        return 0.2 * v + sample_displacement_unit(p, 0.2 * v)

    _, vjp_cb = jax.vjp(comp_refb, pb, mb)
    gcb = vjp_cb(gb)
    for name, a, b in (("d_p", cb[0], gcb[0]), ("d_v", cb[1], gcb[1])):
        err = float(jnp.abs(a - b).max())
        print(f"quick compose yb bwd {name} maxerr: {err:.3e}")
        ok &= err < 1e-4

    s = 0.2

    def comp_ref(p, v):
        return s * v + sample_displacement_unit(p, s * v)

    pc = jnp.asarray(rng.uniform(-3.0, 3.0, (B, 3) + sp), dtype=jnp.float32)
    vc = jnp.asarray(rng.uniform(-4.0, 4.0, (B, 3) + sp), dtype=jnp.float32)
    assert eu.compose_supported(pc.shape, vc.shape, pc.dtype)
    err = float(jnp.abs(eu.compose_disp_vel_pallas(pc, vc, s) - comp_ref(pc, vc)).max())
    print(f"quick compose fwd maxerr: {err:.3e}")
    ok &= err < 1e-5
    _, vjp_f = jax.vjp(lambda p, v: eu.compose_disp_vel_pallas(p, v, s), pc, vc)
    _, vjp_r = jax.vjp(comp_ref, pc, vc)
    gf, gr = vjp_f(g_), vjp_r(g_)
    for name, a, b in (("d_p", gf[0], gr[0]), ("d_v", gf[1], gr[1])):
        err = float(jnp.abs(a - b).max())
        print(f"quick compose bwd {name} maxerr: {err:.3e}")
        ok &= err < 1e-4

    # padded-resident kernels (padres): bit-exact vs the per-call-padded
    # fused kernels at the y-blocked bench geometry, plus the halo contract
    import lagomorph_tpu.ops.pallas.padres as pr

    assert pr.supported(pb.shape, pb.dtype), "padres gate closed at yb shape"
    Xb, Yb, Zb = spb

    def ad_pr(p, m):
        return pr.ad_star_pr(pr.pad_carry(p), pr.pad_carry(m), Xb, Yb, Zb)

    mpr, fpr = jax.jit(ad_pr)(pb, mb)
    err = float(jnp.abs(mpr - eu.ad_star_unit_pallas(pb, mb)).max())
    print(f"quick padres adstar fwd vs fused maxerr: {err:.3e} "
          f"(flag {float(jnp.min(fpr)):.0f})")
    ok &= err == 0.0
    _, vjp_pr = jax.vjp(lambda p, m: ad_pr(p, m)[0], pb, mb)
    _, vjp_fu = jax.vjp(eu.ad_star_unit_pallas, pb, mb)
    gpr, gfu = vjp_pr(gb), vjp_fu(gb)
    for name, a, b in (("d_p", gpr[0], gfu[0]), ("d_m0", gpr[1], gfu[1])):
        err = float(jnp.abs(a - b).max())
        print(f"quick padres adstar bwd {name} vs fused maxerr: {err:.3e}")
        ok &= err == 0.0

    def comp_pr(p, v):
        outp, f = pr.compose_pr(pr.pad_carry(p), v, 0.2, Xb, Yb, Zb)
        return pr.unpad_carry(outp, Xb, Yb, Zb), outp

    cpr, cpad = jax.jit(comp_pr)(pb, mb)
    err = float(jnp.abs(cpr - eu.compose_disp_vel_pallas(pb, mb, 0.2)).max())
    print(f"quick padres compose fwd vs fused maxerr: {err:.3e}")
    ok &= err == 0.0
    # halo bands must be exact edge replications (next substep's CLAMP taps)
    o5 = cpad.reshape(1, 3, Xb + 2 * pr.PX, Yb + 2 * pr.PY, Zb)
    halo_err = max(
        float(jnp.abs(o5[:, :, r] - o5[:, :, pr.PX]).max())
        for r in range(pr.PX)
    ) + max(
        float(jnp.abs(o5[:, :, :, q] - o5[:, :, :, pr.PY]).max())
        for q in range(pr.PY)
    ) + max(
        float(jnp.abs(o5[:, :, :, pr.PY + Yb + q]
                      - o5[:, :, :, pr.PY + Yb - 1]).max())
        for q in range(pr.PY)
    ) + max(
        float(jnp.abs(o5[:, :, pr.PX + Xb + r]
                      - o5[:, :, pr.PX + Xb - 1]).max())
        for r in range(pr.PX)
    )
    print(f"quick padres compose halo replication err: {halo_err:.3e}")
    ok &= halo_err == 0.0
    _, vjp_cpr = jax.vjp(lambda p, v: comp_pr(p, v)[0], pb, mb)
    _, vjp_cfu = jax.vjp(
        lambda p, v: eu.compose_disp_vel_pallas(p, v, 0.2), pb, mb
    )
    gcp, gcf = vjp_cpr(gb), vjp_cfu(gb)
    for name, a, b in (("d_p", gcp[0], gcf[0]), ("d_v", gcp[1], gcf[1])):
        err = float(jnp.abs(a - b).max())
        print(f"quick padres compose bwd {name} vs fused maxerr: {err:.3e}")
        ok &= err == 0.0

    # hoisted padres expmap at the yb geometry == static unit path
    metric_b = lm.FluidMetric([0.05, 0.0, 0.05])
    mbs = jnp.asarray(
        rng.standard_normal((1, 3) + spb) * 1e-6, dtype=jnp.float32
    )
    h_auto = jax.jit(lambda m: lm.expmap(metric_b, m, num_steps=3))(mbs)
    h_ref = jax.jit(
        lambda m: lm.expmap(metric_b, m, num_steps=3,
                            transport_mode="unit", compose_mode="unit")
    )(mbs)
    scale = max(float(jnp.abs(h_ref).max()), 1e-30)
    err = float(jnp.abs(h_auto - h_ref).max()) / scale
    print(f"quick padres hoisted-in-regime relerr: {err:.3e}")
    ok &= err < 1e-5

    # hoisted dispatch: fused fast scan == static unit path in regime
    metric = lm.FluidMetric([0.05, 0.0, 0.05])
    msmall = jnp.asarray(rng.standard_normal((B, 3) + sp) * 1e-6, dtype=jnp.float32)
    h_auto = jax.jit(lambda m: lm.expmap(metric, m, num_steps=3))(msmall)
    h_ref = jax.jit(
        lambda m: lm.expmap(metric, m, num_steps=3,
                            transport_mode="unit", compose_mode="unit")
    )(msmall)
    scale = max(float(jnp.abs(h_ref).max()), 1e-30)
    err = float(jnp.abs(h_auto - h_ref).max()) / scale
    print(f"quick hoisted-in-regime relerr: {err:.3e}")
    ok &= err < 1e-5

    # 2D fused kernels (epdiff2d) at the 2D bench shape class
    import lagomorph_tpu.ops.pallas.epdiff2d as e2

    sp2 = (256, 256)
    p2 = jnp.asarray(rng.uniform(-1.0, 0.999, (2, 2) + sp2), dtype=jnp.float32)
    m2 = jnp.asarray(rng.standard_normal((2, 2) + sp2), dtype=jnp.float32)
    g2 = jnp.asarray(rng.standard_normal((2, 2) + sp2), dtype=jnp.float32)
    assert e2.supported(p2.shape, m2.shape, p2.dtype)
    err = float(jnp.abs(e2.ad_star2d_pallas(p2, m2) - adstar_ref(p2, m2)).max())
    print(f"quick 2d adstar fwd maxerr: {err:.3e}")
    ok &= err < 1e-4
    _, vjp_f = jax.vjp(e2.ad_star2d_pallas, p2, m2)
    _, vjp_r = jax.vjp(adstar_ref, p2, m2)
    gf, gr = vjp_f(g2), vjp_r(g2)
    for name, a, b in (("d_p", gf[0], gr[0]), ("d_m0", gf[1], gr[1])):
        err = float(jnp.abs(a - b).max())
        print(f"quick 2d adstar bwd {name} maxerr: {err:.3e}")
        ok &= err < 1e-3

    def comp_ref2(p, v):
        return 0.2 * v + sample_displacement_unit(p, 0.2 * v)

    err = float(jnp.abs(e2.compose2d_pallas(p2, m2, 0.2) - comp_ref2(p2, m2)).max())
    print(f"quick 2d compose fwd maxerr: {err:.3e}")
    ok &= err < 1e-5
    _, vjp_f = jax.vjp(lambda p, v: e2.compose2d_pallas(p, v, 0.2), p2, m2)
    _, vjp_r = jax.vjp(comp_ref2, p2, m2)
    gf, gr = vjp_f(g2), vjp_r(g2)
    for name, a, b in (("d_p", gf[0], gr[0]), ("d_v", gf[1], gr[1])):
        err = float(jnp.abs(a - b).max())
        print(f"quick 2d compose bwd {name} maxerr: {err:.3e}")
        ok &= err < 1e-4

    # 2D hoisted expmap: the auto path (now the shoot2d whole-shoot
    # mega-kernel) vs the static unit path.  The mega-kernel's fluid solve
    # is in-kernel MXU-DFT, not XLA fftn, so the tolerance is the
    # documented 3-pass bf16 envelope (~4e-5 rel per apply), not roundoff.
    m2s = jnp.asarray(rng.standard_normal((2, 2) + sp2) * 1e-6, dtype=jnp.float32)
    h_auto = jax.jit(lambda m: lm.expmap(metric, m, num_steps=3))(m2s)
    h_ref = jax.jit(
        lambda m: lm.expmap(metric, m, num_steps=3,
                            transport_mode="unit", compose_mode="unit")
    )(m2s)
    scale = max(float(jnp.abs(h_ref).max()), 1e-30)
    err = float(jnp.abs(h_auto - h_ref).max()) / scale
    print(f"quick 2d hoisted-in-regime relerr: {err:.3e}")
    ok &= err < 5e-4

    # 2D whole-shoot mega-kernel vs the per-op flagged scan (loss + grad)
    import lagomorph_tpu.ops.pallas.shoot2d as s2
    import lagomorph_tpu.lddmm as L

    Tn, dt2 = 4, 0.25
    assert s2.supported(m2s.shape, m2s.dtype, metric.params, Tn)
    v02 = metric.sharp(m2s)
    pp0 = (-dt2) * v02
    fused2 = L._hoisted_fused_pair(m2s)

    @jax.jit
    def s2_lossgrad(m):
        def f(m_):
            h, okf = s2.shoot2d(pp0, m_, metric.params, -dt2, Tn)
            return jnp.sum(h * h), okf
        (l, okf), g = jax.value_and_grad(f, has_aux=True)(m)
        return l, okf, g

    @jax.jit
    def fl_lossgrad(m):
        def f(m_):
            h, okf = L._expmap_fast_flagged(metric, m_, dt2, Tn, pp0, None,
                                            False, fused2)
            return jnp.sum(h * h), okf
        (l, okf), g = jax.value_and_grad(f, has_aux=True)(m)
        return l, okf, g

    l_s, ok_s, g_s = s2_lossgrad(m2s)
    l_f, ok_f, g_f = fl_lossgrad(m2s)
    gsc = max(float(jnp.abs(g_f).max()), 1e-30)
    gerr = float(jnp.abs(g_s - g_f).max()) / gsc
    lerr = abs(float(l_s) - float(l_f)) / max(abs(float(l_f)), 1e-30)
    flag_ok = (float(ok_s[0, 0]) > 0.5) == bool(ok_f)
    print(f"quick shoot2d loss relerr: {lerr:.3e}  grad relerr: {gerr:.3e}  "
          f"flag agree: {flag_ok}")
    ok &= lerr < 1e-3 and gerr < 1e-3 and flag_ok

    print("ALL OK" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
