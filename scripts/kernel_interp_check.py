"""CPU interpret-mode correctness harness for the fused Pallas kernels.

Monkeypatches ``pl.pallas_call`` with ``interpret=True`` so every fused
kernel (Ad* fwd/bwd, compose fwd/bwd, whole-Y and y-blocked variants) runs
on CPU against the composed XLA reference.  Interpret mode is NOT Mosaic —
final validation stays scripts/tpu_checks.py on hardware — but it catches
index/roll/mask algebra bugs during kernel development without burning TPU
compile cycles (~f32-roundoff agreement expected, not bit-exactness).

Usage: python scripts/kernel_interp_check.py
Exit 0 on all-ok.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl

pl.pallas_call = partial(pl.pallas_call, interpret=True)

import lagomorph_tpu.ops.pallas.warp_unit as wu
import lagomorph_tpu.ops.pallas.epdiff_unit as eu
from lagomorph_tpu.ops.sampling import sample_displacement_unit
from lagomorph_tpu.ops.diff import jacobian_times_vectorfield as jtv

wu.pallas_warp_enabled = lambda: True  # gates check the backend; force on


def adstar_ref(p, m):
    return jtv(p, sample_displacement_unit(m, p), displacement=True)


def check(name, got, want, tol):
    err = float(jnp.abs(got - want).max())
    ok = err < tol
    print(f"{name:46s} maxerr {err:9.2e}  {'ok' if ok else 'FAIL'}",
          flush=True)
    return ok


def main():
    rng = np.random.default_rng(0)
    ok = True
    # (shape, expected variant): whole-Y needs Y*Z <= 8192 (+ bwd vmem
    # guard); y-blocked needs Z % 128 == 0 and a _pick_by_bwd block
    cases = [
        ((16, 8, 128), "whole-Y"),
        ((16, 96, 128), "y-blocked"),
    ]
    for sp, variant in cases:
        B = 1
        p = jnp.asarray(rng.uniform(-0.9, 0.9, (B, 3) + sp), dtype=jnp.float32)
        m0 = jnp.asarray(rng.standard_normal((B, 3) + sp), dtype=jnp.float32)
        g = jnp.asarray(rng.standard_normal((B, 3) + sp), dtype=jnp.float32)

        got, mw = eu._adstar_fwd_dispatch(p, m0, want_mw=True)
        ok &= check(f"adstar fwd {variant} {sp}", got, adstar_ref(p, m0), 5e-6)
        ok &= check(f"adstar fwd mw residual {variant} {sp}", mw,
                    sample_displacement_unit(m0, p), 5e-6)

        bw = eu._adstar_bwd_fused_dispatch(p, m0, g, mw)
        assert bw is not None, f"adstar bwd dispatch missing for {sp}"
        _, vjp_r = jax.vjp(adstar_ref, p, m0)
        gr = vjp_r(g)
        ok &= check(f"adstar bwd d_p {variant} {sp}", bw[0], gr[0], 5e-5)
        ok &= check(f"adstar bwd d_m0 {variant} {sp}", bw[1], gr[1], 5e-5)

        # full custom-vjp route (residual plumbing + dispatch)
        _, vjp_p = jax.vjp(eu.ad_star_unit_pallas, p, m0)
        gp = vjp_p(g)
        ok &= check(f"adstar vjp route d_p {variant} {sp}", gp[0], gr[0], 5e-5)
        ok &= check(f"adstar vjp route d_m0 {variant} {sp}", gp[1], gr[1], 5e-5)

        s = 0.2
        v = jnp.asarray(rng.uniform(-4.0, 4.0, (B, 3) + sp), dtype=jnp.float32)

        def comp_ref(p_, v_):
            return s * v_ + sample_displacement_unit(p_, s * v_)

        got = eu._compose_fwd_dispatch(p, v, s)
        ok &= check(f"compose fwd {variant} {sp}", got, comp_ref(p, v), 5e-6)

        cb = eu._compose_bwd_fused_dispatch(p, v, s, g)
        assert cb is not None, f"compose bwd dispatch missing for {sp}"
        _, vjp_c = jax.vjp(comp_ref, p, v)
        gc = vjp_c(g)
        ok &= check(f"compose bwd d_p {variant} {sp}", cb[0], gc[0], 5e-5)
        ok &= check(f"compose bwd d_v {variant} {sp}", cb[1], gc[1], 5e-5)

    # ---- plain warp kernels (warp_unit: tier-1 image/field warp) ------
    # whole-Y and y-blocked variants, C=1 (atlas image) and C=3, including
    # the batch-1 image broadcast used by the atlas warp
    for sp, variant in cases:
        B = 2
        for C in (1, 3):
            I = jnp.asarray(
                rng.standard_normal((1, C) + sp), dtype=jnp.float32
            )
            d = jnp.asarray(
                rng.uniform(-0.9, 0.9, (B, 3) + sp), dtype=jnp.float32
            )
            gI = jnp.asarray(
                rng.standard_normal((B, C) + sp), dtype=jnp.float32
            )

            def warp_ref(I_, d_):
                return sample_displacement_unit(I_, d_)

            got, _ = wu._sdu_fwd(I, d)
            ok &= check(f"warp fwd {variant} C{C} {sp}", got,
                        warp_ref(I, d), 5e-6)
            bwd = wu._sdu_bwd((I, d), gI)
            _, vjp_w = jax.vjp(warp_ref, I, d)
            gw = vjp_w(gI)
            ok &= check(f"warp bwd d_I {variant} C{C} {sp}", bwd[0],
                        gw[0], 5e-5)
            ok &= check(f"warp bwd d_d {variant} C{C} {sp}", bwd[1],
                        gw[1], 5e-5)

    # ---- 2D kernels (epdiff2d) ---------------------------------------
    import lagomorph_tpu.ops.pallas.epdiff2d as e2

    for sp2 in ((32, 128), (48, 256)):
        B = 2
        p = jnp.asarray(rng.uniform(-0.9, 0.9, (B, 2) + sp2), dtype=jnp.float32)
        m0 = jnp.asarray(rng.standard_normal((B, 2) + sp2), dtype=jnp.float32)
        g = jnp.asarray(rng.standard_normal((B, 2) + sp2), dtype=jnp.float32)
        assert e2.supported(p.shape, m0.shape, p.dtype), sp2

        got = e2.ad_star2d_pallas(p, m0)
        ok &= check(f"2d adstar fwd {sp2}", got, adstar_ref(p, m0), 5e-6)
        _, vjp_p = jax.vjp(e2.ad_star2d_pallas, p, m0)
        _, vjp_r = jax.vjp(adstar_ref, p, m0)
        gp, gr = vjp_p(g), vjp_r(g)
        ok &= check(f"2d adstar bwd d_p {sp2}", gp[0], gr[0], 5e-5)
        ok &= check(f"2d adstar bwd d_m0 {sp2}", gp[1], gr[1], 5e-5)

        # broadcast m0 batch
        m1 = m0[:1]
        got = e2.ad_star2d_pallas(p, m1)
        ok &= check(f"2d adstar bcast fwd {sp2}", got, adstar_ref(p, m1), 5e-6)
        _, vjp_p = jax.vjp(e2.ad_star2d_pallas, p, m1)
        _, vjp_r = jax.vjp(adstar_ref, p, m1)
        gp, gr = vjp_p(g), vjp_r(g)
        ok &= check(f"2d adstar bcast d_m0 {sp2}", gp[1], gr[1], 5e-5)

        s = 0.2
        v = jnp.asarray(rng.uniform(-4.0, 4.0, (B, 2) + sp2), dtype=jnp.float32)

        def comp_ref2(p_, v_):
            return s * v_ + sample_displacement_unit(p_, s * v_)

        got = e2.compose2d_pallas(p, v, s)
        ok &= check(f"2d compose fwd {sp2}", got, comp_ref2(p, v), 5e-6)
        _, vjp_c = jax.vjp(lambda p_, v_: e2.compose2d_pallas(p_, v_, s), p, v)
        _, vjp_cr = jax.vjp(comp_ref2, p, v)
        gc, gcr = vjp_c(g), vjp_cr(g)
        ok &= check(f"2d compose bwd d_p {sp2}", gc[0], gcr[0], 5e-5)
        ok &= check(f"2d compose bwd d_v {sp2}", gc[1], gcr[1], 5e-5)

    # ---- padded-resident kernels (padres) ------------------------------
    import lagomorph_tpu.ops.pallas.padres as pr
    import lagomorph_tpu.lddmm as L
    import lagomorph_tpu as lm

    sp = (16, 96, 128)
    B = 2
    X, Y, Z = sp
    p = jnp.asarray(rng.uniform(-0.9, 0.9, (B, 3) + sp), dtype=jnp.float32)
    m0 = jnp.asarray(rng.standard_normal((B, 3) + sp), dtype=jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, 3) + sp), dtype=jnp.float32)
    assert pr.supported(p.shape, p.dtype), "padres gate closed for test shape"

    def ad_pr(p_, m_):
        m, f = pr.ad_star_pr(pr.pad_carry(p_), pr.pad_carry(m_), X, Y, Z)
        return m, f

    got, f1 = ad_pr(p, m0)
    ok &= check("padres adstar fwd", got, adstar_ref(p, m0), 5e-6)
    okflag = float(jnp.min(f1)) > 0.5
    print(f"{'padres adstar in-unit flag (expect 1)':46s} "
          f"{float(jnp.min(f1)):9.2f}  {'ok' if okflag else 'FAIL'}")
    ok &= okflag
    _, fbad = ad_pr(p.at[0, 0, 3, 5, 7].set(1.5), m0)
    okflag = float(jnp.min(fbad)) < 0.5
    print(f"{'padres adstar out-of-unit flag (expect 0)':46s} "
          f"{float(jnp.min(fbad)):9.2f}  {'ok' if okflag else 'FAIL'}")
    ok &= okflag

    _, vjp_p = jax.vjp(lambda p_, m_: ad_pr(p_, m_)[0], p, m0)
    _, vjp_r = jax.vjp(adstar_ref, p, m0)
    gp, gr = vjp_p(g), vjp_r(g)
    ok &= check("padres adstar bwd d_p", gp[0], gr[0], 5e-5)
    ok &= check("padres adstar bwd d_m0", gp[1], gr[1], 5e-5)

    s = 0.2
    v = jnp.asarray(rng.uniform(-4.0, 4.0, (B, 3) + sp), dtype=jnp.float32)

    def comp_ref3(p_, v_):
        return s * v_ + sample_displacement_unit(p_, s * v_)

    outpad, f2 = pr.compose_pr(pr.pad_carry(p), v, s, X, Y, Z)
    ok &= check("padres compose fwd", pr.unpad_carry(outpad, X, Y, Z),
                comp_ref3(p, v), 5e-6)
    # halo bands must be exact domain-edge replications (the next substep's
    # kernels consume them as CLAMP extensions)
    o5 = outpad.reshape(B, 3, X + 2 * pr.PX, Y + 2 * pr.PY, Z)
    halo_ok = True
    for r in range(pr.PX):
        halo_ok &= bool(jnp.all(o5[:, :, r] == o5[:, :, pr.PX]))
        halo_ok &= bool(jnp.all(o5[:, :, pr.PX + X + r] == o5[:, :, pr.PX + X - 1]))
    for q in range(pr.PY):
        halo_ok &= bool(jnp.all(o5[:, :, :, q] == o5[:, :, :, pr.PY]))
        halo_ok &= bool(jnp.all(o5[:, :, :, pr.PY + Y + q] == o5[:, :, :, pr.PY + Y - 1]))
    print(f"{'padres compose halo replication':46s}            "
          f"{'ok' if halo_ok else 'FAIL'}")
    ok &= halo_ok

    def comp_pr(p_, v_):
        return pr.unpad_carry(
            pr.compose_pr(pr.pad_carry(p_), v_, s, X, Y, Z)[0], X, Y, Z
        )

    _, vjp_c = jax.vjp(comp_pr, p, v)
    _, vjp_cr = jax.vjp(comp_ref3, p, v)
    gc, gcr = vjp_c(g), vjp_cr(g)
    ok &= check("padres compose bwd d_p", gc[0], gcr[0], 5e-5)
    ok &= check("padres compose bwd d_v", gc[1], gcr[1], 5e-5)

    # full padded-resident fast scan vs the per-call-padded flagged scan
    metric = lm.FluidMetric([0.1, 0.0, 0.01])
    ms = jnp.asarray(rng.standard_normal((B, 3) + sp) * 2e-3,
                     dtype=jnp.float32)
    dt = 0.2
    v0 = metric.sharp(ms)
    ppi0 = (-dt) * v0
    fused = L._hoisted_fused_pair(ms)

    def loss_pr(m_):
        h, okf = L._expmap_fast_padres(metric, m_, dt, 3, ppi0, None, False)
        return jnp.sum(h * h) + 0.0 * okf.astype(jnp.float32), okf

    def loss_fl(m_):
        h, okf = L._expmap_fast_flagged(metric, m_, dt, 3, ppi0, None,
                                        False, fused)
        return jnp.sum(h * h) + 0.0 * okf.astype(jnp.float32), okf

    (lp, okp), gp = jax.value_and_grad(loss_pr, has_aux=True)(ms)
    (lf, okf_), gf = jax.value_and_grad(loss_fl, has_aux=True)(ms)
    ok &= check("padres expmap loss", jnp.asarray(lp), jnp.asarray(lf),
                1e-5 * max(1.0, abs(float(lf))))
    ok &= check("padres expmap grad", gp, gf, 5e-5)
    flag_ok = bool(okp) == bool(okf_)
    print(f"{'padres expmap flag agreement':46s}            "
          f"{'ok' if flag_ok else 'FAIL'}")
    ok &= flag_ok

    # MXU-DFT fluid kernels vs a complex-fft oracle (tolerance = the
    # documented 3-pass bf16 envelope, scaled to O(100) coefficients)
    import lagomorph_tpu.ops.pallas.fft_unit as fu
    import lagomorph_tpu.ops.fluid as fl

    for spf in ((16, 8, 128), (24, 16, 128)):
        F = 3
        x1 = jnp.asarray(rng.standard_normal((F,) + spf), jnp.float32)
        x2 = jnp.asarray(rng.standard_normal((F,) + spf), jnp.float32)
        Mn = jnp.asarray(rng.uniform(0.5, 2.0, spf), jnp.float32)
        fwd = tuple(fl._dft_pair(n, jnp.float32, False) for n in spf)
        inv = tuple(fl._dft_pair(n, jnp.float32, True) for n in spf)
        re, im = fu.fluid_flat_mxu(x1, x2, Mn, fwd, inv)
        z = np.fft.fftn(np.asarray(x1) + 1j * np.asarray(x2), axes=(1, 2, 3))
        ref = np.fft.ifftn(np.asarray(Mn)[None] * z, axes=(1, 2, 3))
        ok &= check(f"mxu fluid re {spf}", re, jnp.asarray(ref.real), 2e-3)
        ok &= check(f"mxu fluid im {spf}", im, jnp.asarray(ref.imag), 2e-3)

    # whole-volume one-kernel MXU-DFT fluid path (incl. the Z=64 geometry
    # the three-kernel gates used to exclude)
    for spf in ((16, 8, 128), (16, 16, 64)):
        F = 3
        x1 = jnp.asarray(rng.standard_normal((F,) + spf), jnp.float32)
        x2 = jnp.asarray(rng.standard_normal((F,) + spf), jnp.float32)
        Mn = jnp.asarray(rng.uniform(0.5, 2.0, spf), jnp.float32)
        fwd = tuple(fl._dft_pair(n, jnp.float32, False) for n in spf)
        inv = tuple(fl._dft_pair(n, jnp.float32, True) for n in spf)
        re, im = fu.fluid_flat_mxu_whole(x1, x2, Mn, fwd, inv)
        z = np.fft.fftn(np.asarray(x1) + 1j * np.asarray(x2), axes=(1, 2, 3))
        ref = np.fft.ifftn(np.asarray(Mn)[None] * z, axes=(1, 2, 3))
        ok &= check(f"mxu whole fluid re {spf}", re, jnp.asarray(ref.real),
                    2e-3)
        ok &= check(f"mxu whole fluid im {spf}", im, jnp.asarray(ref.imag),
                    2e-3)

    # ---- 2D whole-shoot mega-kernel (shoot2d) --------------------------
    import lagomorph_tpu.ops.pallas.shoot2d as s2

    sp2 = (16, 128)
    B = 2
    Tn = 3
    dt = 0.25
    metric2 = lm.FluidMetric([0.1, 0.0, 0.01])
    ms2 = jnp.asarray(rng.standard_normal((B, 2) + sp2) * 5e-4,
                      dtype=jnp.float32)
    assert s2.supported(ms2.shape, ms2.dtype, metric2.params, Tn), \
        "shoot2d gate closed for test shape"
    v02 = metric2.sharp(ms2)
    pp0 = (-dt) * v02
    fused2 = L._hoisted_fused_pair(ms2)

    def loss_s2(m_):
        h, okf = s2.shoot2d(pp0, m_, metric2.params, -dt, Tn)
        return jnp.sum(h * h), (h, okf)

    def loss_f2(m_):
        h, okf = L._expmap_fast_flagged(metric2, m_, dt, Tn, pp0, None,
                                        False, fused2)
        return jnp.sum(h * h), (h, okf)

    (l2, (h2, ok2)), g2 = jax.value_and_grad(loss_s2, has_aux=True)(ms2)
    (lr2, (hr2, okr2)), gr2 = jax.value_and_grad(loss_f2, has_aux=True)(ms2)
    # fluid numerics differ (in-kernel DFT matmuls vs XLA fftn): scale the
    # tolerance to the field/gradient magnitudes, not roundoff
    hs = max(1e-30, float(jnp.abs(hr2).max()))
    gs = max(1e-30, float(jnp.abs(gr2).max()))
    ok &= check("shoot2d expmap phiinv", h2, hr2, 5e-4 * hs)
    ok &= check("shoot2d expmap loss", jnp.asarray(l2), jnp.asarray(lr2),
                1e-3 * max(1e-30, abs(float(lr2))))
    ok &= check("shoot2d expmap grad d_m0", g2, gr2, 1e-3 * gs)
    flag2 = (float(ok2[0, 0]) > 0.5) == bool(okr2)
    print(f"{'shoot2d in-unit flag agreement':46s}            "
          f"{'ok' if flag2 else 'FAIL'}")
    ok &= flag2

    # grad wrt the initial phiinv (the peeled first step feeds this)
    def loss_s2p(p_):
        h, _ = s2.shoot2d(p_, ms2, metric2.params, -dt, Tn)
        return jnp.sum(h * h)

    def loss_f2p(p_):
        h, _ = L._expmap_fast_flagged(metric2, ms2, dt, Tn, p_, None,
                                      False, fused2)
        return jnp.sum(h * h)

    gp2 = jax.grad(loss_s2p)(pp0)
    gpr2 = jax.grad(loss_f2p)(pp0)
    gps = max(1e-30, float(jnp.abs(gpr2).max()))
    ok &= check("shoot2d expmap grad d_phiinv0", gp2, gpr2, 1e-3 * gps)

    # out-of-regime flag trips
    _, okbad = s2.shoot2d(pp0.at[0, 0, 3, 7].set(1.5), ms2,
                          metric2.params, -dt, Tn)
    flagbad = float(okbad[0, 0]) < 0.5
    print(f"{'shoot2d out-of-unit flag (expect 0)':46s} "
          f"{float(okbad[0, 0]):9.2f}  {'ok' if flagbad else 'FAIL'}")
    ok &= flagbad

    # broadcast momentum (atlas-style shared m0)
    h_b, _ = s2.shoot2d(pp0, ms2[:1], metric2.params, -dt, Tn)
    h_bb, _ = s2.shoot2d(pp0, jnp.broadcast_to(ms2[:1], ms2.shape),
                         metric2.params, -dt, Tn)
    ok &= check("shoot2d broadcast m0", h_b, h_bb, 1e-12)

    # streaming-trajectory variant (the 512^2 / deep-T form: trajectories
    # in HBM, hand-DMAed plane-by-plane) must be BIT-exact vs resident
    os.environ["LAGO_SHOOT2D_STREAM"] = "1"
    try:
        (l2s, (h2s, _)), g2s = jax.value_and_grad(
            loss_s2, has_aux=True)(ms2)
        gp2s = jax.grad(loss_s2p)(pp0)
    finally:
        os.environ.pop("LAGO_SHOOT2D_STREAM", None)
    ok &= check("shoot2d stream phiinv", h2s, h2, 1e-30)
    ok &= check("shoot2d stream grad d_m0", g2s, g2, 1e-30)
    ok &= check("shoot2d stream grad d_phiinv0", gp2s, gp2, 1e-30)

    print("ALL OK" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
