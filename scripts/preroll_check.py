"""Bit-exactness check for the _BWD_PREROLL restructures of the yb Ad*
backward: runs the fused backward dispatch in CPU interpret mode at every
pre-roll level and demands bitwise-identical outputs (the restructures are
pure element-selection commutations, so even interpret mode must agree to
the bit).  Exit 0 on all-ok.
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

wu.pallas_warp_enabled = lambda: True


def main():
    rng = np.random.default_rng(3)
    ok = True
    # Shapes must be big enough that the dispatches fall through the
    # whole-Y gates to the y-blocked bodies the pre-rolls live in:
    # adstar needs (BX+16)*Y*Z > 50k, compose 36*(BX+16)*Y*Z > 7MiB.
    for sp in ((32, 72, 128), (16, 72, 128)):
        # IN-REGIME displacements (|d| < 1): level 3 exploits the unit
        # regime's floor in {-1, 0} — outside it the kernels' outputs are
        # discarded by the validity flag and levels legitimately disagree
        p = jnp.asarray(
            rng.uniform(-0.97, 0.97, (1, 3) + sp), dtype=jnp.float32
        )
        m0 = jnp.asarray(rng.standard_normal((1, 3) + sp), dtype=jnp.float32)
        g = jnp.asarray(rng.standard_normal((1, 3) + sp), dtype=jnp.float32)
        # compose's displacement is s*v: keep |0.37*v| < 1 (unit regime)
        vv = jnp.asarray(
            rng.uniform(-2.5, 2.5, (1, 3) + sp), dtype=jnp.float32
        )
        _, mw = eu._adstar_fwd_dispatch(p, m0, want_mw=True)
        outs = {}
        couts = {}
        for lvl in (0, 1, 2, 3, 4):
            eu._BWD_PREROLL_ADSTAR = eu._BWD_PREROLL_COMPOSE = lvl
            bw = eu._adstar_bwd_fused_dispatch(p, m0, g, mw)
            assert bw is not None, f"yb bwd dispatch missing for {sp}"
            outs[lvl] = tuple(np.asarray(x) for x in bw)
            cb = eu._compose_bwd_fused_dispatch(p, vv, 0.37, g)
            assert cb is not None, "compose bwd dispatch missing"
            couts[lvl] = tuple(np.asarray(x) for x in cb)
        for lvl in (1, 2, 3, 4):
            for kern, res in (("adstar", outs), ("compose", couts)):
                if lvl not in res:
                    continue
                names = ("d_p", "d_m0") if kern == "adstar" else ("d_p", "d_v")
                for i, name in enumerate(names):
                    # level 3 reassociates the weight-gradient sums
                    # (select tree): roundoff-level agreement, not bitwise
                    loose = lvl >= 3 and (
                        (kern == "adstar" and name == "d_p")
                        or (kern == "compose" and name == "d_v")
                        # level 4 groups the d_m0 oy-sums into box
                        # accumulators before the accz add (reassociation)
                        or (lvl >= 4 and kern == "adstar")
                    )
                    d = float(np.abs(res[0][i] - res[lvl][i]).max())
                    if loose:
                        scale = float(np.abs(res[0][i]).max())
                        good = d < 1e-5 * max(scale, 1.0)
                        verdict = f"maxerr {d:9.2e} ({'ok' if good else 'FAIL'})"
                    else:
                        good = np.array_equal(res[0][i], res[lvl][i])
                        verdict = "bit-exact" if good else f"MISMATCH {d:9.2e}"
                    print(
                        f"preroll{lvl} vs 0  {kern} {name} {sp}: {verdict}",
                        flush=True,
                    )
                    ok &= good
    print("ALL OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
