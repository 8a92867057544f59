"""Spatial-sharding (SP) study: what GSPMD does to the EPDiff pipeline when
fields are sharded along one spatial axis of the grid (the volumetric
analogue of sequence parallelism, SURVEY.md §5).

For each building block, jit-lower it with spatially-sharded inputs on an
8-device CPU mesh and count the collectives GSPMD inserted (kind, count,
bytes).  Output feeds docs/spatial_sharding.md.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 python scripts/sp_study.py [res]
"""
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

import lagomorph_tpu as lm
from lagomorph_tpu import adjrep, deform
from lagomorph_tpu.ops import diff as odiff
from lagomorph_tpu.parallel import get_mesh, spatial_sharding, replicated_sharding

COLLECTIVES = (
    "all-gather",
    "all-reduce",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
)


def analyze(name, fn, *args, shardings=None):
    lowered = jax.jit(fn, in_shardings=shardings).lower(*args)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    counts = Counter()
    bytes_by_kind = Counter()
    for line in hlo.splitlines():
        for kind in COLLECTIVES:
            # match HLO op instances like "all-gather(", "all-gather-start("
            if re.search(rf"= \S+ {kind}(-start)?\(", line):
                counts[kind] += 1
                m = re.search(r"(f32|bf16|f64|c64)\[([0-9,]*)\]", line)
                if m:
                    dims = [int(x) for x in m.group(2).split(",") if x]
                    elt = {"f32": 4, "bf16": 2, "f64": 8, "c64": 8}[m.group(1)]
                    bytes_by_kind[kind] += int(np.prod(dims)) * elt if dims else elt
    total = sum(counts.values())
    parts = ", ".join(
        f"{k}×{v} ({bytes_by_kind[k] / 1e6:.1f} MB)" for k, v in sorted(counts.items())
    )
    print(f"{name:38s} collectives: {total:3d}   {parts}", flush=True)
    return counts, bytes_by_kind


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    B = 2
    sp = (res,) * 3
    mesh = get_mesh()
    ss = spatial_sharding(mesh, ndim=5, spatial_axis=0)
    rs = replicated_sharding(mesh)
    rng = np.random.default_rng(0)
    metric = lm.FluidMetric([0.1, 0.0, 0.01])

    p = jnp.asarray(rng.uniform(-0.9, 0.9, (B, 3) + sp), dtype=jnp.float32)
    m0 = jnp.asarray(rng.standard_normal((B, 3) + sp) * 1e-3, dtype=jnp.float32)

    print(f"=== spatial sharding study, res={res}^3, mesh=8 (X-axis sharded) ===")

    analyze("jtv (9 central-diff stencils)",
            lambda pp: odiff.jacobian_times_vectorfield(pp, m0, displacement=True),
            p, shardings=(ss,))
    analyze("tier-1 warp (27-tap stencil)",
            lambda pp: lm.interp_auto(m0, pp, mode="unit"), p, shardings=(ss,))
    analyze("Ad_star (warp+jtv)",
            lambda pp: adjrep.Ad_star(pp, m0, mode="unit"), p, shardings=(ss,))
    analyze("fluid sharp (rfftn/irfftn)",
            lambda mm: metric.sharp(mm), m0, shardings=(ss,))
    analyze("compose (warp+axpy)",
            lambda pp: deform.compose_disp_vel(pp, m0, dt=-0.2, mode="unit"),
            p, shardings=(ss,))
    analyze("EPDiff substep",
            lambda pp: lm.EPDiff_step(metric, m0, 0.2, pp,
                                      transport_mode="unit", compose_mode="unit"),
            p, shardings=(ss,))

    def shoot_loss(mm):
        h = lm.expmap(metric, mm, num_steps=3,
                      transport_mode="unit", compose_mode="unit")
        return jnp.sum(h * h)

    analyze("expmap(3) fwd", shoot_loss, m0, shardings=(ss,))
    analyze("expmap(3) fwd+bwd", jax.grad(shoot_loss), m0, shardings=(ss,))

    # the explicit shard_map halo formulation (parallel/sharded_epdiff.py):
    # per substep 2 ppermutes (1-voxel X halos) + 2 all-to-alls (distributed
    # rFFT) instead of GSPMD's ~171
    from lagomorph_tpu.parallel.sharded_epdiff import (
        sharded_expmap, sharded_atlas_loss,
    )

    def sh_shoot_loss(mm):
        h = sharded_expmap(metric, mm, mesh, num_steps=3)
        return jnp.sum(h * h)

    analyze("halo sharded_expmap(3) fwd", sh_shoot_loss, m0, shardings=(ss,))
    analyze("halo sharded_expmap(3) fwd+bwd", jax.grad(sh_shoot_loss),
            m0, shardings=(ss,))

    I = jnp.asarray(rng.standard_normal((1, 1) + sp), dtype=jnp.float32)
    img = jnp.asarray(rng.standard_normal((B, 1) + sp), dtype=jnp.float32)
    analyze("halo sharded_atlas_loss grad",
            jax.grad(lambda mm: sharded_atlas_loss(
                metric, I, mm, img, mesh, reg_weight=0.1, num_steps=3)[0]),
            m0, shardings=(ss,))


if __name__ == "__main__":
    main()
