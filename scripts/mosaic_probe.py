"""Bisect Mosaic compile failures of the fused backward kernels: compile
(and once, run) the adstar/compose y-blocked backward dispatch at a small
y-blocked geometry.  Usage: python scripts/mosaic_probe.py [which]
where ``which`` is adstar|compose (default adstar)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import lagomorph_tpu.ops.pallas.epdiff_unit as eu

which = sys.argv[1] if len(sys.argv) > 1 else "adstar"
# default Y*Z > 8192 forces the y-blocked kernels (whole-Y gate rejects);
# pass X Y Z to probe other geometries (e.g. 64 64 64 = whole-Y)
if len(sys.argv) > 4:
    X, Y, Z = int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
else:
    X = 32
    Y = Z = 128
B = 1
rng = np.random.default_rng(0)
shp = (B, 3, X, Y, Z)
p = jnp.asarray(rng.uniform(-0.9, 0.9, shp), dtype=jnp.float32)
m = jnp.asarray(rng.standard_normal(shp), dtype=jnp.float32)
g = jnp.asarray(rng.standard_normal(shp), dtype=jnp.float32)

if which == "adstar":
    fn = jax.jit(lambda a, b, c: eu._adstar_bwd_fused_dispatch(
        a, b, c, eu._adstar_fwd_dispatch(a, b, want_mw=True)[1]))
else:
    fn = jax.jit(lambda a, b, c: eu._compose_bwd_fused_dispatch(a, b, 0.1, c))

out = fn(p, m, g)
print("compiled+ran ok:", None if out is None else [float(jnp.sum(o)) for o in out])
