"""Model families built on the op/algorithm layers.

* :mod:`registration` — pairwise affine / rigid / LDDMM registration (the
  reference exposes these capabilities implicitly through its op layer and
  atlas loops; here they are first-class jitted optimizers).
* :mod:`deep_atlas` — DeepLDDMMAtlas: a CNN that predicts initial momenta,
  trained end-to-end through differentiable geodesic shooting (the
  capability demonstrated in the reference's DeepLDDMMAtlas example
  notebook, examples/DeepLDDMMAtlas.ipynb — an LFS stub in the snapshot).
"""
from .registration import affine_register, rigid_register, lddmm_register
from .deep_atlas import MomentumNet, DeepLDDMMAtlas

__all__ = [
    "affine_register",
    "rigid_register",
    "lddmm_register",
    "MomentumNet",
    "DeepLDDMMAtlas",
]
