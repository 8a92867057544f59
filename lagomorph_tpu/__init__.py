"""lagomorph_tpu: TPU-native large-scale computational anatomy in JAX.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
CUDA/PyTorch library "lagomorph" (batched 2D/3D LDDMM and affine image
registration and atlas building).  All tensors are NC(D)HW: (batch, channel,
*spatial); a scalar image has 1 channel, a displacement/vector field has
``dim`` channels.
"""
from .version import __version__

from .ops import (
    interp,
    interp_auto,
    set_warp_mode,
    splat,
    interp_hessian_diagonal_image,
    jacobian_times_vectorfield,
    jacobian_times_vectorfield_adjoint,
    affine_interp,
    regrid,
)
from .deform import identity, compose, compose_disp_vel, compose_vel_disp
from .metric import FluidMetric, Metric
from .adjrep import ad, Ad, ad_star, Ad_star, ad_dagger, Ad_dagger, sym, sym_dagger
from .lddmm import (
    expmap,
    expmap_advect,
    EPDiff_step,
    EPDiff_steps,
    LDDMMAtlasBuilder,
    lddmm_atlas,
)
from .affine import (
    affine_inverse,
    affine_atlas,
    det_2x2,
    invert_2x2,
    invert_3x3,
    rotation_exp_map,
    rigid_inverse,
    StandardizedDataset,
)

from . import deform, adjrep, ops, data, parallel, vis
from . import affine, lddmm, metric, utils


def set_debug_mode(mode=True):
    """Enable verbose numerical debugging.

    The reference's debug mode makes every CUDA launch synchronize and check
    errors (extension.cpp:105-107, defs.h:17-23).  The TPU analogue: enable
    NaN checking in the JAX runtime so any kernel producing non-finite values
    raises immediately.
    """
    import jax

    jax.config.update("jax_debug_nans", bool(mode))
