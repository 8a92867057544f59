"""Low-level grid operators (the TPU-native "kernel layer").

These modules replace the reference's CUDA extension
(lagomorph/extension/*): pure-JAX gather/scatter/stencil/FFT formulations
whose autodiff adjoints match the reference's hand-written backward kernels
exactly, with optional Pallas fast paths for the hottest ops.
"""
from .boundary import diff_central, diff_central_adjoint, shift_clamp
from .sampling import identity_grid, sample_linear, splat_linear
from .interp import interp, interp_auto, interp_hessian_diagonal_image, splat, set_warp_mode
from .diff import jacobian_times_vectorfield, jacobian_times_vectorfield_adjoint
from .fluid import fluid_operator
from .affine import affine_interp, regrid

__all__ = [
    "diff_central",
    "diff_central_adjoint",
    "shift_clamp",
    "identity_grid",
    "sample_linear",
    "splat_linear",
    "interp",
    "interp_auto",
    "set_warp_mode",
    "splat",
    "interp_hessian_diagonal_image",
    "jacobian_times_vectorfield",
    "jacobian_times_vectorfield_adjoint",
    "fluid_operator",
    "affine_interp",
    "regrid",
]
