"""Fluid and other LDDMM metrics.

API mirror of the reference's lagomorph/metric.py, TPU-native: the Fourier
multiplier tensor is precomputed per shape (the analogue of the reference's
cos/sin LUT cache, metric.py:53-75) and applied as a fused rFFT -> einsum ->
irFFT pipeline (see :mod:`lagomorph_tpu.ops.fluid`).
"""
from __future__ import annotations

from .ops.fluid import fluid_operator

__all__ = ["FluidMetric", "Metric"]


class FluidMetric:
    """Green's function of ``L'L = (-alpha Laplacian - beta grad div +
    gamma)^2`` — the standard LDDMM fluid kernel (cf. Christensen et al 1994).

    Reference: lagomorph/metric.py:37-97.  ``params = [alpha, beta, gamma]``.

    Instances are stateless w.r.t. traced values and safe to close over under
    ``jax.jit``: the multiplier is rebuilt from traced iota math inside each
    jitted computation (``ops.fluid._fluid_multiplier_traced``) so no large
    constant is baked into the program — XLA CSEs the rebuild across uses.
    """

    def __init__(self, params=(0.1, 0.0, 0.001)):
        params = tuple(float(p) for p in params)
        assert len(params) == 3
        self.params = params

    def operator(self, mv, inverse):
        return fluid_operator(mv, self.params, inverse)

    def sharp(self, m):
        """Raise indices: momentum (covector field) -> velocity, by applying
        the smoothing Green's function (inverse operator)."""
        return self.operator(m, inverse=True)

    def flat(self, v):
        """Lower indices: velocity -> momentum, by applying the differential
        operator in the Fourier domain."""
        return self.operator(v, inverse=False)


class Metric:
    """Serialization and command line interface to a metric factory
    (reference: lagomorph/metric.py:100-135)."""

    @staticmethod
    def add_args(parser):
        parser.add_argument(
            "--metric_type",
            default="fluid",
            type=str,
            help="Type of metric. Currently only 'fluid' is supported.",
        )
        parser.add_argument(
            "--fluid_alpha",
            default=0.1,
            type=float,
            help="Fluid parameter for vector Laplacian term",
        )
        parser.add_argument(
            "--fluid_beta",
            default=0.0,
            type=float,
            help="Fluid parameter for gradient divergence term",
        )
        parser.add_argument(
            "--fluid_gamma",
            default=0.01,
            type=float,
            help="Fluid parameter for L2 term",
        )

    @classmethod
    def from_args(cls, args):
        if args.metric_type.lower() == "fluid":
            return FluidMetric(
                params=[args.fluid_alpha, args.fluid_beta, args.fluid_gamma]
            )
        raise ValueError(f"Unknown metric type {args.metric_type}")
