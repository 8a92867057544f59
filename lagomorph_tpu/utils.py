"""CLI tooling, progress bars, and distributed bootstrap.

API mirror of the reference's lagomorph/utils.py.  The reference bootstraps
with mpi4py + NCCL (utils.py:33-76,148-166); on TPU the JAX runtime handles
process bootstrap: ``jax.distributed.initialize()`` for multi-host, and a
single global :class:`jax.sharding.Mesh` replaces the NCCL process group.
"""
from __future__ import annotations

import argparse
import os
import sys

# notebook-aware tqdm (reference utils.py:5-30)
IN_IPYNB = None


def in_ipynb():
    global IN_IPYNB
    if IN_IPYNB is not None:
        return IN_IPYNB
    try:
        cfg = get_ipython().config  # noqa: F821
        if type(get_ipython()).__module__.startswith("ipykernel."):  # noqa: F821
            IN_IPYNB = True
            return True
        return False
    except NameError:
        return False


if in_ipynb():
    from tqdm import tqdm_notebook as tqdm  # pragma: no cover
else:
    from tqdm import tqdm  # noqa: F401


def process_count():
    """Number of JAX processes (hosts) in this job."""
    import jax

    return jax.process_count()


def process_index():
    """This host's process index (rank 0 does IO/progress)."""
    import jax

    return jax.process_index()


def local_device_count():
    import jax

    return jax.local_device_count()


class Tool:
    """Base class for two-level CLIs: ``<prog> <subcommand> [args...]``.

    Subclasses declare ``module_name`` and ``subcommands``; each subcommand
    is a method of the same name that builds its own argparse parser via
    :meth:`new_parser` and consumes ``sys.argv[2:]``.  Dispatch itself does
    not use argparse — :meth:`run` peeks at the first positional token and
    either calls the matching method or prints a generated overview.

    (Same CLI surface as the reference's Tool, utils.py:79-119, implemented
    independently.)
    """

    module_name = None
    subcommands = []

    def _prog(self, subcmd=None):
        base = f"python -m {self.module_name}"
        return base if subcmd is None else f"{base} {subcmd}"

    def _overview(self):
        lines = [f"usage: {self._prog()} <command> [<args>]", "", "commands:"]
        for name in self.subcommands:
            doc = self.describe_subcommand(name) or ""
            summary = next((ln.strip() for ln in doc.splitlines() if ln.strip()), "")
            lines.append(f"  {name:<14} {summary}")
        return "\n".join(lines) + "\n"

    def run(self, argv=None):
        argv = sys.argv if argv is None else argv
        cmd = argv[1] if len(argv) > 1 else None
        if cmd in ("-h", "--help", None):
            print(self._overview())
            sys.exit(0 if cmd else 1)
        if cmd not in self.subcommands:
            print(f"ERROR: unknown command {cmd!r}\n")
            print(self._overview())
            sys.exit(1)
        self.call_subcommand(cmd)

    def describe_subcommand(self, name):
        return getattr(self, name).__doc__

    def new_parser(self, subcmd=None, **kwargs):
        return argparse.ArgumentParser(
            prog=self._prog(subcmd),
            formatter_class=argparse.ArgumentDefaultsHelpFormatter,
            **kwargs,
        )

    def call_subcommand(self, name):
        getattr(self, name)()

    @staticmethod
    def _compute_args(parser):
        """Add common arguments for parallel commands (reference
        utils.py:121-130 exposed --gpu; here we expose the JAX platform and
        multi-host coordination parameters)."""
        group = parser.add_argument_group("compute parameters")
        group.add_argument(
            "--platform",
            default=None,
            type=str,
            help="JAX platform to use (e.g. tpu, cpu). Default: JAX default.",
        )
        group.add_argument(
            "--coordinator_address",
            default=None,
            type=str,
            help="host:port of process 0, for multi-host jax.distributed",
        )
        group.add_argument(
            "--num_processes",
            default=None,
            type=int,
            help="Total number of processes, for multi-host jax.distributed",
        )
        group.add_argument(
            "--process_id",
            default=None,
            type=int,
            help="This process's id, for multi-host jax.distributed",
        )
        group.add_argument(
            "--fluid_transform",
            default="auto",
            choices=["auto", "mxu", "radix", "packed", "fft", "dft"],
            help="Fluid-solve transform: auto (Pallas MXU-DFT kernels where"
            " supported, else packed complex pairs on TPU, rfftn elsewhere),"
            " mxu/radix (force a Pallas kernel), packed (XLA packed pairs),"
            " fft (force legacy rfftn — numerically unsafe for >= 12 batched"
            " 128^3 transforms on some TPU runtimes), dft (XLA-level matmul"
            "-DFT probe path)",
        )
        group.add_argument(
            "--warp_mode",
            default="auto",
            choices=["auto", "unit", "bounded", "general"],
            help="Global warp-tier mode (set_warp_mode): auto = runtime"
            " tiering + fused kernels; general forces the gather path and"
            " disables every fused fast path (debug/parity)",
        )

    def _initialize_compute(self, args):
        """Initialize the JAX runtime and build the global data-parallel mesh
        (TPU-native replacement for torch.cuda.set_device + NCCL
        init_process_group, reference utils.py:132-166)."""
        import jax

        if getattr(args, "platform", None):
            jax.config.update("jax_platforms", args.platform)
        ft = getattr(args, "fluid_transform", "auto")
        if ft != "auto":
            from .ops.fluid import (
                set_fluid_dft,
                set_fluid_fft_kernel,
                set_fluid_packing,
            )

            if ft in ("mxu", "radix"):
                set_fluid_fft_kernel(ft)
            else:
                # every non-kernel choice must really bypass the Pallas
                # kernels, not just re-route the XLA fallback
                set_fluid_fft_kernel(False)
                if ft == "dft":
                    set_fluid_dft(True)
                else:
                    set_fluid_packing(ft == "packed")
        wm = getattr(args, "warp_mode", "auto")
        if wm != "auto":
            from .ops.interp import set_warp_mode

            set_warp_mode(wm)
        if getattr(args, "coordinator_address", None):
            jax.distributed.initialize(
                coordinator_address=args.coordinator_address,
                num_processes=args.num_processes,
                process_id=args.process_id,
            )
        elif os.environ.get("JAX_COORDINATOR_ADDRESS"):
            jax.distributed.initialize()

        self.rank = jax.process_index()
        self.world_size = jax.process_count()
        from .parallel import get_mesh

        self.mesh = get_mesh() if jax.device_count() > 1 else None

    def _stamp_dataset(self, ds, args):
        """Stamp provenance attrs on an output HDF5 dataset (reference
        utils.py:168-173)."""
        from .version import __version__
        import json

        ds.attrs["lagomorph_version"] = __version__
        ds.attrs["command_args"] = json.dumps(
            {k: v for k, v in vars(args).items() if not k.startswith("_")}
        )
