"""Top-level CLI: ``lagomorph_tpu <module> <subcommand> [args]``.

Mirror of the reference's lagomorph/__main__.py.
"""
import sys

from .utils import Tool


class LagomorphTool(Tool):
    """Command line interface to lagomorph_tpu commands"""

    module_name = "lagomorph_tpu"
    subcommands = ["affine", "data", "lddmm"]

    def _subtool(self, command):
        if command == "affine":
            from .affine import _Tool
        elif command == "data":
            from .data import _Tool
        elif command == "lddmm":
            from .lddmm import _Tool
        else:  # pragma: no cover
            raise ValueError(command)
        return _Tool

    def call_subcommand(self, command):
        # remove subcommand arg before passing it down (reference
        # __main__.py:13-18)
        del sys.argv[1]
        return self._subtool(command)().run()

    def describe_subcommand(self, command):
        return self._subtool(command).__doc__


def main():
    LagomorphTool().run()


if __name__ == "__main__":
    main()
