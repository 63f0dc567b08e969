"""gesolve / gesolver — generalized eigenproblem CLI entry points (the
reference's installed `gesolve`=getest5.c and `gesolver`=getest5b.c
binaries; doc/man/man1/gesolve.1).  Same driver as esolve with the
generalized pencil path forced.

Usage: python -m lis_tpu.cli.gesolve A.mtx B.mtx [evector_file] [options]
"""

from __future__ import annotations

import sys

from lis_tpu.cli.esolve import main as _main


def main(argv=None):
    return _main(argv, general=True)


if __name__ == "__main__":
    sys.exit(main())
