"""gesolver — the reference's installed `gesolver` binary (=getest5b.c):
the multi-pair variant of `gesolve`.

Usage: python -m lis_tpu.cli.gesolver A.mtx B.mtx [evector_file] [options]
"""

from __future__ import annotations

import sys

from lis_tpu.cli.gesolve import main as _main


def main(argv=None):
    return _main(argv)


if __name__ == "__main__":
    sys.exit(main())
