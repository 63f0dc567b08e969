"""esolver — the reference's installed `esolver` binary (=etest5b.c):
the multi-pair variant of `esolve`; all ss pairs are printed (this
driver always prints every computed pair, so the alias differs from
esolve only in its reference-matching name).

Usage: python -m lis_tpu.cli.esolver matrix.mtx [evector_file] [options]
"""

from __future__ import annotations

import sys

from lis_tpu.cli.esolve import main as _main


def main(argv=None):
    return _main(argv)


if __name__ == "__main__":
    sys.exit(main())
