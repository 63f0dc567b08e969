"""SpMV dispatch — the L3←L4 interface.

The reference dispatches on A->matrix_type (src/matvec/lis_matvec.c:55-345);
here dispatch is a method call on the format object.  These wrappers exist
so solver code reads like the reference's three-call interface
(lis_matvec / lis_matvech) and so format fast paths can be swapped in
centrally.  There is deliberately NO hand-written Pallas SpMV kernel:
the jnp DIA path already measures at 105% of the v5e HBM spec and the
BES slab path at 91% (BENCH.md) — XLA's fusion is at the roofline, and
the round-1 experimental manual-DMA kernel crashed the TPU worker
(Mosaic legalization) without being faster.  Removal is the
measurement-driven choice (VERDICT round 1, item 8).
"""

from __future__ import annotations

from lis_tpu.matrix.base import SparseMatrix


def matvec(a: SparseMatrix, x):
    """y = A x."""
    return a.matvec(x)


def matvech(a: SparseMatrix, x):
    """y = Aᴴ x."""
    return a.matvech(x)
