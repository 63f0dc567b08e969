"""Format conversion with CSR as the hub.

Mirrors lis_matrix_convert (src/matrix/lis_matrix_ops.c:128-326): any-to-any
conversion routes through canonical CSR arrays on the host.  Conversions are
assembly-time operations (the reference also converts on host before the
solve), so host numpy/scipy is the right tool; the result's arrays land on
device as jnp leaves.
"""

from __future__ import annotations

from lis_tpu.matrix.base import SparseMatrix, get_format


def convert_matrix(matrix: SparseMatrix, target: str, **kw) -> SparseMatrix:
    """Convert ``matrix`` to the ``target`` format name (csr, ell, dia, ...)."""
    target = target.lower()
    if matrix.format_name == target and not kw:
        return matrix
    cls = get_format(target)
    ptr, index, value = matrix.to_csr_arrays()
    if target in ("bsr", "bsc"):
        kw.setdefault("bnr", getattr(matrix, "bnr", 2))
        kw.setdefault("bnc", getattr(matrix, "bnc", None))
    return cls.from_csr_arrays(ptr, index, value, matrix.shape, **kw)
