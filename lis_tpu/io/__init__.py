"""Unified file I/O with format auto-detection.

Reference: lis_input (src/system/lis_input.c:67) sniffs the first line —
"%%MatrixMarket" → MM, "#LIS" → Lis native, otherwise Harwell-Boeing /
PLAIN depending on the object; lis_output (src/system/lis_output.c:63)
dispatches on a LIS_FMT_* enum.  Format names here are strings:
"mm" | "hb" | "lis" | "plain" | "auto".
"""

from __future__ import annotations

from lis_tpu.io.mm import (read_matrix_market, read_vector_mm,
                           write_matrix_market, write_vector_mm)
from lis_tpu.io.hb import read_harwell_boeing, write_harwell_boeing
from lis_tpu.io.lisio import (read_lis_file, read_lis_vector,
                              write_lis_file, write_lis_vector)
from lis_tpu.io.plain import read_vector_plain, write_vector_plain


def _sniff(path: str) -> str:
    with open(path, "rb") as f:
        head = f.read(64)
    if head.startswith(b"%%MatrixMarket"):
        return "mm"
    if head.startswith(b"#LIS"):
        return "lis"
    return "unknown"


def lis_input(path: str, matrix_type: str = "csr", **kw):
    """Read a matrix (and optional b, x) from any supported format.

    Returns (matrix, b_or_None, x_or_None) — mirroring
    lis_input(A, b, x, filename) (src/system/lis_input.c:67).
    """
    fmt = _sniff(path)
    if fmt == "mm":
        return read_matrix_market(path, matrix_type, return_vectors=True,
                                  **kw)
    if fmt == "lis":
        return read_lis_file(path, matrix_type, **kw)
    # Harwell-Boeing has no magic banner; it is the remaining matrix format
    return read_harwell_boeing(path, matrix_type, **kw), None, None


def lis_input_vector(path: str):
    """Read a vector: MM array, Lis native (ascii or B/L binary), or PLAIN
    (lis_input.c:176-248; vec-banner dispatch lis_input_vector_lis:470)."""
    fmt = _sniff(path)
    if fmt == "mm":
        return read_vector_mm(path)
    if fmt == "lis":
        with open(path, "rb") as f:
            head = f.read(10)
        if head[7:10] == b"vec":
            return read_lis_vector(path)
        _, b, _ = read_lis_file(path)
        return b
    return read_vector_plain(path)


def lis_output(path: str, matrix, b=None, x=None, fmt: str = "mm"):
    """Write a matrix in the requested format (lis_output, lis_output.c:63).

    Formats: "mm" (ASCII MatrixMarket + Lis b/x extension), "mmb" (binary
    MatrixMarket, LIS_FMT_MMB — packed records, endianness recorded on the
    size line), "lis" (Lis ASCII), "hb" (Harwell-Boeing RUA).
    """
    if fmt == "mm":
        write_matrix_market(path, matrix, b=b, x=x)
    elif fmt == "mmb":
        write_matrix_market(path, matrix, binary=True, b=b, x=x)
    elif fmt == "lis":
        write_lis_file(path, matrix, b, x)
    elif fmt == "hb":
        write_harwell_boeing(path, matrix)
    else:
        raise ValueError(f"unsupported output format {fmt!r}")


def lis_output_vector(path: str, vec, fmt: str = "mm", nprocs: int = 1):
    """Formats: "mm", "plain", "lis" (reference ascii #LIS A vec),
    "lisb"/"lisl" (big/little-endian binary vec flavors)."""
    if fmt == "mm":
        write_vector_mm(path, vec)
    elif fmt == "plain":
        write_vector_plain(path, vec)
    elif fmt == "lis":
        write_lis_vector(path, vec, mode="A", nprocs=nprocs)
    elif fmt == "lisb":
        write_lis_vector(path, vec, mode="B", nprocs=nprocs)
    elif fmt == "lisl":
        write_lis_vector(path, vec, mode="L", nprocs=nprocs)
    else:
        raise ValueError(f"unsupported vector output format {fmt!r}")
