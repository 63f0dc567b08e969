"""PLAIN vector format — one value per line, length inferred.

Reference: LIS_FMT_PLAIN (include/lis.h:56), reader
lis_input_vector_plain (src/system/lis_input.c:402): scans scalars to
end-of-file, each rank keeping its [is, ie) slice.  Single-array version
here; distribution happens at solve time.
"""

from __future__ import annotations

import numpy as np


def read_vector_plain(path: str):
    """Read a PLAIN vector file: one value per line (lis_input.c:176-248)."""
    vals = []
    with open(path) as f:
        for line in f:
            for tok in line.split():
                vals.append(float(tok))
    import jax.numpy as jnp
    return jnp.asarray(np.array(vals))


def write_vector_plain(path: str, vec):
    """Write a PLAIN vector file: "%28.20e" one value per line
    (lis_output_vector_plain, lis_output.c:180)."""
    v = np.asarray(vec)
    with open(path, "w") as f:
        for x in v:
            f.write(f"{x:.16e}\n")
