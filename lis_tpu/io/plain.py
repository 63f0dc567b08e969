"""PLAIN vector format — one value per line, length inferred.

Reference: LIS_FMT_PLAIN (include/lis.h:56), reader
lis_input_vector_plain (src/system/lis_input.c:402): scans scalars to
end-of-file, each rank keeping its [is, ie) slice.  Single-array version
here; distribution happens at solve time.
"""

from __future__ import annotations

import numpy as np


def read_vector_plain(path: str):
    vals = []
    with open(path) as f:
        for line in f:
            for tok in line.split():
                vals.append(float(tok))
    import jax.numpy as jnp
    return jnp.asarray(np.array(vals))


def write_vector_plain(path: str, vec):
    v = np.asarray(vec)
    with open(path, "w") as f:
        for x in v:
            f.write(f"{x:.16e}\n")
