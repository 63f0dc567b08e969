"""Handle-based flat API backing the Fortran/C binding shim.

Reference: the Fortran 77/90 interface is a layer of C wrappers
(src/fortran/lisf_*.c, e.g. lisf_solver.c, lisf_init.F:1-51) converting
pass-by-reference arguments and integer handles onto the C API.  Here the
same role is played by this module (integer handles onto
``lis_tpu.compat`` objects) plus ``_native/lisf_tpu.c`` (a C shim with
Fortran calling conventions — trailing-underscore symbols, all arguments
by reference, hidden string lengths — that embeds the interpreter).

Indices are 0-based like the reference's Fortran interface.
"""

from __future__ import annotations

import numpy as np

from lis_tpu import compat as c

_handles: dict[int, object] = {}
_next_handle = [1]


def _put(obj) -> int:
    h = _next_handle[0]
    _next_handle[0] += 1
    _handles[h] = obj
    return h


def _get(h: int):
    return _handles[int(h)]


def _drop(h: int):
    _handles.pop(int(h), None)


# ---- lifecycle --------------------------------------------------------------

def initialize() -> int:
    import lis_tpu
    lis_tpu.initialize([])
    return 0


def finalize() -> int:
    import lis_tpu
    lis_tpu.finalize()
    _handles.clear()
    return 0


# ---- matrix -----------------------------------------------------------------

def matrix_create(comm: int) -> int:
    return _put(c.lis_matrix_create(comm))


def matrix_destroy(h: int) -> int:
    _drop(h)
    return 0


def matrix_set_size(h: int, local_n: int, global_n: int) -> int:
    return c.lis_matrix_set_size(_get(h), local_n, global_n)


def matrix_set_type(h: int, mtype: int) -> int:
    return c.lis_matrix_set_type(_get(h), mtype)


def matrix_set_value(flag: int, i: int, j: int, value: float, h: int) -> int:
    return c.lis_matrix_set_value(flag, i, j, value, _get(h))


def matrix_assemble(h: int) -> int:
    return c.lis_matrix_assemble(_get(h))


# ---- vector -----------------------------------------------------------------

def vector_create(comm: int) -> int:
    return _put(c.lis_vector_create(comm))


def vector_destroy(h: int) -> int:
    _drop(h)
    return 0


def vector_set_size(h: int, local_n: int, global_n: int) -> int:
    return c.lis_vector_set_size(_get(h), local_n, global_n)


def vector_set_all(alpha: float, h: int) -> int:
    return c.lis_vector_set_all(alpha, _get(h))


def vector_set_value(flag: int, i: int, value: float, h: int) -> int:
    return c.lis_vector_set_value(flag, i, value, _get(h))


def vector_get_value(h: int, i: int) -> float:
    return float(c.lis_vector_get_value(_get(h), i))


def vector_nrm2(h: int) -> float:
    return float(c.lis_vector_nrm2(_get(h)))


# ---- solver -----------------------------------------------------------------

def solver_create() -> int:
    return _put(c.lis_solver_create())


def solver_destroy(h: int) -> int:
    _drop(h)
    return 0


def solver_set_option(text: str, h: int) -> int:
    return c.lis_solver_set_option(text, _get(h))


def solve(ha: int, hb: int, hx: int, hs: int) -> int:
    return int(c.lis_solve(_get(ha), _get(hb), _get(hx), _get(hs)))


def solver_get_iter(h: int) -> int:
    return int(c.lis_solver_get_iter(_get(h)))


def solver_get_residualnorm(h: int) -> float:
    return float(c.lis_solver_get_residualnorm(_get(h)))


def solver_get_status(h: int) -> int:
    return int(c.lis_solver_get_status(_get(h)))


# ---- eigensolver ------------------------------------------------------------

def esolver_create() -> int:
    return _put(c.lis_esolver_create())


def esolver_destroy(h: int) -> int:
    _drop(h)
    return 0


def esolver_set_option(text: str, h: int) -> int:
    return c.lis_esolver_set_option(text, _get(h))


def esolve(ha: int, hx: int, he: int) -> float:
    """Runs the eigensolve and returns the principal eigenvalue."""
    status, evalue = c.lis_esolve(_get(ha), _get(hx), _get(he))
    return float(evalue)


def esolver_get_iter(h: int) -> int:
    return int(c.lis_esolver_get_iter(_get(h)))
