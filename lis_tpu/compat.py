"""Classic Lis-style imperative API (lis.h compatibility shim).

Mirrors the reference's C calling convention (include/lis.h: vector ops
:824-859, matrix ops :865-914, solvers :961-984, eigensolvers :990-1013)
so code written against Lis ports line by line:

    import lis_tpu.compat as lis
    lis.lis_initialize([])
    A = lis.lis_matrix_create(0)
    lis.lis_matrix_set_size(A, 0, n)
    for i, j, v in entries:
        lis.lis_matrix_set_value(lis.LIS_INS_VALUE, i, j, v, A)
    lis.lis_matrix_set_type(A, lis.LIS_MATRIX_CSR)
    lis.lis_matrix_assemble(A)
    b, x = lis.lis_vector_create(0), lis.lis_vector_create(0)
    lis.lis_vector_set_size(b, 0, n); lis.lis_vector_set_all(1.0, b)
    lis.lis_vector_set_size(x, 0, n)
    solver = lis.lis_solver_create()
    lis.lis_solver_set_option("-i cg -p jacobi -tol 1e-12", solver)
    lis.lis_solve(A, b, x, solver)
    iters = lis.lis_solver_get_iter(solver)

Handles are thin mutable wrappers over the functional core; "destroy"
calls are no-ops kept for source compatibility (memory is managed).
"""

from __future__ import annotations

import numpy as np

from lis_tpu.config import (LIS_SUCCESS, LIS_FAILS, LIS_ILL_OPTION,
                            LIS_BREAKDOWN, LIS_OUT_OF_MEMORY, LIS_MAXITER,
                            LIS_ERR_NOT_IMPLEMENTED, LIS_ERR_FILE_IO,
                            LIS_ERR_ILL_ARG)
from lis_tpu.config import initialize as lis_initialize          # noqa: F401
from lis_tpu.config import finalize as lis_finalize              # noqa: F401
from lis_tpu.config import wtime as lis_wtime                    # noqa: F401
from lis_tpu.matrix.assembly import LIS_INS_VALUE, LIS_ADD_VALUE  # noqa: F401
from lis_tpu.runtime.options import STORAGE_NAMES

# storage-type constants (include/lis.h:252-284)
LIS_MATRIX_CSR = 1
LIS_MATRIX_CSC = 2
LIS_MATRIX_MSR = 3
LIS_MATRIX_DIA = 4
LIS_MATRIX_ELL = 5
LIS_MATRIX_JAD = 6
LIS_MATRIX_BSR = 7
LIS_MATRIX_BSC = 8
LIS_MATRIX_VBR = 9
LIS_MATRIX_COO = 10
LIS_MATRIX_DNS = 11
_TYPE_NAMES = {i: n for n, i in STORAGE_NAMES.items()}


class _MatrixHandle:
    def __init__(self, comm=0):
        self.comm = comm
        self.n = None
        self.matrix_type = LIS_MATRIX_CSR
        self._asm = None
        self._csr = None           # (ptr, index, value) direct-set path
        self.m = None              # assembled format object


class _VectorHandle:
    def __init__(self, comm=0):
        self.comm = comm
        self.n = None
        self.value = None


class _SolverHandle:
    def __init__(self):
        self.options = ""
        self.result = None


class _EsolverHandle:
    def __init__(self):
        self.options = ""
        self.result = None


# ---- matrix (lis.h:865-914) -------------------------------------------------

def lis_matrix_create(comm=0):
    """Allocate a matrix handle (man lis_matrix_create.3)."""
    return _MatrixHandle(comm)


def lis_matrix_destroy(A):
    """Release a matrix handle (man lis_matrix_destroy.3)."""
    return LIS_SUCCESS


def lis_matrix_set_size(A, local_n, global_n):
    """Set local/global dimension and open assembly (man lis_matrix_set_size.3)."""
    A.n = int(global_n or local_n)
    from lis_tpu.matrix.assembly import MatrixAssembler
    A._asm = MatrixAssembler((A.n, A.n))
    return LIS_SUCCESS


def lis_matrix_get_size(A):
    """(local_n, global_n) of the matrix (man lis_matrix_get_size.3)."""
    return A.n, A.n


def lis_matrix_set_type(A, matrix_type):
    """Declare the storage type used at assemble time (man lis_matrix_set_type.3)."""
    A.matrix_type = int(matrix_type)
    return LIS_SUCCESS


def lis_matrix_get_type(A):
    """Declared storage type id (man lis_matrix_get_type.3)."""
    return A.matrix_type


def lis_matrix_set_value(flag, i, j, value, A):
    """Insert (LIS_INS_VALUE) or accumulate (LIS_ADD_VALUE) A[i,j] (man lis_matrix_set_value.3)."""
    A._asm.set_value(flag, int(i), int(j), value)
    return LIS_SUCCESS


def lis_matrix_set_csr(nnz, ptr, index, value, A):
    """Adopt caller-owned CSR arrays as the matrix storage (man lis_matrix_set_csr.3)."""
    A._csr = (np.asarray(ptr), np.asarray(index), np.asarray(value))
    return LIS_SUCCESS


def lis_matrix_assemble(A):
    """Finalize assembly: build the storage object in the requested type (man lis_matrix_assemble.3)."""
    from lis_tpu.matrix.csr import CSRMatrix
    from lis_tpu.matrix.convert import convert_matrix
    if A._csr is not None:
        ptr, index, value = A._csr
        m = CSRMatrix.from_csr_arrays(ptr, index, value, (A.n, A.n))
    else:
        m = A._asm.assemble("csr")
    name = _TYPE_NAMES.get(A.matrix_type, "csr")
    A.m = convert_matrix(m, name) if name != "csr" else m
    return LIS_SUCCESS


def lis_matrix_convert(Ain, Aout):
    """Convert Ain's storage into Aout's declared type (man lis_matrix_convert.3)."""
    from lis_tpu.matrix.convert import convert_matrix
    Aout.n = Ain.n
    Aout.m = convert_matrix(Ain.m, _TYPE_NAMES.get(Aout.matrix_type, "csr"))
    return LIS_SUCCESS


def lis_matrix_get_diagonal(A, d):
    """Copy diag(A) into vector d (man lis_matrix_get_diagonal.3)."""
    d.value = A.m.get_diagonal()
    d.n = A.n
    return LIS_SUCCESS


# ---- vector (lis.h:824-859) -------------------------------------------------

def lis_vector_create(comm=0):
    """Allocate a vector handle (man lis_vector_create.3)."""
    return _VectorHandle(comm)


def lis_vector_destroy(v):
    """Release a vector handle (man lis_vector_destroy.3)."""
    return LIS_SUCCESS


def lis_vector_set_size(v, local_n, global_n=0):
    """Set the vector dimension and allocate zeros (man lis_vector_set_size.3)."""
    import jax.numpy as jnp
    v.n = int(global_n or local_n)
    v.value = jnp.zeros(v.n)
    return LIS_SUCCESS


def lis_vector_duplicate(vin, _cls=None):
    """New zero vector with vin's size/layout (man lis_vector_duplicate.3)."""
    import jax.numpy as jnp
    v = _VectorHandle(vin.comm)
    v.n = vin.n
    v.value = jnp.zeros_like(vin.value)
    return v


def lis_vector_set_all(alpha, v):
    """Fill v with alpha (man lis_vector_set_all.3)."""
    import jax.numpy as jnp
    v.value = jnp.full(v.n, alpha, dtype=v.value.dtype
                       if v.value is not None else None)
    return LIS_SUCCESS


def lis_vector_set_value(flag, i, value, v):
    """Insert or accumulate v[i] (man lis_vector_set_value.3)."""
    old = v.value[i] if flag == LIS_ADD_VALUE else 0.0
    v.value = v.value.at[int(i)].set(value + old)
    return LIS_SUCCESS


def lis_vector_get_value(v, i):
    """Read v[i] (man lis_vector_get_value.3)."""
    return float(v.value[int(i)])


def lis_vector_get_values(v, start, count):
    """Read count entries starting at start (man lis_vector_get_values.3)."""
    return np.asarray(v.value[int(start):int(start) + int(count)])


def lis_vector_nrm2(v):
    """2-norm of v (man lis_vector_nrm2.3)."""
    return float(np.linalg.norm(np.asarray(v.value)))


def lis_vector_dot(u, v):
    """Hermitian inner product <u, v> (man lis_vector_dot.3)."""
    return float(np.dot(np.asarray(u.value), np.asarray(v.value)))


def lis_vector_axpy(alpha, x, y):
    """y := alpha x + y (man lis_vector_axpy.3)."""
    y.value = y.value + alpha * x.value
    return LIS_SUCCESS


def lis_vector_scale(alpha, x):
    """x := alpha x (man lis_vector_scale.3)."""
    x.value = alpha * x.value
    return LIS_SUCCESS


def lis_vector_copy(src, dst):
    """dst := src (man lis_vector_copy.3)."""
    dst.value = src.value
    dst.n = src.n
    return LIS_SUCCESS


# ---- matvec (lis.h:920-921) -------------------------------------------------

def lis_matvec(A, x, y):
    """y := A x (man lis_matvec.3)."""
    y.value = A.m.matvec(x.value)
    y.n = A.n
    return LIS_SUCCESS


def lis_matvech(A, x, y):
    """y := A^H x — transpose (conjugate) product (man lis_matvech.3)."""
    y.value = A.m.matvech(x.value)
    y.n = A.n
    return LIS_SUCCESS


# ---- solver (lis.h:961-984) -------------------------------------------------

def lis_solver_create():
    """Allocate a solver workspace handle (man lis_solver_create.3)."""
    return _SolverHandle()


def lis_solver_destroy(s):
    """Release a solver handle (man lis_solver_destroy.3)."""
    return LIS_SUCCESS


def lis_solver_set_option(text, solver):
    """Append option text (e.g. \"-i gmres -p ilu\") to the solver (man lis_solver_set_option.3)."""
    solver.options = (solver.options + " " + text).strip()
    return LIS_SUCCESS


def lis_solver_set_optionC(solver):
    """Append the command-line options captured at initialize (man lis_solver_set_optionc.3)."""
    from lis_tpu import config as C
    solver.options = (solver.options + " "
                      + " ".join(C.get_cmd_args())).strip()
    return LIS_SUCCESS


def lis_solve(A, b, x, solver):
    """Solve Ax = b with the solver's options; x holds the solution (man lis_solve.3)."""
    from lis_tpu.solvers.driver import solve
    res = solve(A.m, b.value, x0=x.value, options=solver.options or None)
    solver.result = res
    x.value = res.x
    x.n = A.n
    return res.status


def lis_solver_get_iter(solver):
    """Iteration count of the last solve (man lis_solver_get_iter.3)."""
    return solver.result.iters


def lis_solver_get_iterex(solver):
    """Iteration counts (total, double, quad) of the last solve (man lis_solver_get_iterex.3)."""
    r = solver.result
    return r.iters, r.iters, 0


def lis_solver_get_time(solver):
    """Wall-clock time of the last solve (man lis_solver_get_time.3)."""
    return solver.result.time


def lis_solver_get_timeex(solver):
    """Phase timers (total, itime, ptime, ...) of the last solve (man lis_solver_get_timeex.3)."""
    r = solver.result
    return r.time, r.itime, r.ptime, 0.0, 0.0


def lis_solver_get_residualnorm(solver):
    """Relative residual norm reached by the last solve (man lis_solver_get_residualnorm.3)."""
    return solver.result.resid


def lis_solver_get_rhistory(solver, v=None):
    """Per-iteration residual history of the last solve (man lis_solver_get_rhistory.3)."""
    rh = solver.result.rhistory
    if v is not None:
        import jax.numpy as jnp
        v.value = jnp.asarray(rh)
        v.n = len(rh)
        return LIS_SUCCESS
    return rh


def lis_solver_get_status(solver):
    """Status code of the last solve (man lis_solver_get_status.3)."""
    return solver.result.status


def lis_solver_get_solver(solver):
    """Numeric id of the solver that ran (man lis_solver_get_solver.3)."""
    return solver.result.options.solver_id


def lis_solver_get_solvername(nsol):
    """Solver name for a numeric id (man lis_solver_get_solvername.3)."""
    from lis_tpu.runtime.options import SOLVER_NAMES
    return SOLVER_NAMES[int(nsol) - 1]


# ---- PSD: Preconditioner and Solver Decoupled (test8f.F90 workflow) ---------
#
# The reference decouples precon construction from the solve so a factored
# preconditioner can be reused/refreshed across repeated solves on a matrix
# whose VALUES change but whose structure does not (lis_precon_psd_create /
# lis_precon_psd_update, src/precon/lis_precon.c; lis_solve_kernel,
# src/solver/lis_solver.c:440).  The reference implements the psd hooks only
# for ILU(k) and SA-AMG; here every registered preconditioner rebuilds
# cleanly, because construction was functional to begin with.

class _PreconHandle:
    def __init__(self):
        self.M = None
        self.precon_type = "none"


def lis_solver_set_matrix(A, solver):
    """Bind A to the solver for PSD precon construction
    (lisf_solver.c: lis_solver_set_matrix_f)."""
    solver.A = A
    return LIS_SUCCESS


def _psd_build(solver, precon):
    from lis_tpu.runtime.options import SolverOptions
    from lis_tpu.precon.base import PRECON_REGISTRY, NonePrecon, create_precon
    from lis_tpu.solvers import driver as _drv  # registers precon modules
    del _drv
    opts = SolverOptions.from_string(solver.options or None)
    A = getattr(solver, "A", None)
    if A is None or A.m is None:
        return LIS_ERR_ILL_ARG
    precon.precon_type = opts.precon
    if opts.precon == "none":
        precon.M = NonePrecon()
    else:
        if opts.precon not in PRECON_REGISTRY:
            return LIS_ERR_NOT_IMPLEMENTED
        precon.M = create_precon(opts.precon, A.m, opts)
        if opts.adds:
            from lis_tpu.precon.ads import wrap_additive_schwarz
            precon.M = wrap_additive_schwarz(A.m, precon.M, opts)
    return LIS_SUCCESS


def lis_precon_psd_create(solver, precon=None):
    """Create the preconditioner from the solver's bound matrix + options,
    without solving (lis_precon_psd_create, lis_precon.c)."""
    precon = precon if precon is not None else _PreconHandle()
    err = _psd_build(solver, precon)
    if err:
        raise RuntimeError(f"lis_precon_psd_create failed (status {err})")
    return precon


def lis_precon_psd_update(solver, precon):
    """Re-factor the preconditioner after lis_matrix_psd_set_value updates
    (lis_precon_psd_update, lis_precon.c)."""
    return _psd_build(solver, precon)


def lis_precon_destroy(precon):
    """Release a PSD preconditioner handle (man lis_precon_destroy.3)."""
    precon.M = None
    return LIS_SUCCESS


def lis_solve_kernel(A, b, x, solver, precon):
    """lis_solve with an externally supplied preconditioner
    (lis_solve_kernel, src/solver/lis_solver.c:440)."""
    from lis_tpu.solvers.driver import solve
    res = solve(A.m, b.value, x0=x.value, options=solver.options or None,
                M=precon.M)
    solver.result = res
    x.value = res.x
    x.n = A.n
    return res.status


def lis_matrix_psd_set_value(flag, i, j, value, A):
    """Update a value inside the ASSEMBLED structure — the structure must
    already contain (i, j) (lis_matrix_psd_set_value_csr,
    src/matrix/lis_matrix_csr.c; CSR only in the reference too)."""
    import dataclasses
    from lis_tpu.matrix.csr import CSRMatrix
    if not isinstance(A.m, CSRMatrix):
        return LIS_ERR_NOT_IMPLEMENTED
    ptr, index, val = A.m.to_csr_arrays()
    lo, hi = int(ptr[i]), int(ptr[i + 1])
    rel = np.nonzero(index[lo:hi] == j)[0]   # columns need not be sorted
    if rel.size == 0:
        return LIS_ERR_ILL_ARG
    pos = lo + int(rel[0])
    newv = value if flag == LIS_INS_VALUE else val[pos] + value
    A.m = dataclasses.replace(A.m, value=A.m.value.at[pos].set(newv))
    return LIS_SUCCESS


def lis_matrix_psd_reset_scale(A):
    """Clear the is_scaled flag (lis_matrix_psd_reset_scale,
    src/matrix/lis_matrix_ops.c).  solve() here scales functionally — the
    caller's matrix is never mutated — so this only resets bookkeeping."""
    A.is_scaled = False
    return LIS_SUCCESS


def lis_vector_psd_reset_scale(v):
    """Vector analogue of lis_matrix_psd_reset_scale
    (src/vector/lis_vector.c)."""
    v.is_scaled = False
    return LIS_SUCCESS


# ---- eigensolver (lis.h:990-1013) --------------------------------------------

def lis_esolver_create():
    """Allocate an eigensolver workspace handle (man lis_esolver_create.3)."""
    return _EsolverHandle()


def lis_esolver_destroy(e):
    """Release an eigensolver handle (man lis_esolver_destroy.3)."""
    return LIS_SUCCESS


def lis_esolver_set_option(text, esolver):
    """Append option text (e.g. \"-e cg -emaxiter 1000\") to the esolver (man lis_esolver_set_option.3)."""
    esolver.options = (esolver.options + " " + text).strip()
    return LIS_SUCCESS


def lis_esolve(A, x, esolver):
    """Compute the dominant eigenpair of A into x; returns (status, evalue) (man lis_esolve.3)."""
    import time as _time
    from lis_tpu.esolvers.driver import esolve
    t0 = _time.perf_counter()
    res = esolve(A.m, options=esolver.options or None,
                 x0=None if x.value is None else x.value)
    esolver.time = _time.perf_counter() - t0
    esolver.result = res
    x.value = res.evector
    x.n = A.n
    return res.status, res.evalue


def lis_gesolve(A, B, x, esolver):
    """Generalized eigenproblem Ax = lambda Bx; returns (status, evalue) (man lis_gesolve.3)."""
    from lis_tpu.esolvers.driver import gesolve
    res = gesolve(A.m, B.m, options=esolver.options or None,
                  x0=None if x.value is None else x.value)
    esolver.result = res
    x.value = res.evector
    x.n = A.n
    return res.status, res.evalue


def lis_esolver_get_iter(esolver):
    """Iteration count of the last esolve (man lis_esolver_get_iter.3)."""
    return esolver.result.iters


def lis_esolver_get_residualnorm(esolver):
    """Relative residual of the converged eigenpair (man lis_esolver_get_residualnorm.3)."""
    return esolver.result.resid


def lis_esolver_get_evalues(esolver, v=None):
    """All Ritz values from the last esolve (man lis_esolver_get_evalues.3)."""
    ev = esolver.result.evalues
    if ev is None:
        ev = np.asarray([esolver.result.evalue])
    if v is not None:
        import jax.numpy as jnp
        v.value = jnp.asarray(ev)
        v.n = len(ev)
        return LIS_SUCCESS
    return ev


def lis_esolver_get_status(esolver):
    """Status code of the last esolve (man lis_esolver_get_status.3)."""
    return esolver.result.status


# ---- I/O (lis.h:1019-1026) --------------------------------------------------

def lis_input(A, b, x, filename):
    """Read matrix (+ optional b, x) from file, auto-detecting the format (man lis_input.3)."""
    from lis_tpu.io import lis_input as _inp
    m, bv, xv = _inp(filename)
    A.m = m
    A.n = m.nrows
    if b is not None and bv is not None:
        b.value = bv
        b.n = m.nrows
    if x is not None and xv is not None:
        x.value = xv
        x.n = m.nrows
    return LIS_SUCCESS


def lis_output(A, b, x, fmt, filename):
    """Write matrix (+ optional b, x) in the requested format (man lis_output.3)."""
    from lis_tpu.io import lis_output as _out
    _out(filename, A.m,
         b=None if b is None else np.asarray(b.value),
         x=None if x is None else np.asarray(x.value),
         fmt="lis" if fmt in (3, "lis") else "mm")
    return LIS_SUCCESS


def lis_input_matrix(A, filename):
    """Read only the matrix from a file (lis.h:1021 lis_input_matrix)."""
    return lis_input(A, None, None, filename)


def lis_input_vector(v, filename):
    """Read a vector from file into the handle (man lis_input_vector.3)."""
    from lis_tpu.io import lis_input_vector as _inpv
    v.value = _inpv(filename)
    v.n = int(v.value.shape[0])
    return LIS_SUCCESS


def lis_output_vector(v, fmt, filename):
    """Write a vector in the requested format (man lis_output_vector.3)."""
    from lis_tpu.io import lis_output_vector as _outv
    _outv(filename, np.asarray(v.value),
          fmt="plain" if fmt in (0, "plain") else "mm")
    return LIS_SUCCESS


def lis_output_matrix(A, fmt, filename):
    """Write the matrix alone in the requested format (man lis_output_matrix.3)."""
    return lis_output(A, None, None, fmt, filename)


def lis_solver_output_rhistory(solver, filename):
    """Write the residual history one value per line
    (src/solver/lis_solver.c lis_solver_output_rhistory)."""
    rh = np.asarray(solver.result.rhistory)
    with open(filename, "w") as f:
        for r in rh:
            f.write(f"{float(r):e}\n")
    return LIS_SUCCESS


def lis_esolver_output_rhistory(esolver, filename):
    """Write the esolve residual history to a file (man lis_esolver_output_rhistory.3)."""
    rh = esolver.result.rhistory
    rh = np.asarray([] if rh is None else rh)
    with open(filename, "w") as f:
        for r in rh:
            f.write(f"{float(r):e}\n")
    return LIS_SUCCESS


# ---- matrix extras (lis.h:865-914) -------------------------------------------

def lis_matrix_get_range(A):
    """1-based [is, ie) row range, single-comm semantics
    (src/matrix/lis_matrix.c lis_matrix_get_range; the Fortran interface
    shifts to 1-based — test/test2f.F90 loops ii = is-1 .. ie-2)."""
    return 1, A.n + 1


def lis_matrix_get_nnz(A):
    """Number of stored nonzeros (man lis_matrix_get_nnz.3)."""
    return int(A.m.nnz)


def lis_matrix_duplicate(Ain):
    """New matrix with the same size/comm, no values
    (lis_matrix_duplicate: structure only)."""
    out = _MatrixHandle(Ain.comm)
    out.n = Ain.n
    out.matrix_type = Ain.matrix_type
    return out


# ---- vector extras ------------------------------------------------------------

LIS_TRUE = 1
LIS_FALSE = 0


def lis_vector_is_null(v):
    """1 if the handle has no storage yet, else 0 (man lis_vector_is_null.3)."""
    return LIS_TRUE if v.value is None or v.n is None else LIS_FALSE


def lis_vector_print(v):
    """Print vector entries like lis_vector_print (one per line)."""
    for val in np.asarray(v.value):
        print(f"{complex(val):.6f}" if np.iscomplexobj(v.value)
              else f"{float(val):.6f}")
    return LIS_SUCCESS


def lis_vector_conjugate(v):
    """v := conj(v) in place (man lis_vector_conjugate.3)."""
    import jax.numpy as jnp
    v.value = jnp.conjugate(v.value)
    return LIS_SUCCESS


# ---- esolver extras (lis.h:990-1013) -------------------------------------------

def lis_esolver_set_optionC(esolver):
    """Append the command-line options captured at initialize (man lis_esolver_set_optionc.3)."""
    from lis_tpu import config as C
    esolver.options = (esolver.options + " "
                       + " ".join(C.get_cmd_args())).strip()
    return LIS_SUCCESS


def lis_esolver_get_iterex(esolver):
    """Iteration counts (total, double, quad) of the last esolve (man lis_esolver_get_iterex.3)."""
    r = esolver.result
    return r.iters, r.iters, 0


def lis_esolver_get_timeex(esolver):
    """Phase timers (total, precon, iteration) of the last esolve (man lis_esolver_get_timeex.3)."""
    t = getattr(esolver, "time", 0.0)
    return t, t, 0.0, 0.0, 0.0


def lis_esolver_get_esolver(esolver):
    """Numeric id of the eigensolver that ran (man lis_esolver_get_esolver.3)."""
    from lis_tpu.runtime.options import EsolverOptions
    return EsolverOptions.from_string(esolver.options or None).esolver_id


def lis_esolver_get_esolvername(nsol):
    """Eigensolver name for a numeric id (man lis_esolver_get_esolvername.3)."""
    from lis_tpu.runtime.options import ESOLVER_NAMES
    return ESOLVER_NAMES[int(nsol) - 1]


# ---- dense array ops (lis.h array section; src/array/lis_array.c) --------------

def lis_array_set_all(n, alpha, a):
    """Fill the first n entries of a raw array with alpha (man lis_array_set_all.3)."""
    a[:int(n)] = alpha
    return LIS_SUCCESS


def lis_array_matvec(n, a, x, y, flag):
    """y {=, +=, -=} A x for an n×n column-major dense array
    (lis_array_matvec; Fortran storage order)."""
    n = int(n)
    prod = np.asarray(a[:n * n]).reshape(n, n, order="F") @ np.asarray(x[:n])
    if flag == LIS_INS_VALUE:
        y[:n] = prod
    elif flag == LIS_ADD_VALUE:
        y[:n] += prod
    else:
        y[:n] -= prod
    return LIS_SUCCESS


def lis_array_solve(n, a, b, x, w):
    """Direct dense solve via the core array layer (lis_array_solve;
    w is the reference's workspace — kept for signature parity)."""
    from lis_tpu.core import array as _arr
    n = int(n)
    x[:n] = np.asarray(_arr.solve(
        np.asarray(a[:n * n]).reshape(n, n, order="F"), np.asarray(b[:n])))
    return LIS_SUCCESS


def lis_array_xpay(n, x, alpha, y):
    """y = x + alpha*y (lis_array_xpay)."""
    n = int(n)
    y[:n] = np.asarray(x[:n]) + alpha * np.asarray(y[:n])
    return LIS_SUCCESS


def lis_array_nrm2(n, x):
    """2-norm of the first n entries of a raw array (man lis_array_nrm2.3)."""
    return float(np.linalg.norm(np.asarray(x[:int(n)])))
