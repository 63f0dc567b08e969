"""Distributed eigensolver execution (dist_esolve).

Reference: every eigensolver runs under MPI through the same encapsulated
L2/L3 (src/esolver/lis_esolver.c:263-285; inner Krylov solves per outer
iteration lis_esolver_ii.c:216) — SPMD-ness lives entirely in matvec and
the dot/norm allreduces.  Here the SAME compiled eigensolver loops used
single-chip (esolvers/power.py, esolvers/cgcr.py) run inside shard_map
over the mesh, with ``axis_name`` threaded into every reduction (psum) and
into the inner solver spec, so the inner Krylov solves are the standard
registry functions operating on sharded local views — the exact pattern
dist_solve uses for the linear solvers.

Supported: all 8 standard families — pi, ii, rqi, cg, cr compiled inside
shard_map, and the subspace families si/li/ai on the mesh through the
_GlobalView adapter (host-orchestrated loops over GSPMD-sharded global
arrays).  Generalized pencils (B is not None) run distributed through the
same nested distributed B-solve pattern: gpi/gii/grqi/gcg/gcr in
shard_map, gsi/gli/gai via _GlobalView.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lis_tpu import config as C
from lis_tpu.utils.trace import traced
from lis_tpu.parallel.mesh import AXIS
from lis_tpu.parallel.dist import _shard_map, distribute_vector
from lis_tpu.runtime.options import EsolverOptions

_SUPPORTED = ("pi", "ii", "rqi", "cg", "cr")
_SUBSPACE = ("si", "li", "ai")


@partial(jax.jit, static_argnums=(2,))
def _gv_matvec(A, x, mesh):
    f = _shard_map(lambda A_, x_: A_.matvec(x_), mesh,
                   (jax.tree.map(lambda _: P(AXIS), A), P(AXIS)), P(AXIS))
    return f(A, x)


@partial(jax.jit, static_argnums=(2,))
def _gv_matvech(A, x, mesh):
    f = _shard_map(lambda A_, x_: A_.matvech(x_), mesh,
                   (jax.tree.map(lambda _: P(AXIS), A), P(AXIS)), P(AXIS))
    return f(A, x)


@jax.tree_util.register_pytree_node_class
class _GlobalView:
    """Global-vector adapter over a block-row sharded matrix: matvec runs
    the shard_map kernel (ring halos etc.); every other operation the
    host-orchestrated eigensolvers perform (dots, norms, AXPYs, QR) runs
    as plain jnp on the GSPMD-sharded global arrays, where XLA inserts
    the collectives automatically.  This lets the subspace eigensolvers
    (SI/LI/AI — Python loops with host dense eigensolves, matching the
    reference's lis_esolver_{si,li,ai}.c structure) execute distributed
    UNCHANGED."""

    def __init__(self, A, mesh):
        self.A = A
        self.mesh = mesh

    def tree_flatten(self):
        return ((self.A,), (self.mesh,))

    @classmethod
    def tree_unflatten(cls, aux, c):
        return cls(c[0], aux[0])

    @property
    def nrows(self):
        return self.A.gn_pad

    @property
    def ncols(self):
        return self.A.gn_pad

    def matvec(self, x):
        return _gv_matvec(self.A, x, self.mesh)

    def matvech(self, x):
        return _gv_matvech(self.A, x, self.mesh)

    def get_diagonal(self):
        f = _shard_map(lambda A_: A_.get_diagonal(), self.mesh,
                       (jax.tree.map(lambda _: P(AXIS), self.A),), P(AXIS))
        return jax.jit(f)(self.A)

    def shift_diagonal(self, sigma):
        from lis_tpu.esolvers.power import _Shifted
        return _Shifted(self, jnp.asarray(sigma))


def _leaf_specs(tree):
    """P(AXIS) for array leaves, P() for scalars (e.g. a traced shift)."""
    return jax.tree.map(
        lambda a: P(AXIS) if getattr(a, "ndim", 1) >= 1 else P(), tree)


def _inner_name(opts):
    from lis_tpu.esolvers.power import _jit_inner_name
    return _jit_inner_name(opts)


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _dist_epi(A, x0, mesh, maxiter, tol, _n1, _n2):
    from lis_tpu.esolvers.power import _epi_run

    def body(A_loc, x_loc):
        return _epi_run(A_loc, x_loc, maxiter, tol, axis_name=AXIS)

    return _shard_map(body, mesh, (_leaf_specs(A), P(AXIS)),
                      (P(), P(AXIS), P(), P(), P()))(A, x0)


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def _dist_egpi(A, B, x0, mesh, maxiter, tol, inner_name, inner_key):
    """Generalized power iteration on the pencil (B⁻¹A): the inner
    B-solves nest inside the compiled loop with psum reductions
    (lis_esolver_pi.c generalized path under MPI)."""
    from lis_tpu.esolvers.power import _egpi_runner
    run = _egpi_runner(inner_name, *inner_key, axis_name=AXIS)

    def body(A_loc, B_loc, x_loc):
        return run(A_loc, B_loc, x_loc, maxiter, tol)

    return _shard_map(
        body, mesh, (_leaf_specs(A), _leaf_specs(B), P(AXIS)),
        (P(), P(AXIS), P(), P(), P()))(A, B, x0)


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def _dist_eii(A, x0, sigma, mesh, maxiter, tol, inner_name, inner_key):
    from lis_tpu.esolvers.power import _eii_runner, _Shifted
    run = _eii_runner(inner_name, *inner_key, axis_name=AXIS)
    As = _Shifted(A, sigma)

    def body(As_loc, A_loc, x_loc, sig_loc):
        return run(As_loc, A_loc, x_loc, sig_loc, maxiter, tol)

    return _shard_map(
        body, mesh,
        (_leaf_specs(As), _leaf_specs(A), P(AXIS), P()),
        (P(), P(AXIS), P(), P(), P()))(As, A, x0, sigma)


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _dist_erqi(A, x0, mesh, maxiter, tol, inner_name, inner_key):
    from lis_tpu.esolvers.power import _erqi_runner
    run = _erqi_runner(inner_name, *inner_key, axis_name=AXIS)

    def body(A_loc, x_loc):
        return run(A_loc, x_loc, maxiter, tol)

    return _shard_map(body, mesh, (_leaf_specs(A), P(AXIS)),
                      (P(), P(AXIS), P(), P(), P(), P()))(A, x0)


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def _dist_ecg(A, x0, sigma, mesh, maxiter, tol, inner_name, inner_key):
    from lis_tpu.esolvers.cgcr import _ecg_run
    from lis_tpu.esolvers.power import _Shifted
    from lis_tpu.solvers.base import SOLVER_FNS, SolverSpec
    from lis_tpu.precon.base import NonePrecon
    it, imi = inner_key
    inner = SolverSpec(solver="cg", tol=1e-10, maxiter=imi, conv_cond=0,
                       axis_name=AXIS)
    As = _Shifted(A, sigma)

    def body(As_loc, x_loc):
        from lis_tpu.core import vector as v
        x = x_loc / v.nrm2(x_loc, axis_name=AXIS)
        Ax = As_loc.matvec(x)
        # p = A^-1 x (setup solve, lis_esolver_cg.c:213) on the mesh
        p = SOLVER_FNS["cg"](As_loc, x, jnp.zeros_like(x), NonePrecon(),
                             inner).x
        p = jnp.where(jnp.isfinite(p), p, 0.0)
        return _ecg_run(As_loc, NonePrecon(), x, Ax, p, x, maxiter, tol,
                        axis_name=AXIS)

    return _shard_map(body, mesh, (_leaf_specs(As), P(AXIS)),
                      (P(), P(AXIS), P(), P(), P()))(As, x0)


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def _dist_ecr(A, x0, sigma, mesh, maxiter, tol, _n1, _n2):
    from lis_tpu.esolvers.cgcr import _ecr_run
    from lis_tpu.esolvers.power import _Shifted
    from lis_tpu.precon.base import NonePrecon
    As = _Shifted(A, sigma)

    def body(As_loc, x_loc):
        from lis_tpu.core import vector as v
        x = x_loc / v.nrm2(x_loc, axis_name=AXIS)
        return _ecr_run(As_loc, NonePrecon(), x, maxiter, tol,
                        axis_name=AXIS)

    return _shard_map(body, mesh, (_leaf_specs(As), P(AXIS)),
                      (P(), P(AXIS), P(), P(), P()))(As, x0)


@partial(jax.jit, static_argnums=(4, 5, 6, 7, 8))
def _dist_egii(A, B, x0, sigma, mesh, maxiter, tol, inner_name, inner_key):
    """Generalized inverse iteration: (A - σB) y = Bx nested inside the
    compiled loop (lis_esolver_ii.c generalized branch under MPI)."""
    from lis_tpu.esolvers.power import _egii_runner
    run = _egii_runner(inner_name, *inner_key, axis_name=AXIS)

    def body(A_loc, B_loc, x_loc, sig_loc):
        return run(A_loc, B_loc, x_loc, sig_loc, maxiter, tol)

    return _shard_map(
        body, mesh, (_leaf_specs(A), _leaf_specs(B), P(AXIS), P()),
        (P(), P(AXIS), P(), P(), P()))(A, B, x0, sigma)


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def _dist_egrqi(A, B, x0, mesh, maxiter, tol, inner_name, inner_key):
    """Generalized RQI on the pencil (moving shift σ = x·Ax / x·Bx)."""
    from lis_tpu.esolvers.power import _egrqi_runner
    run = _egrqi_runner(inner_name, *inner_key, axis_name=AXIS)

    def body(A_loc, B_loc, x_loc):
        return run(A_loc, B_loc, x_loc, maxiter, tol)

    return _shard_map(
        body, mesh, (_leaf_specs(A), _leaf_specs(B), P(AXIS)),
        (P(), P(AXIS), P(), P(), P(), P()))(A, B, x0)


@partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _dist_egcg(A, B, x0, sigma, mesh, maxiter, tol, inner_maxiter):
    """Generalized CG eigensolver: pencil Rayleigh-Ritz on span{w,x,p}
    (lis_egcg) with the setup solve p = A⁻¹x run distributed."""
    from lis_tpu.esolvers.cgcr import _egcg_run
    from lis_tpu.esolvers.power import _Shifted
    from lis_tpu.solvers.base import SOLVER_FNS, SolverSpec
    from lis_tpu.precon.base import NonePrecon
    inner = SolverSpec(solver="cg", tol=1e-10, maxiter=inner_maxiter,
                       conv_cond=0, axis_name=AXIS)
    As = _Shifted(A, sigma)

    def body(As_loc, B_loc, x_loc):
        from lis_tpu.core import vector as v
        x = x_loc / v.nrm2(x_loc, axis_name=AXIS)
        p = SOLVER_FNS["cg"](As_loc, x, jnp.zeros_like(x), NonePrecon(),
                             inner).x
        p = jnp.where(jnp.isfinite(p), p, 0.0)
        return _egcg_run(As_loc, B_loc, NonePrecon(), x, p, maxiter, tol,
                         axis_name=AXIS)

    return _shard_map(
        body, mesh, (_leaf_specs(As), _leaf_specs(B), P(AXIS)),
        (P(), P(AXIS), P(), P(), P()))(As, B, x0)


@partial(jax.jit, static_argnums=(4, 5, 6, 7, 8))
def _dist_egcr(A, B, x0, sigma, mesh, maxiter, tol, inner_name, inner_key):
    """Generalized CR eigensolver: the standard compiled CR loop on the
    pencil operator B⁻¹A (nested distributed inner B-solves per matvec,
    the single-device ecr generalized structure)."""
    from lis_tpu.esolvers.cgcr import _ecr_run
    from lis_tpu.esolvers.power import _GenOp, _Shifted
    from lis_tpu.precon.base import NonePrecon
    As = _Shifted(A, sigma)

    def body(As_loc, B_loc, x_loc):
        from lis_tpu.core import vector as v
        op = _GenOp(As_loc, B_loc, (inner_name,) + inner_key,
                    axis_name=AXIS)
        x = x_loc / v.nrm2(x_loc, axis_name=AXIS)
        return _ecr_run(op, NonePrecon(), x, maxiter, tol, axis_name=AXIS)

    return _shard_map(
        body, mesh, (_leaf_specs(As), _leaf_specs(B), P(AXIS)),
        (P(), P(AXIS), P(), P(), P()))(As, B, x0)


def _dist_gesolve(A, B, mesh, base, opts, x0):
    """Generalized pencil Ax = λBx on the mesh: gpi/gii/grqi as compiled
    pencil iterations with nested distributed B-solves, gcg/gcr through
    the compiled Rayleigh-Ritz / pencil-CR loops, and the subspace
    families (gsi/gli/gai) through the GlobalView adapter, whose pencil
    reduction calls the inner solve per matvec
    (src/esolver/lis_esolver.c:285 runs every G* family under MPI)."""
    from lis_tpu import config as C
    from lis_tpu.esolvers.driver import EsolveResult

    if base in _SUBSPACE:
        return _dist_subspace(A, mesh, base, opts, x0, B=B)
    if base not in _SUPPORTED:
        raise NotImplementedError(
            f"distributed generalized eigensolver g{base} (supported: "
            f"{', '.join('g' + s for s in _SUPPORTED + _SUBSPACE)})")
    dtype = jnp.result_type(*[
        l.dtype for l in jax.tree.leaves(A) if hasattr(l, "dtype")])
    if x0 is None or opts.initx_ones:
        x0 = np.ones(A.gn)
    x0d = distribute_vector(
        np.pad(np.asarray(x0, dtype=np.float64),
               (0, A.gn_pad - len(np.asarray(x0)))), mesh,
        A.gn_pad).astype(dtype)
    iname = _inner_name(opts)
    inner_key = (opts.inner.tol, opts.inner.maxiter)
    shift = 0.0
    if base == "pi":
        it, x, lam, resid, rh = _dist_egpi(A, B, x0d, mesh, opts.maxiter,
                                           opts.tol, iname, inner_key)
    elif base == "ii":
        sigma = jnp.asarray(float(opts.rval))
        it, x, lam, resid, rh = _dist_egii(A, B, x0d, sigma, mesh,
                                           opts.maxiter, opts.tol,
                                           iname, inner_key)
    elif base == "rqi":
        it, x, lam, resid, rh, _dead = _dist_egrqi(A, B, x0d, mesh,
                                                   opts.maxiter, opts.tol,
                                                   iname, inner_key)
    elif base == "cg":
        shift = opts.rval
        it, x, lam, resid, rh = _dist_egcg(A, B, x0d,
                                           jnp.asarray(opts.rval), mesh,
                                           opts.maxiter, opts.tol,
                                           opts.inner.maxiter)
    else:                                           # cr
        shift = opts.rval
        it, x, lam, resid, rh = _dist_egcr(A, B, x0d,
                                           jnp.asarray(opts.rval), mesh,
                                           opts.maxiter, opts.tol,
                                           iname, inner_key)
    x = x.block_until_ready()
    iters = int(it)
    resid = float(resid)
    status = C.LIS_SUCCESS if resid <= opts.tol else C.LIS_MAXITER
    lam = float(jnp.real(lam)) + shift
    xg = x[: A.gn] if A.gn_pad != A.gn else x
    rh = np.asarray(rh)[1:iters + 1]
    return EsolveResult(evalue=lam, evector=xg, iters=iters, resid=resid,
                        status=status, evalues=np.asarray([lam]),
                        evectors=np.asarray(xg)[None, :],
                        iters_all=np.asarray([iters]),
                        resids_all=np.asarray([resid]), rhistory=rh)


def _dist_subspace(A, mesh, base, opts, x0, B=None):
    """SI/LI/AI (and generalized gsi/gli/gai with a sharded B) on the
    mesh via _GlobalView: the standard host-loop implementations run
    unchanged on GSPMD-sharded global vectors, with the matvec going
    through the shard_map kernel and the pencil B-solves through the
    operator-only registry path."""
    import dataclasses as _dc
    from lis_tpu.esolvers.base import ESOLVER_FNS

    gv = _GlobalView(A, mesh)
    gvB = None if B is None else _GlobalView(B, mesh)
    dtype = jnp.result_type(*[
        l.dtype for l in jax.tree.leaves(A) if hasattr(l, "dtype")])
    if x0 is None or opts.initx_ones:
        x0 = np.ones(A.gn)
    x0d = distribute_vector(
        np.pad(np.asarray(x0, dtype=np.float64),
               (0, A.gn_pad - len(np.asarray(x0)))), mesh,
        A.gn_pad).astype(dtype)
    res = ESOLVER_FNS[base](gv, gvB, x0d, opts)
    if A.gn_pad != A.gn:
        res = _dc.replace(
            res, evector=jnp.asarray(np.asarray(res.evector)[: A.gn]),
            evectors=np.asarray(res.evectors)[:, : A.gn])
    return res


@traced
def dist_esolve(A, mesh: Mesh, options=None, x0=None, B=None, **overrides):
    """Distributed lis_esolve / lis_gesolve: Ax = λx (or Ax = λBx with a
    sharded B — pencil iteration with nested distributed inner B-solves,
    currently power-iteration based) on a sharded operator.

    Returns an EsolveResult whose evector is the sharded padded vector
    truncated to the global size — same contract as dist_solve.
    """
    from lis_tpu.esolvers.driver import EsolveResult

    if isinstance(options, EsolverOptions):
        opts = options
        for k, val in overrides.items():
            setattr(opts, k, val)
    else:
        opts = EsolverOptions.from_string(options, **overrides)

    name = opts.esolver
    base = name[1:] if name.startswith("g") and name != "gcg" else name
    if base == "gcg":
        base = "cg"
    if B is not None:
        return _dist_gesolve(A, B, mesh, base, opts, x0)
    if base in _SUBSPACE:
        return _dist_subspace(A, mesh, base, opts, x0)
    if base not in _SUPPORTED:
        raise NotImplementedError(
            f"distributed eigensolver {base!r} (supported: "
            f"{', '.join(_SUPPORTED + _SUBSPACE)})")

    dtype = jnp.result_type(*[
        l.dtype for l in jax.tree.leaves(A) if hasattr(l, "dtype")])
    if x0 is None or opts.initx_ones:
        x0 = np.ones(A.gn)
    x0 = np.asarray(x0)
    x0d = distribute_vector(
        np.pad(x0.astype(np.float64), (0, A.gn_pad - len(x0))), mesh,
        A.gn_pad).astype(dtype)

    inner_key = (opts.inner.tol, opts.inner.maxiter)
    iname = _inner_name(opts)

    t0 = C.wtime()
    dead = False
    if base == "pi":
        it, x, lam, resid, rh = _dist_epi(A, x0d, mesh, opts.maxiter,
                                          opts.tol, None, None)
    elif base == "ii":
        sigma = jnp.asarray(float(opts.rval))
        it, x, lam, resid, rh = _dist_eii(A, x0d, sigma, mesh, opts.maxiter,
                                          opts.tol, iname, inner_key)
    elif base == "rqi":
        it, x, lam, resid, rh, dead = _dist_erqi(A, x0d, mesh, opts.maxiter,
                                                 opts.tol, iname, inner_key)
        dead = bool(dead)
    elif base == "cg":
        it, x, lam, resid, rh = _dist_ecg(A, x0d, jnp.asarray(opts.rval),
                                          mesh, opts.maxiter, opts.tol,
                                          iname, inner_key)
    else:                                           # cr
        it, x, lam, resid, rh = _dist_ecr(A, x0d, jnp.asarray(opts.rval),
                                          mesh, opts.maxiter, opts.tol,
                                          None, None)

    x = x.block_until_ready()
    iters = int(it)
    resid = float(resid)
    if resid <= opts.tol:
        status = C.LIS_SUCCESS
    elif dead:
        status = C.LIS_BREAKDOWN
    else:
        status = C.LIS_MAXITER
    lam = float(jnp.real(lam)) + (opts.rval if base in ("cg", "cr") else 0.0)
    xg = x[: A.gn] if A.gn_pad != A.gn else x
    rh = np.asarray(rh)[1:iters + 1]
    return EsolveResult(evalue=lam, evector=xg, iters=iters, resid=resid,
                        status=status, evalues=np.asarray([lam]),
                        evectors=np.asarray(xg)[None, :],
                        iters_all=np.asarray([iters]),
                        resids_all=np.asarray([resid]), rhistory=rh)
