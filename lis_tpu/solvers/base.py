"""Shared solver machinery.

Reproduces the semantics of the reference solver driver's inner pieces:
initial residual + convergence normalisation (lis_solver_get_initial_residual,
src/solver/lis_solver.c:957-1091), the per-iteration residual getters
(lis_solver_get_residual[], :157-161 — nrm2_r / nrm2_b / nrm1_b), residual
history recording, and breakdown status codes.

Every solver is a pure jit-traceable function
``fn(A, b, x0, M, spec) -> SolverOutput`` iterating with lax.while_loop:
no data-dependent Python control flow, static maxiter-sized rhistory buffer,
early convergence expressed in the loop condition.  ``A`` is a format pytree,
``M`` a preconditioner pytree, ``spec`` a hashable static config.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from lis_tpu import config as C
from lis_tpu.core import vector as v

RUNNING = -99  # internal status while the while_loop is live


class SolverSpec(NamedTuple):
    """Static (hashable) solver configuration — jit cache key."""
    solver: str = "bicg"
    tol: float = 1.0e-12
    tol_w: float = 1.0
    maxiter: int = 1000
    conv_cond: int = 0
    restart: int = 40
    ell: int = 2
    m: int = 3
    omega: float = 1.9
    irestart: int = 2
    record: bool = True
    axis_name: Any = None     # mesh axis for distributed reductions
    # static history capacity when tol/maxiter are passed as DYNAMIC
    # operands (driver compile-cache path): 0 = use maxiter (static)
    rh_cap: int = 0
    # -print out/all: emit each iteration's residual from inside the
    # compiled loop (reference lis_solver_cg.c:217-221 prints live)
    live_print: bool = False


class SolverOutput(NamedTuple):
    x: jax.Array
    status: jax.Array         # LIS_SUCCESS / LIS_MAXITER / LIS_BREAKDOWN
    iters: jax.Array
    resid: jax.Array          # final relative residual
    rhistory: jax.Array       # (maxiter+2,), nan where unwritten


SOLVER_FNS: dict[str, Any] = {}
SOLVER_PREPARE: dict[str, Any] = {}


def register_solver(name: str):
    def deco(fn):
        SOLVER_FNS[name] = fn
        return fn
    return deco


def register_prepare(name: str):
    """Host-side setup hook ``prepare(A, spec) -> aux pytree`` run by the
    driver BEFORE jit (the analogue of the reference's malloc_work /
    lis_matrix_split setup phase): level-scheduled trisolve plans, random
    shadow spaces, etc.  The result is passed to the solver as ``aux``."""
    def deco(fn):
        SOLVER_PREPARE[name] = fn
        return fn
    return deco


def residual_norm(r, bnrm_inv, spec: SolverSpec):
    """Per-iteration convergence measure (lis_solver_get_residual[conv]).

    nrm2_r / nrm2_b return the normalised ||r||₂·bnrm (lis_solver.c:1791);
    nrm1_b returns the raw ||r||₁ (:1804), compared against the adjusted
    tolerance ||b||₁·tol_w + tol set at init.
    """
    if spec.conv_cond == 2:     # nrm1_b — unnormalised, adjusted tol
        return v.nrm1(r, spec.axis_name)
    return v.nrm2(r, spec.axis_name) * bnrm_inv


def init_residual(A, b, x0, spec: SolverSpec):
    """Initial residual + normalisation (lis_solver_get_initial_residual).

    Returns (r0, bnrm_inv, tol_eff, nrm0).  bnrm_inv is 1/||r0|| (nrm2_r),
    1/||b||₂ (nrm2_b) or 1/||b||₁ (nrm1_b, with tol adjusted by tol_w as the
    reference does); zero norms fall back to 1 like the reference.
    """
    r = b - A.matvec(x0)
    if spec.conv_cond == 0:
        ref = v.nrm2(r, spec.axis_name)
        nrm0 = ref
        tol_eff = spec.tol
    elif spec.conv_cond == 1:
        ref = v.nrm2(b, spec.axis_name)
        nrm0 = v.nrm2(r, spec.axis_name)
        tol_eff = spec.tol
    else:
        ref = v.nrm1(b, spec.axis_name)
        nrm0 = v.nrm1(r, spec.axis_name)
        tol_eff = ref * spec.tol_w + spec.tol
        bnrm_inv = jnp.where(ref == 0.0, 1.0,
                             1.0 / jnp.where(ref == 0.0, 1.0, ref))
        return r, bnrm_inv, tol_eff, nrm0    # raw ||r0||₁, like the getter
    bnrm_inv = jnp.where(ref == 0.0, 1.0, 1.0 / jnp.where(ref == 0.0, 1.0, ref))
    return r, bnrm_inv, tol_eff, nrm0 * bnrm_inv


def new_rhistory(spec: SolverSpec, nrm0, dtype):
    cap = spec.rh_cap if spec.rh_cap else spec.maxiter
    rh = jnp.full(cap + 2, jnp.nan, dtype=dtype)
    return rh.at[0].set(nrm0)


def record(rh, it, nrm):
    return rh.at[it].set(nrm)


def finalize_status(converged, broke_down, breakdown_code=C.LIS_BREAKDOWN):
    return jnp.where(broke_down, breakdown_code,
                     jnp.where(converged, C.LIS_SUCCESS, C.LIS_MAXITER))


def early_exit_output(x0, nrm0, spec, rh):
    """When ||r0|| already meets tol, the reference returns iter=1,
    retcode SUCCESS (lis_solver.c:1074-1081)."""
    return SolverOutput(x=x0, status=jnp.asarray(C.LIS_SUCCESS),
                        iters=jnp.asarray(1), resid=nrm0, rhistory=rh)


def krylov_loop(spec: SolverSpec, tol_eff, state0: dict, step):
    """Generic iteration loop shared by the Krylov methods.

    ``state0`` is a dict pytree that must contain at least
    ``it`` (iteration counter, starts at 1), ``flag`` (RUNNING until a
    breakdown sets a status code), ``nrm`` (current relative residual) and
    ``rh`` (history buffer); ``step(state) -> state`` performs one iteration.
    The loop runs while it <= maxiter, nrm > tol and flag == RUNNING —
    the same exit structure as every reference solver's for-loop.
    """
    def cond(s):
        return ((s["it"] <= spec.maxiter) & (s["nrm"] > tol_eff)
                & (s["flag"] == RUNNING))

    if spec.live_print:
        # the reference prints each iteration's relative residual as it
        # happens (lis_print_rhistory, lis_solver_cg.c:217-221); inside
        # jit that is a host callback, ordered to keep lines in sequence
        inner_step = step

        def step(s):
            s = inner_step(s)
            jax.debug.callback(_live_rhistory, s["it"] - 1, s["nrm"],
                               ordered=True)
            return s

    return jax.lax.while_loop(cond, step, state0)


def _live_rhistory(it, nrm):
    print(f"iteration: {int(it):5d}  relative residual = {float(nrm):e}",
          flush=True)


def loop_output(spec: SolverSpec, tol_eff, final: dict) -> SolverOutput:
    """Convert a finished krylov_loop state into SolverOutput.

    Matches the reference exit bookkeeping: on convergence iter is the
    iteration that converged (state increments it after recording), on
    maxiter exhaustion retcode=LIS_MAXITER, breakdown codes pass through.
    """
    converged = final["nrm"] <= tol_eff
    broke = final["flag"] != RUNNING
    status = jnp.where(broke, final["flag"],
                       jnp.where(converged, C.LIS_SUCCESS, C.LIS_MAXITER))
    # the step increments `it` after each iteration, so the iteration that
    # converged/broke down is it-1; maxiter exhaustion leaves it=maxiter+1.
    # If the initial residual already met tol the reference reports iter=1
    # (lis_solver.c:1074-1081).
    iters = jnp.clip(final["it"] - 1, 1, spec.maxiter)
    return SolverOutput(x=final["x"], status=status, iters=iters,
                        resid=final["nrm"], rhistory=final["rh"])
