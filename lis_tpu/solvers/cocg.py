"""COCG and COCR — complex-symmetric solvers.

Reference: lis_cocg (src/solver/lis_solver_cg.c:632) and lis_cocr (:1155),
available under --enable-complex.  Identical loops to CG/CR but with the
non-conjugated bilinear form <x̄,y> (lis_vector_nhdot) in place of the
Hermitian inner product — exploiting A = Aᵀ (complex symmetric).
"""

from __future__ import annotations

import jax.numpy as jnp

from lis_tpu import config as C
from lis_tpu.core import vector as v
from lis_tpu.solvers.base import (RUNNING, SolverOutput, SolverSpec,
                                  init_residual, krylov_loop, loop_output,
                                  new_rhistory, record, register_solver,
                                  residual_norm)


@register_solver("cocg")
def cocg(A, b, x0, M, spec: SolverSpec, aux=None) -> SolverOutput:
    r, bnrm_inv, tol_eff, nrm0 = init_residual(A, b, x0, spec)
    rh = new_rhistory(spec, nrm0, jnp.real(b).dtype)
    one = jnp.asarray(1.0, dtype=b.dtype)

    state = dict(it=jnp.asarray(1), flag=jnp.asarray(RUNNING),
                 x=x0, r=r, p=jnp.zeros_like(b), rho_old=one,
                 nrm=nrm0, rh=rh)

    def step(s):
        z = M.psolve(s["r"])
        rho = v.nhdot(s["r"], z, spec.axis_name)
        beta = rho / s["rho_old"]
        p = z + beta * s["p"]
        q = A.matvec(p)
        dot_pq = v.nhdot(p, q, spec.axis_name)
        broke = dot_pq == 0.0
        alpha = rho / jnp.where(broke, one, dot_pq)
        x = s["x"] + alpha * p
        r = s["r"] - alpha * q
        nrm = residual_norm(r, bnrm_inv, spec)
        keep = lambda new, old: jnp.where(broke, old, new)
        return dict(it=s["it"] + 1,
                    flag=jnp.where(broke, C.LIS_BREAKDOWN, s["flag"]),
                    x=keep(x, s["x"]), r=keep(r, s["r"]), p=p,
                    rho_old=jnp.where(broke, s["rho_old"], rho),
                    nrm=keep(nrm, s["nrm"]),
                    rh=record(s["rh"], s["it"], jnp.where(broke, s["nrm"], nrm)))

    final = krylov_loop(spec, tol_eff, state, step)
    return loop_output(spec, tol_eff, final)


@register_solver("cocr")
def cocr(A, b, x0, M, spec: SolverSpec, aux=None) -> SolverOutput:
    r, bnrm_inv, tol_eff, nrm0 = init_residual(A, b, x0, spec)
    rh = new_rhistory(spec, nrm0, jnp.real(b).dtype)
    one = jnp.asarray(1.0, dtype=b.dtype)

    p = M.psolve(r)
    q = A.matvec(p)
    z = p

    state = dict(it=jnp.asarray(1), flag=jnp.asarray(RUNNING),
                 x=x0, r=r, z=z, p=p, q=q, nrm=nrm0, rh=rh)

    def step(s):
        qtld = M.psolve(s["q"])
        rho = v.nhdot(qtld, s["q"], spec.axis_name)
        broke = rho == 0.0
        rho_safe = jnp.where(broke, one, rho)
        dot_rq = v.nhdot(s["r"], qtld, spec.axis_name)
        alpha = dot_rq / rho_safe
        x = s["x"] + alpha * s["p"]
        r = s["r"] - alpha * s["q"]
        nrm = residual_norm(r, bnrm_inv, spec)
        z = s["z"] - alpha * qtld
        az = A.matvec(z)
        dot_zq = v.nhdot(az, qtld, spec.axis_name)
        beta = -dot_zq / rho_safe
        p = z + beta * s["p"]
        q = az + beta * s["q"]
        keep = lambda new, old: jnp.where(broke, old, new)
        return dict(it=s["it"] + 1,
                    flag=jnp.where(broke, C.LIS_BREAKDOWN, s["flag"]),
                    x=keep(x, s["x"]), r=keep(r, s["r"]), z=keep(z, s["z"]),
                    p=keep(p, s["p"]), q=keep(q, s["q"]),
                    nrm=keep(nrm, s["nrm"]),
                    rh=record(s["rh"], s["it"], jnp.where(broke, s["nrm"], nrm)))

    final = krylov_loop(spec, tol_eff, state, step)
    return loop_output(spec, tol_eff, final)
