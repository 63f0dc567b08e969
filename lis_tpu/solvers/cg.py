"""CG and CR — the conjugate gradient/residual pair.

Reference: lis_cg (src/solver/lis_solver_cg.c:129) and lis_cr (:819).  Loop
bodies follow the reference update order exactly (psolve → dot → xpay →
matvec → dots → axpys → convergence check) so iteration counts match; the
loop itself is a lax.while_loop so one compiled step runs per iteration with
two psum-reduced dots — the same two synchronisation points per iteration as
the reference's MPI_Allreduce pair.
"""

from __future__ import annotations

import jax.numpy as jnp

from lis_tpu.core import vector as v
from lis_tpu.solvers.base import (RUNNING, SolverOutput, SolverSpec,
                                  init_residual, krylov_loop, loop_output,
                                  new_rhistory, record, register_solver,
                                  residual_norm)
from lis_tpu import config as C


@register_solver("cg")
def cg(A, b, x0, M, spec: SolverSpec) -> SolverOutput:
    r, bnrm_inv, tol_eff, nrm0 = init_residual(A, b, x0, spec)
    rdtype = jnp.real(b).dtype
    rh = new_rhistory(spec, nrm0, rdtype)
    one = jnp.asarray(1.0, dtype=b.dtype)

    state = dict(it=jnp.asarray(1), flag=jnp.asarray(RUNNING),
                 x=x0, r=r, p=jnp.zeros_like(b), rho_old=one,
                 nrm=nrm0, rh=rh)

    def step(s):
        z = M.psolve(s["r"])
        rho = v.dot(s["r"], z, spec.axis_name)
        beta = rho / s["rho_old"]
        p = v.xpay(z, beta, s["p"])
        q = A.matvec(p)
        dot_pq = v.dot(p, q, spec.axis_name)
        broke = dot_pq == 0.0
        alpha = rho / jnp.where(broke, one, dot_pq)
        x = s["x"] + alpha * p
        r = s["r"] - alpha * q
        nrm = residual_norm(r, bnrm_inv, spec)
        return dict(it=s["it"] + 1,
                    flag=jnp.where(broke, C.LIS_BREAKDOWN, s["flag"]),
                    x=jnp.where(broke, s["x"], x),
                    r=jnp.where(broke, s["r"], r),
                    p=p, rho_old=rho,
                    nrm=jnp.where(broke, s["nrm"], nrm),
                    rh=record(s["rh"], s["it"], nrm))

    final = krylov_loop(spec, tol_eff, state, step)
    return loop_output(spec, tol_eff, final)


@register_solver("cr")
def cr(A, b, x0, M, spec: SolverSpec) -> SolverOutput:
    r, bnrm_inv, tol_eff, nrm0 = init_residual(A, b, x0, spec)
    rdtype = jnp.real(b).dtype
    rh = new_rhistory(spec, nrm0, rdtype)
    one = jnp.asarray(1.0, dtype=b.dtype)

    p = M.psolve(r)
    q = A.matvec(p)
    z = p

    state = dict(it=jnp.asarray(1), flag=jnp.asarray(RUNNING),
                 x=x0, r=r, z=z, p=p, q=q, nrm=nrm0, rh=rh)

    def step(s):
        qtld = M.psolve(s["q"])
        rho = v.dot(qtld, s["q"], spec.axis_name)
        broke = rho == 0.0
        rho_safe = jnp.where(broke, one, rho)
        dot_rq = v.dot(s["r"], qtld, spec.axis_name)
        alpha = dot_rq / rho_safe
        x = s["x"] + alpha * s["p"]
        r = s["r"] - alpha * s["q"]
        nrm = residual_norm(r, bnrm_inv, spec)
        z = s["z"] - alpha * qtld
        az = A.matvec(z)
        dot_zq = v.dot(az, qtld, spec.axis_name)
        beta = -dot_zq / rho_safe
        p = v.xpay(z, beta, s["p"])
        q = v.xpay(az, beta, s["q"])
        keep = lambda new, old: jnp.where(broke, old, new)
        return dict(it=s["it"] + 1,
                    flag=jnp.where(broke, C.LIS_BREAKDOWN, s["flag"]),
                    x=keep(x, s["x"]), r=keep(r, s["r"]), z=keep(z, s["z"]),
                    p=keep(p, s["p"]), q=keep(q, s["q"]),
                    nrm=keep(nrm, s["nrm"]),
                    rh=record(s["rh"], s["it"], jnp.where(broke, s["nrm"], nrm)))

    final = krylov_loop(spec, tol_eff, state, step)
    return loop_output(spec, tol_eff, final)
