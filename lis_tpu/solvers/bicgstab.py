"""BiCGSTAB and BiCRSTAB.

Reference: lis_bicgstab (src/solver/lis_solver_bicgstab.c:137) and
lis_bicrstab (:951).  Both have the reference's mid-iteration early
convergence check on the intermediate residual s (before the stabilising
omega step) — expressed here as masked updates inside the same compiled
loop body, keeping the iteration a single XLA while-loop.
"""

from __future__ import annotations

import jax.numpy as jnp

from lis_tpu import config as C
from lis_tpu.core import vector as v
from lis_tpu.solvers.base import (RUNNING, SolverOutput, SolverSpec,
                                  init_residual, krylov_loop, loop_output,
                                  new_rhistory, record, register_solver,
                                  residual_norm)


def _cj(x):
    return jnp.conj(x) if jnp.iscomplexobj(x) else x


@register_solver("bicgstab")
def bicgstab(A, b, x0, M, spec: SolverSpec, aux=None) -> SolverOutput:
    r, bnrm_inv, tol_eff, nrm0 = init_residual(A, b, x0, spec)
    rh = new_rhistory(spec, nrm0, jnp.real(b).dtype)
    one = jnp.asarray(1.0, dtype=b.dtype)
    z = jnp.zeros_like(b)

    state = dict(it=jnp.asarray(1), flag=jnp.asarray(RUNNING),
                 x=x0, r=r, rtld=_cj(r), p=z, vv=z,
                 alpha=one, omega=one, rho_old=one, nrm=nrm0, rh=rh)

    def step(s):
        rho = v.dot(s["rtld"], s["r"], spec.axis_name)
        broke1 = rho == 0.0
        beta = (rho / s["rho_old"]) * (s["alpha"] / s["omega"])
        p = jnp.where(s["it"] == 1, s["r"],
                      s["r"] + beta * (s["p"] - s["omega"] * s["vv"]))
        phat = M.psolve(p)
        vv = A.matvec(phat)
        tmpdot1 = v.dot(s["rtld"], vv, spec.axis_name)
        alpha = rho / jnp.where(tmpdot1 == 0.0, one, tmpdot1)
        srec = s["r"] - alpha * vv                      # intermediate s
        nrm_s = residual_norm(srec, bnrm_inv, spec)
        early = nrm_s <= tol_eff                        # early exit on s
        shat = M.psolve(srec)
        t = A.matvec(shat)
        omega = (v.dot(t, srec, spec.axis_name)
                 / v.dot(t, t, spec.axis_name))
        x_full = s["x"] + alpha * phat + omega * shat
        r_full = srec - omega * t
        nrm_full = residual_norm(r_full, bnrm_inv, spec)
        broke2 = (omega == 0.0) & ~early & (nrm_full > tol_eff)
        broke = broke1 | broke2
        x = jnp.where(early, s["x"] + alpha * phat, x_full)
        r = jnp.where(early, srec, r_full)
        nrm = jnp.where(early, nrm_s, nrm_full)
        keep = lambda new, old: jnp.where(broke1, old, new)
        return dict(it=s["it"] + 1,
                    flag=jnp.where(broke, C.LIS_BREAKDOWN, s["flag"]),
                    x=keep(x, s["x"]), r=keep(r, s["r"]), rtld=s["rtld"],
                    p=keep(p, s["p"]), vv=keep(vv, s["vv"]),
                    alpha=keep(alpha, s["alpha"]),
                    omega=keep(omega, s["omega"]),
                    rho_old=jnp.where(broke1, s["rho_old"], rho),
                    nrm=keep(nrm, s["nrm"]),
                    rh=record(s["rh"], s["it"],
                              jnp.where(broke1, s["nrm"], nrm)))

    final = krylov_loop(spec, tol_eff, state, step)
    return loop_output(spec, tol_eff, final)


@register_solver("bicrstab")
def bicrstab(A, b, x0, M, spec: SolverSpec, aux=None) -> SolverOutput:
    r, bnrm_inv, tol_eff, nrm0 = init_residual(A, b, x0, spec)
    rh = new_rhistory(spec, nrm0, jnp.real(b).dtype)
    one = jnp.asarray(1.0, dtype=b.dtype)
    rtld = A.matvech(_cj(r))
    z = M.psolve(r)
    p = z
    rho_old = v.dot(rtld, z, spec.axis_name)

    state = dict(it=jnp.asarray(1), flag=jnp.asarray(RUNNING),
                 x=x0, r=r, z=z, p=p, map_=jnp.zeros_like(b),
                 rho_old=rho_old, nrm=nrm0, rh=rh)

    def step(s):
        ap = A.matvec(s["p"])
        map_ = M.psolve(ap)
        tmpdot1 = v.dot(rtld, map_, spec.axis_name)
        alpha = s["rho_old"] / jnp.where(tmpdot1 == 0.0, one, tmpdot1)
        srec = s["r"] - alpha * ap
        nrm_s = residual_norm(srec, bnrm_inv, spec)
        early = nrm_s <= tol_eff
        ms = s["z"] - alpha * map_
        ams = A.matvec(ms)
        omega = (v.dot(ams, srec, spec.axis_name)
                 / v.dot(ams, ams, spec.axis_name))
        x_full = s["x"] + alpha * s["p"] + omega * ms
        r_full = srec - omega * ams
        nrm_full = residual_norm(r_full, bnrm_inv, spec)
        z_new = M.psolve(r_full)
        rho = v.dot(rtld, z_new, spec.axis_name)
        conv_full = nrm_full <= tol_eff
        broke = (rho == 0.0) & ~early & ~conv_full
        beta = (rho / s["rho_old"]) * (alpha / jnp.where(omega == 0.0, one, omega))
        p = z_new + beta * (s["p"] - omega * map_)
        x = jnp.where(early, s["x"] + alpha * s["p"], x_full)
        r = jnp.where(early, srec, r_full)
        nrm = jnp.where(early, nrm_s, nrm_full)
        return dict(it=s["it"] + 1,
                    flag=jnp.where(broke, C.LIS_BREAKDOWN, s["flag"]),
                    x=x, r=r, z=jnp.where(early, s["z"], z_new),
                    p=jnp.where(early, s["p"], p), map_=map_,
                    rho_old=jnp.where(broke | early, s["rho_old"], rho),
                    nrm=nrm,
                    rh=record(s["rh"], s["it"], nrm))

    final = krylov_loop(spec, tol_eff, state, step)
    return loop_output(spec, tol_eff, final)
