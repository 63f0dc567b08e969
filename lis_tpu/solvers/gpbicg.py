"""GPBiCG and GPBiCR — product-type methods with 2-step stabilising
polynomials.

Reference: lis_gpbicg (src/solver/lis_solver_gpbicg.c:356) and lis_gpbicr
(:1349).  The qsi/eta least-squares pair comes from the same 5-dot 2×2
system in both; GPBiCG includes the reference's early exit on the
intermediate residual t.
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


def _qsi_eta(first, y, tvec, w, axis_name):
    """The shared 2×2 least-squares solve for (qsi, eta): minimise
    ||t - eta*y - qsi*w||."""
    d0 = v.dot(y, y, axis_name)
    d1 = v.dot(w, tvec, axis_name)
    d2 = v.dot(y, tvec, axis_name)
    d3 = v.dot(w, y, axis_name)
    d4 = v.dot(w, w, axis_name)
    tmp = d4 * d0 - d3 * d3
    qsi_n = (d0 * d1 - d2 * d3) / tmp
    eta_n = (d4 * d2 - d3 * d1) / tmp
    qsi_1 = d1 / d4
    qsi = jnp.where(first, qsi_1, qsi_n)
    eta = jnp.where(first, 0.0, eta_n)
    return qsi, eta


@register_solver("gpbicg")
def gpbicg(A, b, x0, M, spec: SolverSpec, aux=None) -> SolverOutput:
    r, bnrm_inv, tol_eff, nrm0 = init_residual(A, b, x0, spec)
    rh = new_rhistory(spec, nrm0, jnp.real(b).dtype)
    one = jnp.asarray(1.0, dtype=b.dtype)
    z0 = jnp.zeros_like(b)

    state = dict(it=jnp.asarray(1), flag=jnp.asarray(RUNNING),
                 x=x0, r=r, rtld=_cj(r),
                 t=z0, t0=z0, ttld=z0, p=z0, ptld=z0, u=z0, z=z0,
                 alpha=one, qsi=one, rho_old=one, nrm=nrm0, rh=rh)

    def step(s):
        rho = v.dot(s["rtld"], s["r"], spec.axis_name)
        broke = rho == 0.0
        beta = (rho / s["rho_old"]) * (s["alpha"] / s["qsi"])
        w = s["ttld"] + beta * s["ptld"]
        rhat = M.psolve(s["r"])
        p = rhat + beta * (s["p"] - s["u"])
        ptld = A.matvec(p)
        tdot = v.dot(s["rtld"], ptld, spec.axis_name)
        alpha = rho / jnp.where(tdot == 0.0, one, tdot)
        y = s["t"] + alpha * (ptld - w) - s["r"]
        t = s["r"] - alpha * ptld
        nrm_t = residual_norm(t, bnrm_inv, spec)
        early = nrm_t <= tol_eff
        that = M.psolve(t)
        phat = M.psolve(ptld)
        t0hat = M.psolve(s["t0"])
        ttld = A.matvec(that)
        qsi, eta = _qsi_eta(s["it"] == 1, y, t, ttld, spec.axis_name)
        u = qsi * phat + eta * (t0hat - rhat + beta * s["u"])
        z = qsi * rhat + eta * s["z"] - alpha * u
        x_full = s["x"] + alpha * p + z
        r_full = t - eta * y - qsi * ttld
        nrm_full = residual_norm(r_full, bnrm_inv, spec)
        x = jnp.where(early, s["x"] + alpha * p, x_full)
        rr = jnp.where(early, t, r_full)
        nrm = jnp.where(early, nrm_t, nrm_full)
        keep = lambda new, old: jnp.where(broke, old, new)
        return dict(it=s["it"] + 1,
                    flag=jnp.where(broke, C.LIS_BREAKDOWN, s["flag"]),
                    x=keep(x, s["x"]), r=keep(rr, s["r"]), rtld=s["rtld"],
                    t=keep(t, s["t"]), t0=keep(t, s["t0"]),
                    ttld=keep(ttld, s["ttld"]),
                    p=keep(p, s["p"]), ptld=keep(ptld, s["ptld"]),
                    u=keep(u, s["u"]), z=keep(z, s["z"]),
                    alpha=keep(alpha, s["alpha"]), qsi=keep(qsi, s["qsi"]),
                    rho_old=jnp.where(broke, s["rho_old"], rho),
                    nrm=keep(nrm, s["nrm"]),
                    rh=record(s["rh"], s["it"], jnp.where(broke, s["nrm"], nrm)))

    final = krylov_loop(spec, tol_eff, state, step)
    return loop_output(spec, tol_eff, final)


@register_solver("gpbicr")
def gpbicr(A, b, x0, M, spec: SolverSpec, aux=None) -> SolverOutput:
    r, bnrm_inv, tol_eff, nrm0 = init_residual(A, b, x0, spec)
    rh = new_rhistory(spec, nrm0, jnp.real(b).dtype)
    one = jnp.asarray(1.0, dtype=b.dtype)
    z0 = jnp.zeros_like(b)
    rtld = A.matvech(_cj(r))
    p = M.psolve(r)
    rho_old = v.dot(rtld, p, spec.axis_name)

    state = dict(it=jnp.asarray(1), flag=jnp.asarray(RUNNING),
                 x=x0, r=r, mr=z0, p=p, t=z0, w=z0, u=z0, y=z0, z=z0,
                 mt_old=z0, beta=jnp.asarray(0.0, b.dtype),
                 rho_old=rho_old, nrm=nrm0, rh=rh)

    def step(s):
        ap = A.matvec(s["p"])
        map_ = M.psolve(ap)
        tdot = v.dot(rtld, map_, spec.axis_name)
        broke1 = tdot == 0.0
        alpha = s["rho_old"] / jnp.where(broke1, one, tdot)
        y = s["t"] + alpha * (ap - s["w"]) - s["r"]
        t = s["r"] - alpha * ap
        nrm_t = residual_norm(t, bnrm_inv, spec)
        early = nrm_t <= tol_eff
        mt = s["mr"] - alpha * map_
        amt = A.matvec(mt)
        qsi, eta = _qsi_eta(s["it"] == 1, y, t, amt, spec.axis_name)
        u = qsi * map_ + eta * (s["mt_old"] - s["mr"] + s["beta"] * s["u"])
        z = qsi * s["mr"] + eta * s["z"] - alpha * u
        x_full = s["x"] + alpha * s["p"] + z
        r_full = t - eta * y - qsi * amt
        nrm_full = residual_norm(r_full, bnrm_inv, spec)
        conv_full = nrm_full <= tol_eff
        mr = M.psolve(r_full)
        rho = v.dot(rtld, mr, spec.axis_name)
        broke2 = (rho == 0.0) & ~early & ~conv_full
        beta = (rho / jnp.where(s["rho_old"] == 0.0, one, s["rho_old"])) \
            * (alpha / jnp.where(qsi == 0.0, one, qsi))
        w = amt + beta * ap
        p = mr + beta * (s["p"] - u)
        broke = broke1 | broke2
        x = jnp.where(early, s["x"] + alpha * s["p"], x_full)
        rr = jnp.where(early, t, r_full)
        nrm = jnp.where(early, nrm_t, nrm_full)
        keep = lambda new, old: jnp.where(broke1, old, new)
        return dict(it=s["it"] + 1,
                    flag=jnp.where(broke, C.LIS_BREAKDOWN, s["flag"]),
                    x=keep(x, s["x"]), r=keep(rr, s["r"]),
                    mr=keep(mr, s["mr"]), p=keep(p, s["p"]),
                    t=keep(t, s["t"]), w=keep(w, s["w"]),
                    u=keep(u, s["u"]), y=keep(y, s["y"]), z=keep(z, s["z"]),
                    mt_old=keep(mt, s["mt_old"]),
                    beta=keep(beta, s["beta"]),
                    rho_old=jnp.where(broke, s["rho_old"], rho),
                    nrm=keep(nrm, s["nrm"]),
                    rh=record(s["rh"], s["it"],
                              jnp.where(broke1, s["nrm"], nrm)))

    final = krylov_loop(spec, tol_eff, state, step)
    return loop_output(spec, tol_eff, final)
