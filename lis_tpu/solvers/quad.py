"""Quad (double-double) precision solver variants.

Reference: the _quad/_switch registry columns (src/solver/lis_solver.c:
107-144) — full-DD iterations (lis_cg_quad, src/solver/lis_solver_cg.c:246
etc.) and switch variants that iterate in double until -switch_tol then
continue in DD.

Vectors are DD pairs (lis_tpu.core.ddreal); matvec gathers both limbs with
TWO_PROD accumulation; dots reduce through the pairwise two_sum tree (the
custom-MPI-op analogue).  Preconditioners apply per limb (valid for any
linear M).  Registered as "<name>_quad"; the driver dispatches on -f quad /
-f switch.
"""

from __future__ import annotations

import jax.numpy as jnp

from lis_tpu import config as C
from lis_tpu.core import ddreal as q
from lis_tpu.core.ddreal import DD
from lis_tpu.solvers.base import (RUNNING, SolverOutput, SolverSpec,
                                  krylov_loop, loop_output, new_rhistory,
                                  record, register_solver)


def _psolve_dd(M, r: DD) -> DD:
    return DD(M.psolve(r.hi), M.psolve(r.lo))


def _psolveh_dd(M, r: DD) -> DD:
    return DD(M.psolveh(r.hi), M.psolveh(r.lo))


def _init_dd(A, b, x0, spec):
    bdd = q.dd(b)
    r = q.sub(bdd, q.matvec_dd(A, q.dd(x0)))
    if spec.conv_cond == 1:
        ref = q.to_float(q.nrm2(bdd, spec.axis_name))
        nrm0 = q.to_float(q.nrm2(r, spec.axis_name))
    elif spec.conv_cond == 2:
        ref = q.to_float(q.nrm1(bdd, spec.axis_name))
        nrm0 = q.to_float(q.nrm1(r, spec.axis_name))
    else:
        ref = q.to_float(q.nrm2(r, spec.axis_name))
        nrm0 = ref
    bnrm_inv = jnp.where(ref == 0.0, 1.0, 1.0 / jnp.where(ref == 0.0, 1.0, ref))
    if spec.conv_cond == 2:
        tol_eff = ref * spec.tol_w + spec.tol
        return r, bnrm_inv, tol_eff, nrm0
    return r, bnrm_inv, spec.tol, nrm0 * bnrm_inv


def _resid_dd(r: DD, bnrm_inv, spec):
    if spec.conv_cond == 2:
        return q.to_float(q.nrm1(r, spec.axis_name))
    return q.to_float(q.nrm2(r, spec.axis_name)) * bnrm_inv


def _kd(broke, new: DD, old: DD) -> DD:
    return q.where(~broke, new, old)


@register_solver("cg_quad")
def cg_quad(A, b, x0, M, spec: SolverSpec, aux=None) -> SolverOutput:
    r, bnrm_inv, tol_eff, nrm0 = _init_dd(A, b, x0, spec)
    rh = new_rhistory(spec, nrm0, jnp.float64)
    one = q.dd(jnp.asarray(1.0, b.dtype))

    state = dict(it=jnp.asarray(1), flag=jnp.asarray(RUNNING),
                 x=q.dd(x0), r=r, p=q.zeros_like(r), rho_old=one,
                 nrm=nrm0, rh=rh)

    def step(s):
        z = _psolve_dd(M, s["r"])
        rho = q.dot(s["r"], z, spec.axis_name)
        beta = q.div(rho, s["rho_old"])
        p = q.xpay(z, beta, s["p"])
        qv = q.matvec_dd(A, p)
        dot_pq = q.dot(p, qv, spec.axis_name)
        broke = (dot_pq.hi == 0.0) & (dot_pq.lo == 0.0)
        alpha = q.div(rho, q.where(broke, one, dot_pq))
        x = q.axpy(alpha, p, s["x"])
        r = q.axpy(q.neg(alpha), qv, s["r"])
        nrm = _resid_dd(r, bnrm_inv, spec)
        return dict(it=s["it"] + 1,
                    flag=jnp.where(broke, C.LIS_BREAKDOWN, s["flag"]),
                    x=_kd(broke, x, s["x"]), r=_kd(broke, r, s["r"]),
                    p=p, rho_old=q.where(broke, s["rho_old"], rho),
                    nrm=jnp.where(broke, s["nrm"], nrm),
                    rh=record(s["rh"], s["it"], nrm))

    final = krylov_loop(spec, tol_eff, state, step)
    out = loop_output(spec, tol_eff, final)
    return out._replace(x=q.to_float(final["x"]))


@register_solver("cr_quad")
def cr_quad(A, b, x0, M, spec: SolverSpec, aux=None) -> SolverOutput:
    r, bnrm_inv, tol_eff, nrm0 = _init_dd(A, b, x0, spec)
    rh = new_rhistory(spec, nrm0, jnp.float64)
    one = q.dd(jnp.asarray(1.0, b.dtype))

    p = _psolve_dd(M, r)
    qv = q.matvec_dd(A, p)
    z = p
    state = dict(it=jnp.asarray(1), flag=jnp.asarray(RUNNING),
                 x=q.dd(x0), r=r, z=z, p=p, q=qv, nrm=nrm0, rh=rh)

    def step(s):
        qtld = _psolve_dd(M, s["q"])
        rho = q.dot(qtld, s["q"], spec.axis_name)
        broke = (rho.hi == 0.0) & (rho.lo == 0.0)
        rho_s = q.where(broke, one, rho)
        alpha = q.div(q.dot(s["r"], qtld, spec.axis_name), rho_s)
        x = q.axpy(alpha, s["p"], s["x"])
        r = q.axpy(q.neg(alpha), s["q"], s["r"])
        nrm = _resid_dd(r, bnrm_inv, spec)
        z = q.axpy(q.neg(alpha), qtld, s["z"])
        az = q.matvec_dd(A, z)
        beta = q.neg(q.div(q.dot(az, qtld, spec.axis_name), rho_s))
        p = q.xpay(z, beta, s["p"])
        qn = q.xpay(az, beta, s["q"])
        return dict(it=s["it"] + 1,
                    flag=jnp.where(broke, C.LIS_BREAKDOWN, s["flag"]),
                    x=_kd(broke, x, s["x"]), r=_kd(broke, r, s["r"]),
                    z=_kd(broke, z, s["z"]), p=_kd(broke, p, s["p"]),
                    q=_kd(broke, qn, s["q"]),
                    nrm=jnp.where(broke, s["nrm"], nrm),
                    rh=record(s["rh"], s["it"], nrm))

    final = krylov_loop(spec, tol_eff, state, step)
    out = loop_output(spec, tol_eff, final)
    return out._replace(x=q.to_float(final["x"]))


@register_solver("bicg_quad")
def bicg_quad(A, b, x0, M, spec: SolverSpec, aux=None) -> SolverOutput:
    r, bnrm_inv, tol_eff, nrm0 = _init_dd(A, b, x0, spec)
    rh = new_rhistory(spec, nrm0, jnp.float64)
    one = q.dd(jnp.asarray(1.0, b.dtype))
    rtld = r

    state = dict(it=jnp.asarray(1), flag=jnp.asarray(RUNNING),
                 x=q.dd(x0), r=r, rtld=rtld,
                 p=q.zeros_like(r), ptld=q.zeros_like(r),
                 rho_old=one, nrm=nrm0, rh=rh)

    def step(s):
        z = _psolve_dd(M, s["r"])
        ztld = _psolveh_dd(M, s["rtld"])
        rho = q.dot(s["rtld"], z, spec.axis_name)
        broke1 = (rho.hi == 0.0) & (rho.lo == 0.0)
        beta = q.div(rho, s["rho_old"])
        p = q.xpay(z, beta, s["p"])
        qv = q.matvec_dd(A, p)
        ptld = q.xpay(ztld, beta, s["ptld"])
        qtld = q.matvech_dd(A, ptld)
        tmp = q.dot(ptld, qv, spec.axis_name)
        broke = broke1 | ((tmp.hi == 0.0) & (tmp.lo == 0.0))
        alpha = q.div(rho, q.where(broke, one, tmp))
        x = q.axpy(alpha, p, s["x"])
        r = q.axpy(q.neg(alpha), qv, s["r"])
        rtld = q.axpy(q.neg(alpha), qtld, s["rtld"])
        nrm = _resid_dd(r, bnrm_inv, spec)
        return dict(it=s["it"] + 1,
                    flag=jnp.where(broke, C.LIS_BREAKDOWN, s["flag"]),
                    x=_kd(broke, x, s["x"]), r=_kd(broke, r, s["r"]),
                    rtld=_kd(broke, rtld, s["rtld"]), p=p, ptld=ptld,
                    rho_old=q.where(broke, s["rho_old"], rho),
                    nrm=jnp.where(broke, s["nrm"], nrm),
                    rh=record(s["rh"], s["it"], nrm))

    final = krylov_loop(spec, tol_eff, state, step)
    out = loop_output(spec, tol_eff, final)
    return out._replace(x=q.to_float(final["x"]))


@register_solver("cgs_quad")
def cgs_quad(A, b, x0, M, spec: SolverSpec, aux=None) -> SolverOutput:
    r, bnrm_inv, tol_eff, nrm0 = _init_dd(A, b, x0, spec)
    rh = new_rhistory(spec, nrm0, jnp.float64)
    one = q.dd(jnp.asarray(1.0, b.dtype))

    state = dict(it=jnp.asarray(1), flag=jnp.asarray(RUNNING),
                 x=q.dd(x0), r=r, rtld=r,
                 p=q.zeros_like(r), qq=q.zeros_like(r),
                 rho_old=one, nrm=nrm0, rh=rh)

    def step(s):
        rho = q.dot(s["rtld"], s["r"], spec.axis_name)
        broke1 = (rho.hi == 0.0) & (rho.lo == 0.0)
        beta = q.div(rho, s["rho_old"])
        u = q.axpy(beta, s["qq"], s["r"])
        p = q.add(u, q.mul(q._bcast(beta, u),
                           q.add(s["qq"], q.scal(beta, s["p"]))))
        phat = _psolve_dd(M, p)
        vhat = q.matvec_dd(A, phat)
        tmp = q.dot(s["rtld"], vhat, spec.axis_name)
        broke = broke1 | ((tmp.hi == 0.0) & (tmp.lo == 0.0))
        alpha = q.div(rho, q.where(broke, one, tmp))
        qq = q.axpy(q.neg(alpha), vhat, u)
        uhat = _psolve_dd(M, q.add(u, qq))
        x = q.axpy(alpha, uhat, s["x"])
        qhat = q.matvec_dd(A, uhat)
        r = q.axpy(q.neg(alpha), qhat, s["r"])
        nrm = _resid_dd(r, bnrm_inv, spec)
        return dict(it=s["it"] + 1,
                    flag=jnp.where(broke, C.LIS_BREAKDOWN, s["flag"]),
                    x=_kd(broke, x, s["x"]), r=_kd(broke, r, s["r"]),
                    rtld=s["rtld"], p=p, qq=_kd(broke, qq, s["qq"]),
                    rho_old=q.where(broke, s["rho_old"], rho),
                    nrm=jnp.where(broke, s["nrm"], nrm),
                    rh=record(s["rh"], s["it"], nrm))

    final = krylov_loop(spec, tol_eff, state, step)
    out = loop_output(spec, tol_eff, final)
    return out._replace(x=q.to_float(final["x"]))


@register_solver("bicgstab_quad")
def bicgstab_quad(A, b, x0, M, spec: SolverSpec, aux=None) -> SolverOutput:
    r, bnrm_inv, tol_eff, nrm0 = _init_dd(A, b, x0, spec)
    rh = new_rhistory(spec, nrm0, jnp.float64)
    one = q.dd(jnp.asarray(1.0, b.dtype))
    z = q.zeros_like(r)

    state = dict(it=jnp.asarray(1), flag=jnp.asarray(RUNNING),
                 x=q.dd(x0), r=r, rtld=r, p=z, vv=z,
                 alpha=one, omega=one, rho_old=one, nrm=nrm0, rh=rh)

    def step(s):
        rho = q.dot(s["rtld"], s["r"], spec.axis_name)
        broke1 = (rho.hi == 0.0) & (rho.lo == 0.0)
        beta = q.mul(q.div(rho, s["rho_old"]), q.div(s["alpha"], s["omega"]))
        pm = q.axpy(q.neg(s["omega"]), s["vv"], s["p"])
        p = q.where(s["it"] == 1, s["r"], q.xpay(s["r"], beta, pm))
        phat = _psolve_dd(M, p)
        vv = q.matvec_dd(A, phat)
        tmp1 = q.dot(s["rtld"], vv, spec.axis_name)
        alpha = q.div(rho, q.where((tmp1.hi == 0.0) & (tmp1.lo == 0.0),
                                   one, tmp1))
        srec = q.axpy(q.neg(alpha), vv, s["r"])
        nrm_s = _resid_dd(srec, bnrm_inv, spec)
        early = nrm_s <= tol_eff
        shat = _psolve_dd(M, srec)
        t = q.matvec_dd(A, shat)
        omega = q.div(q.dot(t, srec, spec.axis_name),
                      q.dot(t, t, spec.axis_name))
        x_full = q.axpy(omega, shat, q.axpy(alpha, phat, s["x"]))
        r_full = q.axpy(q.neg(omega), t, srec)
        nrm_full = _resid_dd(r_full, bnrm_inv, spec)
        broke2 = (omega.hi == 0.0) & (omega.lo == 0.0) & ~early \
            & (nrm_full > tol_eff)
        broke = broke1 | broke2
        x = q.where(early, q.axpy(alpha, phat, s["x"]), x_full)
        r = q.where(early, srec, r_full)
        nrm = jnp.where(early, nrm_s, nrm_full)
        return dict(it=s["it"] + 1,
                    flag=jnp.where(broke, C.LIS_BREAKDOWN, s["flag"]),
                    x=_kd(broke1, x, s["x"]), r=_kd(broke1, r, s["r"]),
                    rtld=s["rtld"], p=_kd(broke1, p, s["p"]),
                    vv=_kd(broke1, vv, s["vv"]),
                    alpha=q.where(broke1, s["alpha"], alpha),
                    omega=q.where(broke1, s["omega"], omega),
                    rho_old=q.where(broke1, s["rho_old"], rho),
                    nrm=jnp.where(broke1, s["nrm"], nrm),
                    rh=record(s["rh"], s["it"], nrm))

    final = krylov_loop(spec, tol_eff, state, step)
    out = loop_output(spec, tol_eff, final)
    return out._replace(x=q.to_float(final["x"]))
