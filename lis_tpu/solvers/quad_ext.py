"""Quad (double-double) variants for the remaining solver families.

Reference: the _quad registry column (src/solver/lis_solver.c:107-144)
covers CG, BiCG, CGS, BiCGSTAB, BiCGSTAB(l), GPBiCG, TFQMR, Orthomin(m),
GMRES(m), BiCGSafe, CR, BiCR, CRS, BiCRSTAB, GPBiCR, BiCRSafe and FGMRES;
lis_tpu.solvers.quad holds the CG/CR/BiCG/CGS/BiCGSTAB ports, this module
the rest.  Each is the DD lift of its double twin in this package (same
update order, same breakdown checks), with scalars and vectors as (hi, lo)
pairs and all reductions through the compensated two-sum tree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lis_tpu import config as C
from lis_tpu.core import ddreal as q
from lis_tpu.core.ddreal import DD
from lis_tpu.solvers.base import (RUNNING, SolverOutput, SolverSpec,
                                  krylov_loop, loop_output, new_rhistory,
                                  record, register_solver)
from lis_tpu.solvers.quad import (_init_dd, _psolve_dd, _psolveh_dd,
                                  _resid_dd, _kd)


def _z(a: DD):
    """DD scalar == 0 (the reference's breakdown comparisons)."""
    return (a.hi == 0.0) & (a.lo == 0.0)


def _one(dt=jnp.float64):
    return q.dd(jnp.asarray(1.0, dt))


def _safe(den: DD, broke) -> DD:
    return q.where(broke, q.dd(jnp.ones((), den.hi.dtype)), den)


def _row(X: DD, i) -> DD:
    return DD(X.hi[i], X.lo[i])


def _setrow(X: DD, i, val: DD) -> DD:
    return DD(X.hi.at[i].set(val.hi), X.lo.at[i].set(val.lo))


def _set1(x: DD, i, val: DD) -> DD:
    return DD(x.hi.at[i].set(val.hi), x.lo.at[i].set(val.lo))


def _get1(x: DD, i) -> DD:
    return DD(x.hi[i], x.lo[i])


def _zeros(shape, dt=jnp.float64) -> DD:
    z = jnp.zeros(shape, dt)
    return DD(z, z)


def _sub_scaled(y: DD, alpha: DD, x: DD) -> DD:
    """y - alpha*x."""
    return q.axpy(q.neg(alpha), x, y)


@register_solver("bicr_quad")
def bicr_quad(A, b, x0, M, spec: SolverSpec, aux=None) -> SolverOutput:
    r, bnrm_inv, tol_eff, nrm0 = _init_dd(A, b, x0, spec)
    rh = new_rhistory(spec, nrm0, jnp.float64)
    rtld = r

    z = _psolve_dd(M, r)
    ztld = _psolveh_dd(M, rtld)
    p, ptld = z, ztld
    ap = q.matvec_dd(A, z)
    rho_old = q.dot(ztld, ap, spec.axis_name)

    state = dict(it=jnp.asarray(1), flag=jnp.asarray(RUNNING),
                 x=q.dd(x0), r=r, rtld=rtld, z=z, ztld=ztld, p=p,
                 ptld=ptld, ap=ap, rho_old=rho_old, nrm=nrm0, rh=rh)

    def step(s):
        aptld = q.matvech_dd(A, s["ptld"])
        map_ = _psolve_dd(M, s["ap"])
        tmpdot1 = q.dot(aptld, map_, spec.axis_name)
        broke1 = _z(tmpdot1)
        alpha = q.div(s["rho_old"], _safe(tmpdot1, broke1))
        x = q.axpy(alpha, s["p"], s["x"])
        r = _sub_scaled(s["r"], alpha, s["ap"])
        nrm = _resid_dd(r, bnrm_inv, spec)
        conv = nrm <= tol_eff
        rtld = _sub_scaled(s["rtld"], alpha, aptld)
        z = _sub_scaled(s["z"], alpha, map_)
        ztld = _psolveh_dd(M, rtld)
        az = q.matvec_dd(A, z)
        rho = q.dot(ztld, az, spec.axis_name)
        broke2 = _z(rho) & ~conv
        broke = broke1 | broke2
        beta = q.div(rho, _safe(s["rho_old"], _z(s["rho_old"])))
        p = q.xpay(z, beta, s["p"])
        ptld = q.xpay(ztld, beta, s["ptld"])
        ap = q.xpay(az, beta, s["ap"])
        k1 = lambda new, old: q.where(~broke1, new, old)
        return dict(it=s["it"] + 1,
                    flag=jnp.where(broke, C.LIS_BREAKDOWN, s["flag"]),
                    x=k1(x, s["x"]), r=k1(r, s["r"]),
                    rtld=k1(rtld, s["rtld"]), z=k1(z, s["z"]),
                    ztld=k1(ztld, s["ztld"]), p=k1(p, s["p"]),
                    ptld=k1(ptld, s["ptld"]), ap=k1(ap, s["ap"]),
                    rho_old=q.where(broke, s["rho_old"], rho),
                    nrm=jnp.where(broke1, s["nrm"], nrm),
                    rh=record(s["rh"], s["it"],
                              jnp.where(broke1, s["nrm"], nrm)))

    final = krylov_loop(spec, tol_eff, state, step)
    out = loop_output(spec, tol_eff, final)
    return out._replace(x=q.to_float(final["x"]))


@register_solver("crs_quad")
def crs_quad(A, b, x0, M, spec: SolverSpec, aux=None) -> SolverOutput:
    r, bnrm_inv, tol_eff, nrm0 = _init_dd(A, b, x0, spec)
    rh = new_rhistory(spec, nrm0, jnp.float64)
    rtld = q.matvech_dd(A, r)
    z0 = q.zeros_like(r)

    state = dict(it=jnp.asarray(1), flag=jnp.asarray(RUNNING),
                 x=q.dd(x0), r=r, rtld=rtld, p=z0, qq=z0,
                 rho_old=_one(b.dtype), nrm=nrm0, rh=rh)

    def step(s):
        z = _psolve_dd(M, s["r"])
        rho = q.dot(s["rtld"], z, spec.axis_name)
        broke1 = _z(rho)
        beta = q.div(rho, s["rho_old"])
        u = q.axpy(beta, s["qq"], z)
        p = q.add(u, q.mul(q._bcast(beta, u),
                           q.add(s["qq"], q.scal(beta, s["p"]))))
        ap = q.matvec_dd(A, p)
        map_ = _psolve_dd(M, ap)
        tmpdot1 = q.dot(s["rtld"], map_, spec.axis_name)
        broke = broke1 | _z(tmpdot1)
        alpha = q.div(rho, _safe(tmpdot1, broke))
        qq = _sub_scaled(u, alpha, map_)
        uq = q.add(u, qq)
        auq = q.matvec_dd(A, uq)
        x = q.axpy(alpha, uq, s["x"])
        r = _sub_scaled(s["r"], alpha, auq)
        nrm = _resid_dd(r, bnrm_inv, spec)
        return dict(it=s["it"] + 1,
                    flag=jnp.where(broke, C.LIS_BREAKDOWN, s["flag"]),
                    x=_kd(broke, x, s["x"]), r=_kd(broke, r, s["r"]),
                    rtld=s["rtld"], p=p, qq=_kd(broke, qq, s["qq"]),
                    rho_old=q.where(broke, s["rho_old"], rho),
                    nrm=jnp.where(broke, s["nrm"], nrm),
                    rh=record(s["rh"], s["it"],
                              jnp.where(broke, s["nrm"], nrm)))

    final = krylov_loop(spec, tol_eff, state, step)
    out = loop_output(spec, tol_eff, final)
    return out._replace(x=q.to_float(final["x"]))


@register_solver("bicrstab_quad")
def bicrstab_quad(A, b, x0, M, spec: SolverSpec, aux=None) -> SolverOutput:
    r, bnrm_inv, tol_eff, nrm0 = _init_dd(A, b, x0, spec)
    rh = new_rhistory(spec, nrm0, jnp.float64)
    rtld = q.matvech_dd(A, r)
    z = _psolve_dd(M, r)
    rho_old = q.dot(rtld, z, spec.axis_name)

    state = dict(it=jnp.asarray(1), flag=jnp.asarray(RUNNING),
                 x=q.dd(x0), r=r, z=z, p=z, map_=q.zeros_like(r),
                 rho_old=rho_old, nrm=nrm0, rh=rh)

    def step(s):
        ap = q.matvec_dd(A, s["p"])
        map_ = _psolve_dd(M, ap)
        tmpdot1 = q.dot(rtld, map_, spec.axis_name)
        alpha = q.div(s["rho_old"], _safe(tmpdot1, _z(tmpdot1)))
        srec = _sub_scaled(s["r"], alpha, ap)
        nrm_s = _resid_dd(srec, bnrm_inv, spec)
        early = nrm_s <= tol_eff
        ms = _sub_scaled(s["z"], alpha, map_)
        ams = q.matvec_dd(A, ms)
        omega = q.div(q.dot(ams, srec, spec.axis_name),
                      q.dot(ams, ams, spec.axis_name))
        x_full = q.axpy(omega, ms, q.axpy(alpha, s["p"], s["x"]))
        r_full = _sub_scaled(srec, omega, ams)
        nrm_full = _resid_dd(r_full, bnrm_inv, spec)
        z_new = _psolve_dd(M, r_full)
        rho = q.dot(rtld, z_new, spec.axis_name)
        conv_full = nrm_full <= tol_eff
        broke = _z(rho) & ~early & ~conv_full
        beta = q.mul(q.div(rho, s["rho_old"]),
                     q.div(alpha, _safe(omega, _z(omega))))
        p = q.add(z_new, q.mul(q._bcast(beta, z_new),
                               _sub_scaled(s["p"], omega, map_)))
        x = q.where(early, q.axpy(alpha, s["p"], s["x"]), x_full)
        r = q.where(early, srec, r_full)
        nrm = jnp.where(early, nrm_s, nrm_full)
        return dict(it=s["it"] + 1,
                    flag=jnp.where(broke, C.LIS_BREAKDOWN, s["flag"]),
                    x=x, r=r, z=q.where(early, s["z"], z_new),
                    p=q.where(early, s["p"], p), map_=map_,
                    rho_old=q.where(broke | early, s["rho_old"], rho),
                    nrm=nrm, rh=record(s["rh"], s["it"], nrm))

    final = krylov_loop(spec, tol_eff, state, step)
    out = loop_output(spec, tol_eff, final)
    return out._replace(x=q.to_float(final["x"]))


def _qsi_eta_dd(first, y: DD, tvec: DD, w: DD, axis_name):
    """DD version of the shared 2×2 least-squares solve (gpbicg/bicgsafe)."""
    d0 = q.dot(y, y, axis_name)
    d1 = q.dot(w, tvec, axis_name)
    d2 = q.dot(y, tvec, axis_name)
    d3 = q.dot(w, y, axis_name)
    d4 = q.dot(w, w, axis_name)
    tmp = q.sub(q.mul(d4, d0), q.mul(d3, d3))
    tmp = _safe(tmp, _z(tmp))
    qsi_n = q.div(q.sub(q.mul(d0, d1), q.mul(d2, d3)), tmp)
    eta_n = q.div(q.sub(q.mul(d4, d2), q.mul(d3, d1)), tmp)
    qsi_1 = q.div(d1, _safe(d4, _z(d4)))
    zero = q.dd(jnp.zeros((), y.hi.dtype))
    return q.where(first, qsi_1, qsi_n), q.where(first, zero, eta_n)


@register_solver("gpbicg_quad")
def gpbicg_quad(A, b, x0, M, spec: SolverSpec, aux=None) -> SolverOutput:
    r, bnrm_inv, tol_eff, nrm0 = _init_dd(A, b, x0, spec)
    rh = new_rhistory(spec, nrm0, jnp.float64)
    z0 = q.zeros_like(r)
    one = _one(b.dtype)

    state = dict(it=jnp.asarray(1), flag=jnp.asarray(RUNNING),
                 x=q.dd(x0), r=r, rtld=r,
                 t=z0, t0=z0, ttld=z0, p=z0, ptld=z0, u=z0, z=z0,
                 alpha=one, qsi=one, rho_old=one, nrm=nrm0, rh=rh)

    def step(s):
        rho = q.dot(s["rtld"], s["r"], spec.axis_name)
        broke = _z(rho)
        beta = q.mul(q.div(rho, s["rho_old"]),
                     q.div(s["alpha"], _safe(s["qsi"], _z(s["qsi"]))))
        w = q.xpay(s["ttld"], beta, s["ptld"])
        rhat = _psolve_dd(M, s["r"])
        p = q.add(rhat, q.mul(q._bcast(beta, rhat),
                              q.sub(s["p"], s["u"])))
        ptld = q.matvec_dd(A, p)
        tdot = q.dot(s["rtld"], ptld, spec.axis_name)
        alpha = q.div(rho, _safe(tdot, _z(tdot)))
        y = q.sub(q.axpy(alpha, q.sub(ptld, w), s["t"]), s["r"])
        t = _sub_scaled(s["r"], alpha, ptld)
        nrm_t = _resid_dd(t, bnrm_inv, spec)
        early = nrm_t <= tol_eff
        that = _psolve_dd(M, t)
        phat = _psolve_dd(M, ptld)
        t0hat = _psolve_dd(M, s["t0"])
        ttld = q.matvec_dd(A, that)
        qsi, eta = _qsi_eta_dd(s["it"] == 1, y, t, ttld, spec.axis_name)
        u = q.add(q.scal(qsi, phat),
                  q.mul(q._bcast(eta, phat),
                        q.add(q.sub(t0hat, rhat),
                              q.scal(beta, s["u"]))))
        z = q.sub(q.add(q.scal(qsi, rhat), q.scal(eta, s["z"])),
                  q.scal(alpha, u))
        x_full = q.add(q.axpy(alpha, p, s["x"]), z)
        r_full = q.sub(_sub_scaled(t, eta, y), q.scal(qsi, ttld))
        nrm_full = _resid_dd(r_full, bnrm_inv, spec)
        x = q.where(early, q.axpy(alpha, p, s["x"]), x_full)
        rr = q.where(early, t, r_full)
        nrm = jnp.where(early, nrm_t, nrm_full)
        k = lambda new, old: q.where(~broke, new, old)
        return dict(it=s["it"] + 1,
                    flag=jnp.where(broke, C.LIS_BREAKDOWN, s["flag"]),
                    x=k(x, s["x"]), r=k(rr, s["r"]), rtld=s["rtld"],
                    t=k(t, s["t"]), t0=k(t, s["t0"]),
                    ttld=k(ttld, s["ttld"]),
                    p=k(p, s["p"]), ptld=k(ptld, s["ptld"]),
                    u=k(u, s["u"]), z=k(z, s["z"]),
                    alpha=q.where(~broke, alpha, s["alpha"]),
                    qsi=q.where(~broke, qsi, s["qsi"]),
                    rho_old=q.where(broke, s["rho_old"], rho),
                    nrm=jnp.where(broke, s["nrm"], nrm),
                    rh=record(s["rh"], s["it"],
                              jnp.where(broke, s["nrm"], nrm)))

    final = krylov_loop(spec, tol_eff, state, step)
    out = loop_output(spec, tol_eff, final)
    return out._replace(x=q.to_float(final["x"]))


@register_solver("gpbicr_quad")
def gpbicr_quad(A, b, x0, M, spec: SolverSpec, aux=None) -> SolverOutput:
    r, bnrm_inv, tol_eff, nrm0 = _init_dd(A, b, x0, spec)
    rh = new_rhistory(spec, nrm0, jnp.float64)
    z0 = q.zeros_like(r)
    rtld = q.matvech_dd(A, r)
    p = _psolve_dd(M, r)
    rho_old = q.dot(rtld, p, spec.axis_name)
    zero = q.dd(jnp.asarray(0.0, b.dtype))

    state = dict(it=jnp.asarray(1), flag=jnp.asarray(RUNNING),
                 x=q.dd(x0), r=r, mr=z0, p=p, t=z0, w=z0, u=z0, y=z0,
                 z=z0, mt_old=z0, beta=zero, rho_old=rho_old,
                 nrm=nrm0, rh=rh)

    def step(s):
        ap = q.matvec_dd(A, s["p"])
        map_ = _psolve_dd(M, ap)
        tdot = q.dot(rtld, map_, spec.axis_name)
        broke1 = _z(tdot)
        alpha = q.div(s["rho_old"], _safe(tdot, broke1))
        y = q.sub(q.axpy(alpha, q.sub(ap, s["w"]), s["t"]), s["r"])
        t = _sub_scaled(s["r"], alpha, ap)
        nrm_t = _resid_dd(t, bnrm_inv, spec)
        early = nrm_t <= tol_eff
        mt = _sub_scaled(s["mr"], alpha, map_)
        amt = q.matvec_dd(A, mt)
        qsi, eta = _qsi_eta_dd(s["it"] == 1, y, t, amt, spec.axis_name)
        u = q.add(q.scal(qsi, map_),
                  q.mul(q._bcast(eta, map_),
                        q.add(q.sub(s["mt_old"], s["mr"]),
                              q.scal(s["beta"], s["u"]))))
        z = q.sub(q.add(q.scal(qsi, s["mr"]), q.scal(eta, s["z"])),
                  q.scal(alpha, u))
        x_full = q.add(q.axpy(alpha, s["p"], s["x"]), z)
        r_full = q.sub(_sub_scaled(t, eta, y), q.scal(qsi, amt))
        nrm_full = _resid_dd(r_full, bnrm_inv, spec)
        conv_full = nrm_full <= tol_eff
        mr = _psolve_dd(M, r_full)
        rho = q.dot(rtld, mr, spec.axis_name)
        broke2 = _z(rho) & ~early & ~conv_full
        beta = q.mul(q.div(rho, _safe(s["rho_old"], _z(s["rho_old"]))),
                     q.div(alpha, _safe(qsi, _z(qsi))))
        w = q.xpay(amt, beta, ap)
        p = q.add(mr, q.mul(q._bcast(beta, mr), q.sub(s["p"], u)))
        broke = broke1 | broke2
        x = q.where(early, q.axpy(alpha, s["p"], s["x"]), x_full)
        rr = q.where(early, t, r_full)
        nrm = jnp.where(early, nrm_t, nrm_full)
        k1 = lambda new, old: q.where(~broke1, new, old)
        return dict(it=s["it"] + 1,
                    flag=jnp.where(broke, C.LIS_BREAKDOWN, s["flag"]),
                    x=k1(x, s["x"]), r=k1(rr, s["r"]),
                    mr=k1(mr, s["mr"]), p=k1(p, s["p"]),
                    t=k1(t, s["t"]), w=k1(w, s["w"]),
                    u=k1(u, s["u"]), y=k1(y, s["y"]), z=k1(z, s["z"]),
                    mt_old=k1(mt, s["mt_old"]),
                    beta=q.where(~broke1, beta, s["beta"]),
                    rho_old=q.where(broke, s["rho_old"], rho),
                    nrm=jnp.where(broke1, s["nrm"], nrm),
                    rh=record(s["rh"], s["it"],
                              jnp.where(broke1, s["nrm"], nrm)))

    final = krylov_loop(spec, tol_eff, state, step)
    out = loop_output(spec, tol_eff, final)
    return out._replace(x=q.to_float(final["x"]))


@register_solver("bicgsafe_quad")
def bicgsafe_quad(A, b, x0, M, spec: SolverSpec, aux=None) -> SolverOutput:
    r, bnrm_inv, tol_eff, nrm0 = _init_dd(A, b, x0, spec)
    rh = new_rhistory(spec, nrm0, jnp.float64)
    z0 = q.zeros_like(r)
    rtld = r
    mr = _psolve_dd(M, r)
    amr = q.matvec_dd(A, mr)
    rho_old = q.dot(rtld, r, spec.axis_name)
    zero = q.dd(jnp.asarray(0.0, b.dtype))

    state = dict(it=jnp.asarray(1), flag=jnp.asarray(RUNNING),
                 x=q.dd(x0), r=r, mr=mr, amr=amr, p=mr, ap=amr,
                 u=z0, au=z0, y=z0, z=z0, beta=zero, rho_old=rho_old,
                 nrm=nrm0, rh=rh)

    def step(s):
        tdot = q.dot(rtld, s["ap"], spec.axis_name)
        alpha = q.div(s["rho_old"], _safe(tdot, _z(tdot)))
        qsi, eta = _qsi_eta_dd(s["it"] == 1, s["y"], s["r"], s["amr"],
                               spec.axis_name)
        t = q.add(q.scal(qsi, s["ap"]), q.scal(eta, s["y"]))
        mt = _psolve_dd(M, t)
        u = q.axpy(q.mul(eta, s["beta"]), s["u"], mt)
        au = q.matvec_dd(A, u)
        z = q.sub(q.add(q.scal(qsi, s["mr"]), q.scal(eta, s["z"])),
                  q.scal(alpha, u))
        y = q.sub(q.add(q.scal(qsi, s["amr"]), q.scal(eta, s["y"])),
                  q.scal(alpha, au))
        x = q.add(q.axpy(alpha, s["p"], s["x"]), z)
        r = q.sub(_sub_scaled(s["r"], alpha, s["ap"]), y)
        nrm = _resid_dd(r, bnrm_inv, spec)
        conv = nrm <= tol_eff
        rho = q.dot(rtld, r, spec.axis_name)
        broke = _z(rho) & ~conv
        beta = q.mul(q.div(rho, _safe(s["rho_old"], _z(s["rho_old"]))),
                     q.div(alpha, _safe(qsi, _z(qsi))))
        mr = _psolve_dd(M, r)
        amr = q.matvec_dd(A, mr)
        p = q.add(mr, q.mul(q._bcast(beta, mr), q.sub(s["p"], u)))
        ap = q.add(amr, q.mul(q._bcast(beta, amr), q.sub(s["ap"], au)))
        return dict(it=s["it"] + 1,
                    flag=jnp.where(broke, C.LIS_BREAKDOWN, s["flag"]),
                    x=x, r=r, mr=mr, amr=amr, p=p, ap=ap,
                    u=u, au=au, y=y, z=z, beta=beta,
                    rho_old=q.where(broke, s["rho_old"], rho),
                    nrm=nrm, rh=record(s["rh"], s["it"], nrm))

    final = krylov_loop(spec, tol_eff, state, step)
    out = loop_output(spec, tol_eff, final)
    return out._replace(x=q.to_float(final["x"]))


@register_solver("bicrsafe_quad")
def bicrsafe_quad(A, b, x0, M, spec: SolverSpec, aux=None) -> SolverOutput:
    r, bnrm_inv, tol_eff, nrm0 = _init_dd(A, b, x0, spec)
    rh = new_rhistory(spec, nrm0, jnp.float64)
    z0 = q.zeros_like(r)
    rtld = r
    artld = q.matvech_dd(A, rtld)
    mr = _psolve_dd(M, r)
    amr = q.matvec_dd(A, mr)
    rho_old = q.dot(rtld, amr, spec.axis_name)
    zero = q.dd(jnp.asarray(0.0, b.dtype))

    state = dict(it=jnp.asarray(1), flag=jnp.asarray(RUNNING),
                 x=q.dd(x0), r=r, mr=mr, amr=amr, p=mr, ap=amr,
                 u=z0, au=z0, y=z0, my=z0, z=z0, beta=zero,
                 rho_old=rho_old, nrm=nrm0, rh=rh)

    def step(s):
        map_ = _psolve_dd(M, s["ap"])
        tdot = q.dot(artld, map_, spec.axis_name)
        alpha = q.div(s["rho_old"], _safe(tdot, _z(tdot)))
        qsi, eta = _qsi_eta_dd(s["it"] == 1, s["y"], s["r"], s["amr"],
                               spec.axis_name)
        u = q.add(q.add(q.scal(qsi, map_), q.scal(eta, s["my"])),
                  q.scal(q.mul(eta, s["beta"]), s["u"]))
        au = q.matvec_dd(A, u)
        z = q.sub(q.add(q.scal(qsi, s["mr"]), q.scal(eta, s["z"])),
                  q.scal(alpha, u))
        y = q.sub(q.add(q.scal(qsi, s["amr"]), q.scal(eta, s["y"])),
                  q.scal(alpha, au))
        my = _psolve_dd(M, y)
        x = q.add(q.axpy(alpha, s["p"], s["x"]), z)
        r = q.sub(_sub_scaled(s["r"], alpha, s["ap"]), y)
        nrm = _resid_dd(r, bnrm_inv, spec)
        conv = nrm <= tol_eff
        mr = q.sub(_sub_scaled(s["mr"], alpha, map_), my)
        amr = q.matvec_dd(A, mr)
        rho = q.dot(rtld, amr, spec.axis_name)
        broke = _z(rho) & ~conv
        beta = q.mul(q.div(rho, _safe(s["rho_old"], _z(s["rho_old"]))),
                     q.div(alpha, _safe(qsi, _z(qsi))))
        p = q.add(mr, q.mul(q._bcast(beta, mr), q.sub(s["p"], u)))
        ap = q.add(amr, q.mul(q._bcast(beta, amr), q.sub(s["ap"], au)))
        return dict(it=s["it"] + 1,
                    flag=jnp.where(broke, C.LIS_BREAKDOWN, s["flag"]),
                    x=x, r=r, mr=mr, amr=amr, p=p, ap=ap,
                    u=u, au=au, y=y, my=my, z=z, beta=beta,
                    rho_old=q.where(broke, s["rho_old"], rho),
                    nrm=nrm, rh=record(s["rh"], s["it"], nrm))

    final = krylov_loop(spec, tol_eff, state, step)
    out = loop_output(spec, tol_eff, final)
    return out._replace(x=q.to_float(final["x"]))


@register_solver("tfqmr_quad")
def tfqmr_quad(A, b, x0, M, spec: SolverSpec, aux=None) -> SolverOutput:
    r, bnrm_inv, tol_eff, nrm0 = _init_dd(A, b, x0, spec)
    rh = new_rhistory(spec, nrm0, jnp.float64)
    one = _one(b.dtype)
    zero = q.dd(jnp.asarray(0.0, b.dtype))
    rtld = r
    p = r
    u = r
    d = q.zeros_like(r)
    vv = q.matvec_dd(A, _psolve_dd(M, p))
    rhoold = q.dot(r, rtld, spec.axis_name)
    tau = q.nrm2(r, spec.axis_name)

    state = dict(it=jnp.asarray(1), flag=jnp.asarray(RUNNING),
                 x=q.dd(x0), r=r, p=p, u=u, d=d, vv=vv,
                 rhoold=rhoold, tau=tau, wold=tau, theta=zero, eta=zero,
                 nrm=nrm0, rh=rh)

    def half_step(carry, inputs):
        x, d, tau, theta, eta, alpha = carry
        ww, vec = inputs
        coef = q.div(q.mul(q.mul(theta, theta), eta),
                     _safe(alpha, _z(alpha)))
        d = q.axpy(coef, d, vec)
        theta = q.div(ww, _safe(tau, _z(tau)))
        c = q.div(one, q.sqrt(q.add(one, q.mul(theta, theta))))
        eta = q.mul(q.mul(c, c), alpha)
        tau = q.mul(q.mul(tau, theta), c)
        x = q.axpy(eta, _psolve_dd(M, d), x)
        return x, d, tau, theta, eta

    def step(s):
        sdot = q.dot(s["vv"], rtld, spec.axis_name)
        broke1 = _z(sdot)
        alpha = q.div(s["rhoold"], _safe(sdot, broke1))
        qvec = _sub_scaled(s["u"], alpha, s["vv"])
        t = q.add(s["u"], qvec)
        vv = q.matvec_dd(A, _psolve_dd(M, t))
        r = _sub_scaled(s["r"], alpha, vv)
        w = q.nrm2(r, spec.axis_name)

        x, d, tau, theta, eta = half_step(
            (s["x"], s["d"], s["tau"], s["theta"], s["eta"], alpha),
            (q.sqrt(q.mul(w, s["wold"])), s["u"]))
        nrm_a = q.to_float(tau) * bnrm_inv
        early = nrm_a <= tol_eff
        x2, d2, tau2, theta2, eta2 = half_step(
            (x, d, tau, theta, eta, alpha), (w, qvec))
        nrm_b = q.to_float(tau2) * jnp.sqrt(2.0) * bnrm_inv

        x = q.where(early, x, x2)
        d = q.where(early, d, d2)
        tau = q.where(early, tau, tau2)
        theta = q.where(early, theta, theta2)
        eta = q.where(early, eta, eta2)
        nrm = jnp.where(early, nrm_a, nrm_b)

        rho = q.dot(r, rtld, spec.axis_name)
        broke2 = _z(rho) & ~early & (nrm > tol_eff)
        beta = q.div(rho, _safe(s["rhoold"], _z(s["rhoold"])))
        u = q.axpy(beta, qvec, r)
        p = q.add(u, q.mul(q._bcast(beta, u),
                           q.add(qvec, q.scal(beta, s["p"]))))
        vv_next = q.matvec_dd(A, _psolve_dd(M, p))
        broke = broke1 | broke2
        k1 = lambda new, old: q.where(~broke1, new, old)
        return dict(it=s["it"] + 1,
                    flag=jnp.where(broke, C.LIS_BREAKDOWN, s["flag"]),
                    x=k1(x, s["x"]), r=k1(r, s["r"]), p=k1(p, s["p"]),
                    u=k1(u, s["u"]), d=k1(d, s["d"]),
                    vv=k1(vv_next, s["vv"]),
                    rhoold=q.where(broke, s["rhoold"], rho),
                    tau=k1(tau, s["tau"]), wold=k1(w, s["wold"]),
                    theta=k1(theta, s["theta"]), eta=k1(eta, s["eta"]),
                    nrm=jnp.where(broke1, s["nrm"], nrm),
                    rh=record(s["rh"], s["it"],
                              jnp.where(broke1, s["nrm"], nrm)))

    final = krylov_loop(spec, tol_eff, state, step)
    out = loop_output(spec, tol_eff, final)
    return out._replace(x=q.to_float(final["x"]))


@register_solver("orthomin_quad")
def orthomin_quad(A, b, x0, M, spec: SolverSpec, aux=None) -> SolverOutput:
    m = spec.restart
    n = b.shape[0]
    r, bnrm_inv, tol_eff, nrm0 = _init_dd(A, b, x0, spec)
    rtld = _psolve_dd(M, r)
    rh = new_rhistory(spec, nrm0, jnp.float64)
    one = _one(b.dtype)
    zero = q.dd(jnp.asarray(0.0, b.dtype))

    state = dict(it=jnp.asarray(1), flag=jnp.asarray(RUNNING),
                 x=q.dd(x0), r=r, rtld=rtld,
                 P=_zeros((m + 1, n), b.dtype), AP=_zeros((m + 1, n), b.dtype),
                 APT=_zeros((m + 1, n), b.dtype), dotsave=_zeros(m + 1, b.dtype),
                 nrm=nrm0, rh=rh)

    def step(s):
        it = s["it"]
        ip = (it - 1) % (m + 1)
        p_new = s["rtld"]
        ap_new = q.matvec_dd(A, p_new)
        apt_new = _psolve_dd(M, ap_new)
        lmax = jnp.minimum(m, it - 1)

        def ortho(l, carry):
            p_new, ap_new, apt_new = carry
            ip0 = (ip + m + 1 - l) % (m + 1)
            beta = q.neg(q.mul(q.dot(apt_new, _row(s["APT"], ip0),
                                     spec.axis_name),
                               _get1(s["dotsave"], l - 1)))
            bz = q.where(l <= lmax, beta, zero)
            return (q.axpy(bz, _row(s["P"], ip0), p_new),
                    q.axpy(bz, _row(s["AP"], ip0), ap_new),
                    q.axpy(bz, _row(s["APT"], ip0), apt_new))

        p_new, ap_new, apt_new = jax.lax.fori_loop(
            1, m + 1, ortho, (p_new, ap_new, apt_new))

        dot0 = q.dot(apt_new, apt_new, spec.axis_name)
        broke = _z(dot0)
        dot0_inv = q.div(one, _safe(dot0, broke))
        dotsave = _set1(DD(jnp.roll(s["dotsave"].hi, 1),
                           jnp.roll(s["dotsave"].lo, 1)), 0, dot0_inv)
        alpha = q.mul(q.dot(s["rtld"], apt_new, spec.axis_name), dot0_inv)
        x = q.axpy(alpha, p_new, s["x"])
        r = _sub_scaled(s["r"], alpha, ap_new)
        rtld = _sub_scaled(s["rtld"], alpha, apt_new)
        nrm = _resid_dd(r, bnrm_inv, spec)
        k = lambda new, old: q.where(~broke, new, old)
        return dict(it=it + 1,
                    flag=jnp.where(broke, C.LIS_BREAKDOWN, s["flag"]),
                    x=k(x, s["x"]), r=k(r, s["r"]),
                    rtld=k(rtld, s["rtld"]),
                    P=_setrow(s["P"], ip, p_new),
                    AP=_setrow(s["AP"], ip, ap_new),
                    APT=_setrow(s["APT"], ip, apt_new),
                    dotsave=q.where(~broke, dotsave, s["dotsave"]),
                    nrm=jnp.where(broke, s["nrm"], nrm),
                    rh=record(s["rh"], it, jnp.where(broke, s["nrm"], nrm)))

    final = krylov_loop(spec, tol_eff, state, step)
    out = loop_output(spec, tol_eff, final)
    return out._replace(x=q.to_float(final["x"]))


def _roll0(X: DD, shift: int) -> DD:
    return DD(jnp.roll(X.hi, shift, axis=0), jnp.roll(X.lo, shift, axis=0))


@register_solver("bicgstabl_quad")
def bicgstabl_quad(A, b, x0, M, spec: SolverSpec, aux=None) -> SolverOutput:
    l = spec.ell
    n = b.shape[0]
    r0, bnrm_inv, tol_eff, nrm0 = _init_dd(A, b, x0, spec)
    rh = new_rhistory(spec, nrm0, jnp.float64)
    one = _one(b.dtype)
    zero = q.dd(jnp.asarray(0.0, b.dtype))
    rtld = r0

    R = _setrow(_zeros((l + 1, n), b.dtype), 0, r0)
    U = _zeros((l + 1, n), b.dtype)

    state = dict(it=jnp.asarray(0), flag=jnp.asarray(RUNNING),
                 xc=q.zeros_like(r0), R=R, U=U,
                 alpha=zero, omega=one, rho0=one, nrm=nrm0, rh=rh)

    def bicg_part(s):
        rho0 = q.neg(q.mul(s["omega"], s["rho0"]))

        def jstep(j, carry):
            (xc, R, U, alpha, rho0, nrm, rh, it, flag) = carry
            active = flag == RUNNING
            rho1 = q.dot(rtld, _row(R, j), spec.axis_name)
            broke1 = _z(rho1) & active
            beta = q.mul(alpha, q.div(rho1, _safe(rho0, _z(rho0))))
            rows = (jnp.arange(l + 1)[:, None] <= j) & active
            U = q.where(rows, q.sub(R, q.scal(beta, U)), U)
            t = _psolve_dd(M, _row(U, j))
            U = _setrow(U, j + 1, q.where(active, q.matvec_dd(A, t),
                                          _row(U, j + 1)))
            nu = q.dot(rtld, _row(U, j + 1), spec.axis_name)
            broke2 = _z(nu) & active
            alpha_new = q.div(rho1, _safe(nu, _z(nu)))
            xc = q.where(active, q.axpy(alpha_new, _row(U, 0), xc), xc)
            R = q.where(rows, q.sub(R, q.scal(alpha_new, _roll0(U, -1))), R)
            nrm_new = _resid_dd(_row(R, 0), bnrm_inv, spec)
            it = jnp.where(active, it + 1, it)
            slot = jnp.minimum(it, spec.maxiter + 1)
            rh = rh.at[slot].set(jnp.where(active, nrm_new, rh[slot]))
            conv = (nrm_new <= tol_eff) & active
            t2 = _psolve_dd(M, _row(R, j))
            R = _setrow(R, j + 1, q.where(active & ~conv,
                                          q.matvec_dd(A, t2),
                                          _row(R, j + 1)))
            flag = jnp.where(broke1 | broke2, C.LIS_BREAKDOWN, flag)
            flag = jnp.where(conv, -1, flag)
            return (xc, R, U,
                    q.where(active, alpha_new, alpha),
                    q.where(active, rho1, rho0),
                    jnp.where(active, nrm_new, nrm), rh, it, flag)

        carry = (s["xc"], s["R"], s["U"], s["alpha"], rho0,
                 s["nrm"], s["rh"], s["it"], s["flag"])
        return jax.lax.fori_loop(0, l, jstep, carry)

    def mr_part(xc, R, U, rh, it):
        tau = _zeros((l + 1, l + 1), b.dtype)
        sigma = _zeros(l + 1, b.dtype)
        gamma1 = _zeros(l + 1, b.dtype)

        def jloop(j, carry):
            R, tau, sigma, gamma1 = carry

            def iloop(i, carry2):
                R, tau = carry2
                si = _get1(sigma, i)
                nu = q.div(q.dot(_row(R, j), _row(R, i), spec.axis_name),
                           _safe(si, _z(si)))
                use = (i >= 1) & (i <= j - 1)
                nu = q.where(use, nu, zero)
                tau = _set1(tau, (i, j), q.where(use, nu,
                                                 DD(tau.hi[i, j],
                                                    tau.lo[i, j])))
                R = _setrow(R, j, _sub_scaled(_row(R, j), nu, _row(R, i)))
                return (R, tau)
            R, tau = jax.lax.fori_loop(1, l, iloop, (R, tau))
            sj = q.dot(_row(R, j), _row(R, j), spec.axis_name)
            sigma_new = _set1(sigma, j, sj)
            g1 = q.div(q.dot(_row(R, 0), _row(R, j), spec.axis_name),
                       _safe(sj, _z(sj)))
            gamma1 = _set1(gamma1, j, g1)
            return (R, tau, sigma_new, gamma1)

        R, tau, sigma, gamma1 = jax.lax.fori_loop(
            1, l + 1, jloop, (R, tau, sigma, gamma1))

        gamma = _set1(_zeros(l + 1, b.dtype), l, _get1(gamma1, l))
        omega = _get1(gamma1, l)

        def gback(jj, gamma):
            j = l - 1 - (jj - 1)
            idx = jnp.arange(l + 1)
            prods = q.mul(_row(tau, j), gamma)
            nu = q._dd_sum(q.where(idx > j, prods, _zeros(l + 1, b.dtype)))
            return _set1(gamma, j, q.sub(_get1(gamma1, j), nu))
        gamma = jax.lax.fori_loop(1, l, gback, gamma)

        gamma2 = _zeros(l + 1, b.dtype)

        def g2loop(j, gamma2):
            idx = jnp.arange(l + 1)
            prods = q.mul(_row(tau, j), _roll0(gamma, -1))
            nu = q._dd_sum(q.where((idx > j) & (idx <= l - 1), prods,
                                   _zeros(l + 1, b.dtype)))
            return _set1(gamma2, j,
                         q.add(_get1(gamma, jnp.minimum(j + 1, l)), nu))
        gamma2 = jax.lax.fori_loop(1, l, g2loop, gamma2)

        xc = q.axpy(_get1(gamma, 1), _row(R, 0), xc)
        r_new = _sub_scaled(_row(R, 0), _get1(gamma1, l), _row(R, l))
        u_new = _sub_scaled(_row(U, 0), _get1(gamma, l), _row(U, l))

        def upd(j, carry):
            xc, r_new, u_new = carry
            u_new = _sub_scaled(u_new, _get1(gamma, j), _row(U, j))
            xc = q.axpy(_get1(gamma2, j), _row(R, j), xc)
            r_new = _sub_scaled(r_new, _get1(gamma1, j), _row(R, j))
            return (xc, r_new, u_new)
        xc, r_new, u_new = jax.lax.fori_loop(1, l, upd, (xc, r_new, u_new))
        R = _setrow(R, 0, r_new)
        U = _setrow(U, 0, u_new)
        nrm = _resid_dd(_row(R, 0), bnrm_inv, spec)
        rh = rh.at[jnp.minimum(it, spec.maxiter + 1)].set(nrm)
        return xc, R, U, omega, nrm, rh

    def outer(s):
        (xc, R, U, alpha, rho0, nrm, rh, it, flag) = bicg_part(s)
        do_mr = flag == RUNNING
        xc2, R2, U2, omega2, nrm2, rh2 = mr_part(xc, R, U, rh, it)
        sel = lambda a2, a1: q.where(do_mr, a2, a1)
        return dict(it=it, flag=jnp.where(flag == -1, RUNNING, flag),
                    xc=sel(xc2, xc), R=sel(R2, R), U=sel(U2, U),
                    alpha=alpha, omega=sel(omega2, s["omega"]),
                    rho0=rho0, nrm=jnp.where(do_mr, nrm2, nrm),
                    rh=jnp.where(do_mr, rh2, rh))

    def cond(s):
        return (s["it"] <= spec.maxiter) & (s["nrm"] > tol_eff) \
            & (s["flag"] == RUNNING)

    final = jax.lax.while_loop(cond, outer, state)
    x = q.add(_psolve_dd(M, final["xc"]), q.dd(x0))
    out = dict(final)
    out["x"] = x
    out["it"] = final["it"] + 1
    out2 = loop_output(spec, tol_eff, out)
    return out2._replace(x=q.to_float(x))


def _gmres_core_dd(A, b, x0, M, spec: SolverSpec,
                   flexible: bool) -> SolverOutput:
    m = spec.restart
    n = b.shape[0]
    r, bnrm_inv, tol_eff, nrm0 = _init_dd(A, b, x0, spec)
    rh = new_rhistory(spec, nrm0, jnp.float64)
    one = _one(b.dtype)
    zero = q.dd(jnp.asarray(0.0, b.dtype))
    bdd = q.dd(b)

    def inner_step(carry):
        (i, it, V, Z, H, cs, sn, svec, nrm, rh) = carry
        vi = _row(V, i)
        z = _psolve_dd(M, vi)
        w = q.matvec_dd(A, z)
        Z = _setrow(Z, i, z) if flexible else Z

        def mgs(k, wh):
            w, H = wh
            t = q.dot(w, _row(V, k), spec.axis_name)
            use = k <= i
            w = q.where(use, _sub_scaled(w, t, _row(V, k)), w)
            H = _set1(H, (k, i), q.where(use, t, DD(H.hi[k, i], H.lo[k, i])))
            return (w, H)
        w, H = jax.lax.fori_loop(0, i + 1, mgs, (w, H))

        t = q.nrm2(w, spec.axis_name)
        H = _set1(H, (i + 1, i), t)
        tinv = q.div(one, _safe(t, _z(t)))
        V = _setrow(V, i + 1, q.scal(tinv, w))

        def rot(k, H):
            hk = DD(H.hi[k, i], H.lo[k, i])
            hk1 = DD(H.hi[k + 1, i], H.lo[k + 1, i])
            a = q.add(q.mul(_get1(cs, k), hk), q.mul(_get1(sn, k), hk1))
            bv = q.sub(q.mul(_get1(cs, k), hk1), q.mul(_get1(sn, k), hk))
            H = _set1(H, (k, i), a)
            return _set1(H, (k + 1, i), bv)
        H = jax.lax.fori_loop(0, i, rot, H)

        aa = DD(H.hi[i, i], H.lo[i, i])
        bb = DD(H.hi[i + 1, i], H.lo[i + 1, i])
        rr = q.sqrt(q.add(q.mul(aa, aa), q.mul(bb, bb)))
        rr = q.where(_z(rr), q.dd(jnp.asarray(1.0e-17, b.dtype)), rr)
        ci, si = q.div(aa, rr), q.div(bb, rr)
        cs2, sn2 = _set1(cs, i, ci), _set1(sn, i, si)
        svi = _get1(svec, i)
        svec2 = _set1(svec, i + 1, q.neg(q.mul(si, svi)))
        svec2 = _set1(svec2, i, q.mul(ci, svi))
        H = _set1(H, (i, i), q.add(q.mul(ci, aa), q.mul(si, bb)))

        nrm = jnp.abs(q.to_float(_get1(svec2, i + 1))) \
            * (bnrm_inv if spec.conv_cond != 2 else 1.0)
        rh = rh.at[jnp.minimum(it, spec.maxiter + 1)].set(nrm)
        return (i + 1, it + 1, V, Z, H, cs2, sn2, svec2, nrm, rh)

    def inner_cond(carry):
        i, it, nrm = carry[0], carry[1], carry[8]
        return (i < m) & (it <= spec.maxiter) & (nrm > tol_eff)

    def outer_step(s):
        x, r, it, nrm, rh = s["x"], s["r"], s["it"], s["nrm"], s["rh"]
        rnorm = q.nrm2(r, spec.axis_name)
        rinv = q.div(one, _safe(rnorm, _z(rnorm)))
        V = _setrow(_zeros((m + 1, n), b.dtype), 0, q.scal(rinv, r))
        Z = _zeros((m if flexible else 1, n), b.dtype)
        H = _zeros((m + 1, m), b.dtype)
        cs = _zeros(m + 1, b.dtype)
        sn = _zeros(m + 1, b.dtype)
        svec = _set1(_zeros(m + 2, b.dtype), 0, rnorm)

        carry = (jnp.asarray(0), it, V, Z, H, cs, sn, svec, nrm, rh)
        carry = jax.lax.while_loop(inner_cond, inner_step, carry)
        (i_fin, it, V, Z, H, cs, sn, svec, nrm, rh) = carry

        # DD back-substitution on the padded upper-triangular H
        valid = jnp.arange(m) < i_fin
        y = _zeros(m, b.dtype)

        def back(kk, y):
            i = m - 1 - kk
            prods = q.mul(DD(H.hi[i, :], H.lo[i, :]), y)
            idx = jnp.arange(m)
            ssum = q._dd_sum(q.where(idx > i, prods, _zeros(m, b.dtype)))
            hii = DD(H.hi[i, i], H.lo[i, i])
            hii = q.where(valid[i], hii, one)
            yi = q.div(q.sub(_get1(svec, i), ssum), hii)
            yi = q.where(valid[i], yi, zero)
            return _set1(y, i, yi)
        y = jax.lax.fori_loop(0, m, back, y)

        def accum(i, dx):
            src = _row(Z, i) if flexible else _row(V, i)
            return q.axpy(_get1(y, i), src, dx)
        dx = jax.lax.fori_loop(0, m if flexible else m, accum,
                               _zeros(n, b.dtype))
        if not flexible:
            dx = _psolve_dd(M, dx)
        x = q.add(x, dx)
        r = q.sub(bdd, q.matvec_dd(A, x))
        return dict(x=x, r=r, it=it, nrm=nrm, rh=rh, flag=s["flag"])

    state = dict(x=q.dd(x0), r=r, it=jnp.asarray(1), nrm=nrm0, rh=rh,
                 flag=jnp.asarray(RUNNING))

    def outer_cond(s):
        return (s["it"] <= spec.maxiter) & (s["nrm"] > tol_eff)

    final = jax.lax.while_loop(outer_cond, outer_step, state)
    out = loop_output(spec, tol_eff, final)
    return out._replace(x=q.to_float(final["x"]))


@register_solver("gmres_quad")
def gmres_quad(A, b, x0, M, spec: SolverSpec, aux=None) -> SolverOutput:
    return _gmres_core_dd(A, b, x0, M, spec, flexible=False)


@register_solver("fgmres_quad")
def fgmres_quad(A, b, x0, M, spec: SolverSpec, aux=None) -> SolverOutput:
    return _gmres_core_dd(A, b, x0, M, spec, flexible=True)
