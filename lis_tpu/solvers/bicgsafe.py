"""BiCGSafe and BiCRSafe — "safe" product-type variants.

Reference: lis_bicgsafe (src/solver/lis_solver_bicgsafe.c:145) and
lis_bicrsafe (:1048).  Same qsi/eta 2×2 stabilisation as GPBiCG but with the
associate residual kept explicitly (y), avoiding the unstable recurrences.
"""

from __future__ import annotations

import jax.numpy as jnp

from lis_tpu import config as C
from lis_tpu.core import vector as v
from lis_tpu.solvers.base import (RUNNING, SolverOutput, SolverSpec,
                                  init_residual, krylov_loop, loop_output,
                                  new_rhistory, record, register_solver,
                                  residual_norm)
from lis_tpu.solvers.gpbicg import _qsi_eta


def _cj(x):
    return jnp.conj(x) if jnp.iscomplexobj(x) else x


@register_solver("bicgsafe")
def bicgsafe(A, b, x0, M, spec: SolverSpec, aux=None) -> SolverOutput:
    r, bnrm_inv, tol_eff, nrm0 = init_residual(A, b, x0, spec)
    rh = new_rhistory(spec, nrm0, jnp.real(b).dtype)
    one = jnp.asarray(1.0, dtype=b.dtype)
    z0 = jnp.zeros_like(b)
    rtld = _cj(r)
    mr = M.psolve(r)
    amr = A.matvec(mr)
    rho_old = v.dot(rtld, r, spec.axis_name)

    state = dict(it=jnp.asarray(1), flag=jnp.asarray(RUNNING),
                 x=x0, r=r, mr=mr, amr=amr, p=mr, ap=amr,
                 u=z0, au=z0, y=z0, z=z0,
                 beta=jnp.asarray(0.0, b.dtype), rho_old=rho_old,
                 nrm=nrm0, rh=rh)

    def step(s):
        tdot = v.dot(rtld, s["ap"], spec.axis_name)
        alpha = s["rho_old"] / jnp.where(tdot == 0.0, one, tdot)
        qsi, eta = _qsi_eta(s["it"] == 1, s["y"], s["r"], s["amr"],
                            spec.axis_name)
        t = qsi * s["ap"] + eta * s["y"]
        mt = M.psolve(t)
        u = mt + eta * s["beta"] * s["u"]
        au = A.matvec(u)
        z = qsi * s["mr"] + eta * s["z"] - alpha * u
        y = qsi * s["amr"] + eta * s["y"] - alpha * au
        x = s["x"] + alpha * s["p"] + z
        r = s["r"] - alpha * s["ap"] - y
        nrm = residual_norm(r, bnrm_inv, spec)
        conv = nrm <= tol_eff
        rho = v.dot(rtld, r, spec.axis_name)
        broke = (rho == 0.0) & ~conv
        beta = (rho / jnp.where(s["rho_old"] == 0.0, one, s["rho_old"])) \
            * (alpha / jnp.where(qsi == 0.0, one, qsi))
        mr = M.psolve(r)
        amr = A.matvec(mr)
        p = mr + beta * (s["p"] - u)
        ap = amr + beta * (s["ap"] - au)
        return dict(it=s["it"] + 1,
                    flag=jnp.where(broke, C.LIS_BREAKDOWN, s["flag"]),
                    x=x, r=r, mr=mr, amr=amr, p=p, ap=ap,
                    u=u, au=au, y=y, z=z, beta=beta,
                    rho_old=jnp.where(broke, s["rho_old"], rho),
                    nrm=nrm, rh=record(s["rh"], s["it"], nrm))

    final = krylov_loop(spec, tol_eff, state, step)
    return loop_output(spec, tol_eff, final)


@register_solver("bicrsafe")
def bicrsafe(A, b, x0, M, spec: SolverSpec, aux=None) -> SolverOutput:
    r, bnrm_inv, tol_eff, nrm0 = init_residual(A, b, x0, spec)
    rh = new_rhistory(spec, nrm0, jnp.real(b).dtype)
    one = jnp.asarray(1.0, dtype=b.dtype)
    z0 = jnp.zeros_like(b)
    rtld = _cj(r)
    artld = A.matvech(rtld)
    mr = M.psolve(r)
    amr = A.matvec(mr)
    rho_old = v.dot(rtld, amr, spec.axis_name)

    state = dict(it=jnp.asarray(1), flag=jnp.asarray(RUNNING),
                 x=x0, r=r, mr=mr, amr=amr, p=mr, ap=amr,
                 u=z0, au=z0, y=z0, my=z0, z=z0,
                 beta=jnp.asarray(0.0, b.dtype), rho_old=rho_old,
                 nrm=nrm0, rh=rh)

    def step(s):
        map_ = M.psolve(s["ap"])
        tdot = v.dot(artld, map_, spec.axis_name)
        alpha = s["rho_old"] / jnp.where(tdot == 0.0, one, tdot)
        qsi, eta = _qsi_eta(s["it"] == 1, s["y"], s["r"], s["amr"],
                            spec.axis_name)
        u = qsi * map_ + eta * s["my"] + eta * s["beta"] * s["u"]
        au = A.matvec(u)
        z = qsi * s["mr"] + eta * s["z"] - alpha * u
        y = qsi * s["amr"] + eta * s["y"] - alpha * au
        my = M.psolve(y)
        x = s["x"] + alpha * s["p"] + z
        r = s["r"] - alpha * s["ap"] - y
        nrm = residual_norm(r, bnrm_inv, spec)
        conv = nrm <= tol_eff
        mr = s["mr"] - alpha * map_ - my
        amr = A.matvec(mr)
        rho = v.dot(rtld, amr, spec.axis_name)
        broke = (rho == 0.0) & ~conv
        beta = (rho / jnp.where(s["rho_old"] == 0.0, one, s["rho_old"])) \
            * (alpha / jnp.where(qsi == 0.0, one, qsi))
        p = mr + beta * (s["p"] - u)
        ap = amr + beta * (s["ap"] - au)
        return dict(it=s["it"] + 1,
                    flag=jnp.where(broke, C.LIS_BREAKDOWN, s["flag"]),
                    x=x, r=r, mr=mr, amr=amr, p=p, ap=ap,
                    u=u, au=au, y=y, my=my, z=z, beta=beta,
                    rho_old=jnp.where(broke, s["rho_old"], rho),
                    nrm=nrm, rh=record(s["rh"], s["it"], nrm))

    final = krylov_loop(spec, tol_eff, state, step)
    return loop_output(spec, tol_eff, final)
