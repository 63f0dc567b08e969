"""TFQMR (reference: lis_tfqmr, src/solver/lis_solver_qmr.c:113).

Transpose-free QMR with the reference's two half-steps per iteration
(m = 0, 1) unrolled in the loop body; the quasi-residual estimate
τ·√(1+m)/||b|| drives convergence.
"""

from __future__ import annotations

import jax.numpy as jnp

from lis_tpu import config as C
from lis_tpu.core import vector as v
from lis_tpu.solvers.base import (RUNNING, SolverOutput, SolverSpec,
                                  init_residual, krylov_loop, loop_output,
                                  new_rhistory, record, register_solver)


def _cj(x):
    return jnp.conj(x) if jnp.iscomplexobj(x) else x


@register_solver("tfqmr")
def tfqmr(A, b, x0, M, spec: SolverSpec, aux=None) -> SolverOutput:
    r, bnrm_inv, tol_eff, nrm0 = init_residual(A, b, x0, spec)
    rh = new_rhistory(spec, nrm0, jnp.real(b).dtype)
    one = jnp.asarray(1.0, dtype=b.dtype)
    rtld = _cj(r)
    p = r
    u = r
    d = jnp.zeros_like(b)
    vv = A.matvec(M.psolve(p))
    rhoold = v.dot(r, rtld, spec.axis_name)
    tau = v.nrm2(r, spec.axis_name)

    state = dict(it=jnp.asarray(1), flag=jnp.asarray(RUNNING),
                 x=x0, r=r, p=p, u=u, d=d, vv=vv,
                 rhoold=rhoold, tau=tau, wold=tau,
                 theta=jnp.asarray(0.0, b.dtype),
                 eta=jnp.asarray(0.0, b.dtype),
                 nrm=nrm0, rh=rh)

    def half_step(s_x_d, inputs):
        x, d, tau, theta, eta, alpha = s_x_d
        ww, vec = inputs
        d = vec + (theta * theta * eta / alpha) * d
        theta = ww / tau
        c = 1.0 / jnp.sqrt(1.0 + theta * theta)
        eta = c * c * alpha
        tau = tau * theta * c
        x = x + eta * M.psolve(d)
        return x, d, tau, theta, eta

    def step(s):
        sdot = v.dot(s["vv"], rtld, spec.axis_name)
        broke1 = sdot == 0.0
        alpha = s["rhoold"] / jnp.where(broke1, one, sdot)
        q = s["u"] - alpha * s["vv"]
        t = s["u"] + q
        vv = A.matvec(M.psolve(t))
        r = s["r"] - alpha * vv
        w = v.nrm2(r, spec.axis_name)

        # half-step m=0: ww = sqrt(w*wold), direction u
        x, d, tau, theta, eta = half_step(
            (s["x"], s["d"], s["tau"], s["theta"], s["eta"], alpha),
            (jnp.sqrt(w * s["wold"]), s["u"]))
        nrm_a = tau * jnp.sqrt(1.0) * bnrm_inv
        early = nrm_a <= tol_eff
        # half-step m=1: ww = w, direction q (masked if early)
        x2, d2, tau2, theta2, eta2 = half_step(
            (x, d, tau, theta, eta, alpha), (w, q))
        nrm_b = tau2 * jnp.sqrt(2.0) * bnrm_inv

        x = jnp.where(early, x, x2)
        d = jnp.where(early, d, d2)
        tau = jnp.where(early, tau, tau2)
        theta = jnp.where(early, theta, theta2)
        eta = jnp.where(early, eta, eta2)
        nrm = jnp.where(early, nrm_a, nrm_b)

        rho = v.dot(r, rtld, spec.axis_name)
        broke2 = (rho == 0.0) & ~early & (nrm > tol_eff)
        beta = rho / jnp.where(s["rhoold"] == 0.0, one, s["rhoold"])
        u = r + beta * q
        p = u + beta * (q + beta * s["p"])
        vv_next = A.matvec(M.psolve(p))
        broke = broke1 | broke2
        keep = lambda new, old: jnp.where(broke1, old, new)
        return dict(it=s["it"] + 1,
                    flag=jnp.where(broke, C.LIS_BREAKDOWN, s["flag"]),
                    x=keep(x, s["x"]), r=keep(r, s["r"]),
                    p=keep(p, s["p"]), u=keep(u, s["u"]), d=keep(d, s["d"]),
                    vv=keep(vv_next, s["vv"]),
                    rhoold=jnp.where(broke, s["rhoold"], rho),
                    tau=keep(tau, s["tau"]), wold=keep(w, s["wold"]),
                    theta=keep(theta, s["theta"]), eta=keep(eta, s["eta"]),
                    nrm=keep(nrm, s["nrm"]),
                    rh=record(s["rh"], s["it"],
                              jnp.where(broke1, s["nrm"], nrm)))

    final = krylov_loop(spec, tol_eff, state, step)
    return loop_output(spec, tol_eff, final)
