"""BiCGSTAB(l) (reference: lis_bicgstabl, src/solver/lis_solver_bicgstabl.c:123).

l BiCG steps followed by an l-dimensional minimal-residual polynomial step
(-ell, default 2).  Right-preconditioned in correction space: the Krylov
correction runs on A·M⁻¹ and the final solution is x = M⁻¹·correction + x₀.
The r/u direction stacks are (l+1, n) device matrices; the BiCG sweep is a
masked fori over j<l with dynamic row updates, the MR part is the small
Gram-system recurrence on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lis_tpu import config as C
from lis_tpu.core import vector as v
from lis_tpu.solvers.base import (RUNNING, SolverOutput, SolverSpec,
                                  init_residual, loop_output, new_rhistory,
                                  register_solver, residual_norm)


def _cj(x):
    return jnp.conj(x) if jnp.iscomplexobj(x) else x


@register_solver("bicgstabl")
def bicgstabl(A, b, x0, M, spec: SolverSpec, aux=None) -> SolverOutput:
    l = spec.ell
    n = b.shape[0]
    r0, bnrm_inv, tol_eff, nrm0 = init_residual(A, b, x0, spec)
    rh = new_rhistory(spec, nrm0, jnp.real(b).dtype)
    one = jnp.asarray(1.0, dtype=b.dtype)
    rtld = _cj(r0)
    dt = b.dtype

    R = jnp.zeros((l + 1, n), dtype=dt).at[0].set(r0)
    U = jnp.zeros((l + 1, n), dtype=dt)

    state = dict(it=jnp.asarray(0), flag=jnp.asarray(RUNNING),
                 xc=jnp.zeros_like(b),      # correction in precon space
                 R=R, U=U,
                 alpha=jnp.asarray(0.0, dt), omega=one, rho0=one,
                 nrm=nrm0, rh=rh)

    def bicg_part(s):
        rho0 = -s["omega"] * s["rho0"]

        def jstep(j, carry):
            (xc, R, U, alpha, rho0, nrm, rh, it, flag) = carry
            active = flag == RUNNING
            rho1 = v.dot(rtld, R[j], spec.axis_name)
            broke1 = (rho1 == 0.0) & active
            beta = alpha * (rho1 / jnp.where(rho0 == 0, one, rho0))
            rows = jnp.arange(l + 1)[:, None] <= j
            U = jnp.where(rows & active, R - beta * U, U)
            t = M.psolve(U[j])
            U = U.at[j + 1].set(jnp.where(active, A.matvec(t), U[j + 1]))
            nu = v.dot(rtld, U[j + 1], spec.axis_name)
            broke2 = (nu == 0.0) & active
            alpha_new = rho1 / jnp.where(nu == 0, one, nu)
            xc = jnp.where(active, xc + alpha_new * U[0], xc)
            shift_rows = jnp.arange(l + 1)[:, None] <= j
            R = jnp.where(shift_rows & active,
                          R - alpha_new * jnp.roll(U, -1, axis=0), R)
            nrm_new = residual_norm(R[0], bnrm_inv, spec)
            it = jnp.where(active, it + 1, it)
            rh = rh.at[jnp.minimum(it, spec.maxiter + 1)].set(
                jnp.where(active, nrm_new, rh[jnp.minimum(it, spec.maxiter + 1)]))
            conv = (nrm_new <= tol_eff) & active
            t2 = M.psolve(R[j])
            R = R.at[j + 1].set(jnp.where(active & ~conv,
                                          A.matvec(t2), R[j + 1]))
            flag = jnp.where(broke1 | broke2, C.LIS_BREAKDOWN, flag)
            flag = jnp.where(conv, -1, flag)      # -1: converged sentinel
            return (xc, R, U,
                    jnp.where(active, alpha_new, alpha),
                    jnp.where(active, rho1, rho0),
                    jnp.where(active, nrm_new, nrm), rh, it, flag)

        carry = (s["xc"], s["R"], s["U"], s["alpha"], rho0,
                 s["nrm"], s["rh"], s["it"], s["flag"])
        return jax.lax.fori_loop(0, l, jstep, carry)

    def mr_part(xc, R, U, rh, it):
        # MGS of R[1..l] + gamma recurrences (the reference's tau/sigma loops)
        tau = jnp.zeros((l + 1, l + 1), dtype=dt)
        sigma = jnp.zeros(l + 1, dtype=dt)
        gamma1 = jnp.zeros(l + 1, dtype=dt)

        def jloop(j, carry):
            R, tau, sigma, gamma1 = carry

            def iloop(i, carry2):
                R, tau = carry2
                nu = v.dot(R[j], R[i], spec.axis_name) \
                    / jnp.where(sigma[i] == 0, one, sigma[i])
                use = (i >= 1) & (i <= j - 1)
                nu = jnp.where(use, nu, 0.0)
                tau = tau.at[i, j].set(jnp.where(use, nu, tau[i, j]))
                R = R.at[j].set(R[j] - nu * R[i])
                return (R, tau)
            R, tau = jax.lax.fori_loop(1, l, iloop, (R, tau))
            sj = v.dot(R[j], R[j], spec.axis_name)
            sigma_new = sigma.at[j].set(sj)
            g1 = v.dot(R[0], R[j], spec.axis_name) \
                / jnp.where(sj == 0, one, sj)
            gamma1 = gamma1.at[j].set(g1)
            return (R, tau, sigma_new, gamma1)

        R, tau, sigma, gamma1 = jax.lax.fori_loop(
            1, l + 1, jloop, (R, tau, sigma, gamma1))

        gamma = jnp.zeros(l + 1, dtype=dt).at[l].set(gamma1[l])
        omega = gamma1[l]

        def gback(jj, gamma):
            j = l - 1 - (jj - 1)          # j = l-1 .. 1
            idx = jnp.arange(l + 1)
            nu = jnp.sum(jnp.where(idx > j, tau[j] * gamma, 0.0))
            return gamma.at[j].set(gamma1[j] - nu)
        gamma = jax.lax.fori_loop(1, l, gback, gamma)

        gamma2 = jnp.zeros(l + 1, dtype=dt)

        def g2loop(j, gamma2):
            idx = jnp.arange(l + 1)
            nu = jnp.sum(jnp.where((idx > j) & (idx <= l - 1),
                                   tau[j] * jnp.roll(gamma, -1), 0.0))
            return gamma2.at[j].set(gamma[jnp.minimum(j + 1, l)] + nu)
        gamma2 = jax.lax.fori_loop(1, l, g2loop, gamma2)

        xc = xc + gamma[1] * R[0]
        r_new = R[0] - gamma1[l] * R[l]
        u_new = U[0] - gamma[l] * U[l]

        def upd(j, carry):
            xc, r_new, u_new = carry
            u_new = u_new - gamma[j] * U[j]
            xc = xc + gamma2[j] * R[j]
            r_new = r_new - gamma1[j] * R[j]
            return (xc, r_new, u_new)
        xc, r_new, u_new = jax.lax.fori_loop(1, l, upd, (xc, r_new, u_new))
        R = R.at[0].set(r_new)
        U = U.at[0].set(u_new)
        nrm = residual_norm(R[0], bnrm_inv, spec)
        rh = rh.at[jnp.minimum(it, spec.maxiter + 1)].set(nrm)
        return xc, R, U, omega, nrm, rh

    def outer(s):
        (xc, R, U, alpha, rho0, nrm, rh, it, flag) = bicg_part(s)
        do_mr = flag == RUNNING
        xc2, R2, U2, omega2, nrm2, rh2 = mr_part(xc, R, U, rh, it)
        sel = lambda a2, a1: jnp.where(do_mr, a2, a1)
        return dict(it=it, flag=jnp.where(flag == -1, RUNNING, flag),
                    xc=sel(xc2, xc), R=sel(R2, R), U=sel(U2, U),
                    alpha=alpha, omega=sel(omega2, s["omega"]),
                    rho0=rho0, nrm=sel(nrm2, nrm), rh=sel(rh2, rh))

    def cond(s):
        return (s["it"] <= spec.maxiter) & (s["nrm"] > tol_eff) \
            & (s["flag"] == RUNNING)

    final = jax.lax.while_loop(cond, outer, state)
    # x = M⁻¹ (correction) + x0  (the reference's exit psolve + xp add)
    x = M.psolve(final["xc"]) + x0
    out = dict(final)
    out["x"] = x
    out["it"] = final["it"] + 1     # loop_output subtracts the step increment
    return loop_output(spec, tol_eff, out)
