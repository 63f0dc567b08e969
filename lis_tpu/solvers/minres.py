"""MINRES (reference: lis_minres, src/solver/lis_solver_minres.c:121).

Left-preconditioned Lanczos with Givens QR on the tridiagonal; convergence
measures the preconditioned residual ||M⁻¹r|| / ||M⁻¹r₀|| (the reference
ignores conv_cond here).
"""

from __future__ import annotations

import jax.numpy as jnp

from lis_tpu.core import vector as v
from lis_tpu.solvers.base import (RUNNING, SolverOutput, SolverSpec,
                                  krylov_loop, loop_output, new_rhistory,
                                  record, register_solver)


@register_solver("minres")
def minres(A, b, x0, M, spec: SolverSpec, aux=None) -> SolverOutput:
    v2 = b - A.matvec(x0)
    v2 = M.psolve(v2)
    r0_euc = v.nrm2(v2, spec.axis_name)
    r0_inv = jnp.where(r0_euc == 0, 1.0, 1.0 / jnp.where(r0_euc == 0, 1.0, r0_euc))
    nrm0 = r0_euc * r0_inv
    rh = new_rhistory(spec, nrm0, jnp.real(b).dtype)
    zero = jnp.zeros_like(b)

    state = dict(it=jnp.asarray(1), flag=jnp.asarray(RUNNING), x=x0,
                 v1=zero, v2=v2, w0=zero, w1=zero,
                 # eta is LIS_SCALAR in the reference (complex under
                 # _COMPLEX, lis_solver_minres.c:131); beta2/beta3 stay real
                 beta2=r0_euc, eta=r0_euc.astype(b.dtype),
                 gamma1=jnp.asarray(1.0, b.dtype),
                 gamma2=jnp.asarray(1.0, b.dtype),
                 sigma1=jnp.asarray(0.0, b.dtype),
                 sigma2=jnp.asarray(0.0, b.dtype),
                 r_euc=r0_euc, nrm=nrm0, rh=rh)

    def step(s):
        v2n = s["v2"] / s["beta2"]
        v3 = A.matvec(v2n)
        v4 = M.psolve(v3)
        alpha = v.dot(v2n, v4, spec.axis_name)
        v4 = v4 - alpha * v2n - s["beta2"] * s["v1"]
        beta3 = v.nrm2(v4, spec.axis_name)
        delta = s["gamma2"] * alpha - s["gamma1"] * s["sigma2"] * s["beta2"]
        rho1 = jnp.sqrt(delta * delta + beta3 * beta3)
        rho2 = s["sigma2"] * alpha + s["gamma1"] * s["gamma2"] * s["beta2"]
        rho3 = s["sigma1"] * s["beta2"]
        gamma3 = delta / rho1
        sigma3 = beta3 / rho1
        w2 = (v2n - rho3 * s["w0"] - rho2 * s["w1"]) / rho1
        x = s["x"] + gamma3 * s["eta"] * w2
        r_euc = s["r_euc"] * jnp.abs(sigma3)
        nrm = r_euc * r0_inv
        return dict(it=s["it"] + 1, flag=s["flag"], x=x,
                    v1=v2n, v2=v4, w0=s["w1"], w1=w2,
                    beta2=beta3, eta=s["eta"] * -sigma3,
                    gamma1=s["gamma2"], gamma2=gamma3,
                    sigma1=s["sigma2"], sigma2=sigma3,
                    r_euc=r_euc, nrm=nrm,
                    rh=record(s["rh"], s["it"], nrm))

    final = krylov_loop(spec, spec.tol, state, step)
    return loop_output(spec, spec.tol, final)
