"""Orthomin(m) (reference: lis_orthomin, src/solver/lis_solver_orthomin.c:124).

Truncated generalized CR keeping the last m directions (restart option,
default -restart 40... the reference reads -m via LIS_OPTIONS_RESTART here;
we match by using spec.restart).  Direction history lives as (m+1, n)
device matrices with a rotating index — the reference's modulo ring of work
vectors — and the l-orthogonalisation loop is a masked fori over the ring.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lis_tpu import config as C
from lis_tpu.core import vector as v
from lis_tpu.solvers.base import (RUNNING, SolverOutput, SolverSpec,
                                  init_residual, krylov_loop, loop_output,
                                  new_rhistory, record, register_solver,
                                  residual_norm)


@register_solver("orthomin")
def orthomin(A, b, x0, M, spec: SolverSpec, aux=None) -> SolverOutput:
    m = spec.restart
    n = b.shape[0]
    r, bnrm_inv, tol_eff, nrm0 = init_residual(A, b, x0, spec)
    rtld = M.psolve(r)
    rh = new_rhistory(spec, nrm0, jnp.real(b).dtype)
    one = jnp.asarray(1.0, dtype=b.dtype)
    dt = b.dtype

    state = dict(it=jnp.asarray(1), flag=jnp.asarray(RUNNING),
                 x=x0, r=r, rtld=rtld,
                 P=jnp.zeros((m + 1, n), dtype=dt),
                 AP=jnp.zeros((m + 1, n), dtype=dt),
                 APT=jnp.zeros((m + 1, n), dtype=dt),
                 dotsave=jnp.zeros(m + 1, dtype=dt),
                 nrm=nrm0, rh=rh)

    def step(s):
        it = s["it"]
        ip = (it - 1) % (m + 1)
        p_new = s["rtld"]
        ap_new = A.matvec(p_new)
        apt_new = M.psolve(ap_new)
        lmax = jnp.minimum(m, it - 1)

        def ortho(l, carry):
            p_new, ap_new, apt_new = carry
            ip0 = (ip + m + 1 - l) % (m + 1)
            beta = -v.dot(apt_new, s["APT"][ip0], spec.axis_name) \
                * s["dotsave"][l - 1]
            use = l <= lmax
            bz = jnp.where(use, beta, 0.0)
            return (p_new + bz * s["P"][ip0],
                    ap_new + bz * s["AP"][ip0],
                    apt_new + bz * s["APT"][ip0])

        p_new, ap_new, apt_new = jax.lax.fori_loop(
            1, m + 1, ortho, (p_new, ap_new, apt_new))

        dot0 = v.dot(apt_new, apt_new, spec.axis_name)
        broke = dot0 == 0.0
        dot0_inv = 1.0 / jnp.where(broke, one, dot0)
        dotsave = jnp.roll(s["dotsave"], 1).at[0].set(dot0_inv)
        alpha = v.dot(s["rtld"], apt_new, spec.axis_name) * dot0_inv
        x = s["x"] + alpha * p_new
        r = s["r"] - alpha * ap_new
        rtld = s["rtld"] - alpha * apt_new
        nrm = residual_norm(r, bnrm_inv, spec)
        keep = lambda new, old: jnp.where(broke, old, new)
        return dict(it=it + 1,
                    flag=jnp.where(broke, C.LIS_BREAKDOWN, s["flag"]),
                    x=keep(x, s["x"]), r=keep(r, s["r"]),
                    rtld=keep(rtld, s["rtld"]),
                    P=s["P"].at[ip].set(p_new),
                    AP=s["AP"].at[ip].set(ap_new),
                    APT=s["APT"].at[ip].set(apt_new),
                    dotsave=jnp.where(broke, s["dotsave"], dotsave),
                    nrm=keep(nrm, s["nrm"]),
                    rh=record(s["rh"], it, jnp.where(broke, s["nrm"], nrm)))

    final = krylov_loop(spec, tol_eff, state, step)
    return loop_output(spec, tol_eff, final)
