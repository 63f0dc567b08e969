"""CG and CR eigensolvers (smallest eigenvalue).

Reference: lis_ecg (src/esolver/lis_esolver_cg.c:126) — Rayleigh-Ritz
conjugate-gradient on the 3-space span{w, x, p} with the small 3×3
generalized eigenproblem solved by inverse iteration; and lis_ecr (:780) —
conjugate-residual minimisation of ||Ax - λx|| with explicit α/β formulas.
Both support the spectral shift -shift σ (A - σI) and a psolve from the
inner options (default none).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from lis_tpu import config as C
from lis_tpu.core import vector as v
from lis_tpu.esolvers.base import register_esolver
from lis_tpu.esolvers.power import _result
from lis_tpu.precon.base import NonePrecon, PRECON_REGISTRY, create_precon


def _make_psolve(A, opts):
    name = opts.inner.precon if opts.inner else "none"
    if name == "none":
        return NonePrecon()
    return create_precon(name, A, opts.inner)


@register_esolver("cg")
def ecg(A, B, x0, opts):
    """CG eigensolver (lis_ecg): smallest eigenvalue of A (or pencil via
    B-reduction like the other esolvers)."""
    if B is not None:
        # generalized: work on B⁻¹A through inner solves (reference GCG
        # reduces the pencil the same way as the other G* solvers)
        from lis_tpu.esolvers.power import _bsolve
        matvec = lambda z: _bsolve(B, A.matvec(z), opts)
    else:
        matvec = A.matvec
    sigma = opts.rval
    if sigma != 0.0:
        A = A.shift_diagonal(sigma)
        matvec = A.matvec if B is None else matvec
    M = _make_psolve(A, opts)

    x = x0 / v.nrm2(x0)
    Ax = matvec(x)
    # p = A⁻¹ x (one inner CG solve, lis_esolver_cg.c:213)
    from lis_tpu.solvers.driver import solve as lsolve
    p = lsolve(A if B is None else A, np.asarray(x),
               solver="cg", precon="none", tol=1e-10,
               maxiter=opts.inner.maxiter).x
    Ap = x
    # both problems run as one compiled while_loop — generalized via the
    # B⁻¹A pencil operator with the inner B-solve nested
    from lis_tpu.esolvers.power import _GenOp, _gen_inner_key
    op = A if B is None else _GenOp(A, B, _gen_inner_key(opts))
    if True:
        iters, x, lam, resid, rh = _ecg_run(op, M, x, Ax, p, Ap,
                                            opts.maxiter, opts.tol)
        iters = int(iters)
        status = (C.LIS_SUCCESS if float(resid) < opts.tol
                  else C.LIS_MAXITER)
        return _result(float(lam) + sigma, x, iters, float(resid), status,
                       np.asarray(rh)[1:iters + 1])
    lam, resid = 0.0, np.inf
    rh = []
    status, iters = C.LIS_MAXITER, opts.maxiter
    for it in range(1, opts.maxiter + 1):
        lam = float(v.dot(x, Ax))
        r = x - (1.0 / lam) * Ax
        resid = float(v.nrm2(r))
        rh.append(resid)
        if resid < opts.tol:
            status, iters = C.LIS_SUCCESS, it
            break
        w = M.psolve(r)
        w = w / v.nrm2(w)
        Aw = matvec(w)
        # 3×3 Rayleigh-Ritz generalized problem on span{w, x, p}
        def d(a, b):
            return float(v.dot(a, b))
        A3 = np.array([[d(w, Aw), d(x, Aw), d(p, Aw)],
                       [d(x, Aw), d(x, Ax), d(p, Ax)],
                       [d(p, Aw), d(p, Ax), d(p, Ap)]])
        B3 = np.array([[d(w, w), d(x, w), d(p, w)],
                       [d(x, w), d(x, x), d(p, x)],
                       [d(p, w), d(p, x), d(p, p)]])
        v3 = _small_ritz(np.asarray(A3), np.asarray(B3), opts.tol,
                         opts.maxiter)
        w2 = v3[0] * w + v3[2] * p
        x = w2 + v3[1] * x
        p = w2
        Aw2 = v3[0] * Aw + v3[2] * Ap
        Ax = Aw2 + v3[1] * Ax
        Ap = Aw2
        nx = v.nrm2(x)
        x, Ax = x / nx, Ax / nx
        npn = v.nrm2(p)
        p, Ap = p / npn, Ap / npn
    return _result(lam + sigma, x, iters, resid, status, rh)


def _small_ritz(A3, B3, tol, maxiter):
    """Smallest Ritz pair of the 3x3 pencil via inverse iteration (host)."""
    v3 = np.ones(3)
    for _ in range(maxiter):
        v3 /= np.linalg.norm(v3)
        B3v3 = B3 @ v3
        try:
            z3 = np.linalg.solve(A3, B3v3)
        except np.linalg.LinAlgError:
            break
        mu3 = B3v3 @ z3
        if np.linalg.norm(z3 - mu3 * B3v3) < tol:
            return z3
        v3 = z3
    return v3


import jax as _jax
from functools import partial as _partial


@_partial(_jax.jit, static_argnums=(6, 7))
def _ecg_run(A, M, x, Ax, p, Ap, maxiter, tol):
    dt = jnp.real(x).dtype
    rh0 = jnp.full(maxiter + 1, jnp.nan, dtype=dt)

    def cond(s):
        it, x, Ax, p, Ap, lam, resid, rh = s
        return (it <= maxiter) & (resid >= tol)

    def step(s):
        it, x, Ax, p, Ap, lam, resid, rh = s
        lam = v.dot(x, Ax)
        r = x - (1.0 / lam) * Ax
        resid = v.nrm2(r)
        rh = rh.at[it].set(resid)
        w = M.psolve(r)
        w = w / v.nrm2(w)
        Aw = A.matvec(w)
        d = lambda a, b: v.dot(a, b)
        A3 = jnp.array([[d(w, Aw), d(x, Aw), d(p, Aw)],
                        [d(x, Aw), d(x, Ax), d(p, Ax)],
                        [d(p, Aw), d(p, Ax), d(p, Ap)]])
        B3 = jnp.array([[d(w, w), d(x, w), d(p, w)],
                        [d(x, w), d(x, x), d(p, x)],
                        [d(p, w), d(p, x), d(p, p)]])

        def solve3(Mm, rhs):
            # Cramer's rule: TPU's LuDecomposition only supports f32/c64
            c0 = jnp.cross(Mm[:, 1], Mm[:, 2])
            det = jnp.dot(Mm[:, 0], c0)
            det = jnp.where(det == 0, 1.0, det)
            x0 = jnp.dot(rhs, c0)
            x1 = jnp.dot(Mm[:, 0], jnp.cross(rhs, Mm[:, 2]))
            x2 = jnp.dot(Mm[:, 0], jnp.cross(Mm[:, 1], rhs))
            return jnp.stack([x0, x1, x2]) / det

        def inv_it(_, v3):
            v3 = v3 / jnp.linalg.norm(v3)
            z3 = solve3(A3, B3 @ v3)
            return jnp.where(jnp.all(jnp.isfinite(z3)), z3, v3)
        v3 = _jax.lax.fori_loop(0, 30, inv_it, jnp.ones(3, A3.dtype))

        w2 = v3[0] * w + v3[2] * p
        xn = w2 + v3[1] * x
        pn = w2
        Aw2 = v3[0] * Aw + v3[2] * Ap
        Axn = Aw2 + v3[1] * Ax
        Apn = Aw2
        nx = v.nrm2(xn)
        xn, Axn = xn / nx, Axn / nx
        npn = v.nrm2(pn)
        pn, Apn = pn / npn, Apn / npn
        # on convergence this step's updates are masked out by the cond
        # check at the NEXT evaluation; keep = converged-this-step
        keep = resid < tol
        sel = lambda new, old: jnp.where(keep, old, new)
        return (it + 1, sel(xn, x), sel(Axn, Ax), sel(pn, p),
                sel(Apn, Ap), lam, resid, rh)

    big = jnp.asarray(jnp.inf, dt)
    it, x, Ax, p, Ap, lam, resid, rh = _jax.lax.while_loop(
        cond, step, (jnp.asarray(1), x, Ax, p, Ap,
                     jnp.zeros((), x.dtype), big, rh0))
    return it - 1, x, lam, resid, rh


@register_esolver("cr")
def ecr(A, B, x0, opts):
    """CR eigensolver (lis_ecr): conjugate-residual iteration on the
    Rayleigh quotient; the reference's default esolver."""
    if B is not None:
        from lis_tpu.esolvers.power import _bsolve
        matvec = lambda z: _bsolve(B, A.matvec(z), opts)
    else:
        matvec = A.matvec
    sigma = opts.rval
    if sigma != 0.0:
        A = A.shift_diagonal(sigma)
        if B is None:
            matvec = A.matvec
    M = _make_psolve(A, opts)

    x = x0 / v.nrm2(x0)
    from lis_tpu.esolvers.power import _GenOp, _gen_inner_key
    op = A if B is None else _GenOp(A, B, _gen_inner_key(opts))
    if True:
        iters, x, lam, resid, rh = _ecr_run(op, M, x, opts.maxiter,
                                            opts.tol)
        iters = int(iters)
        status = (C.LIS_SUCCESS if float(resid) < opts.tol
                  else C.LIS_MAXITER)
        return _result(float(lam) + sigma, x, iters, float(resid), status,
                       np.asarray(rh)[1:iters + 1])
    Ax = matvec(x)
    lam = float(v.dot(x, Ax))
    r = -(Ax - lam * x)
    p = r
    Ap = matvec(p)
    resid = np.inf
    rh = []
    status, iters = C.LIS_MAXITER, opts.maxiter
    for it in range(1, opts.maxiter + 1):
        rAp = float(v.dot(r, Ap)); rp = float(v.dot(r, p))
        ApAp = float(v.dot(Ap, Ap)); pAp = float(v.dot(p, Ap))
        pp = float(v.dot(p, p))
        den = ApAp - 2.0 * lam * pAp + lam * lam * pp
        alpha = (rAp - lam * rp) / den
        x = x + alpha * p
        Ax = matvec(x)
        nx2 = float(v.nrm2(x)) ** 2
        lam = float(v.dot(x, Ax)) / nx2
        r = -(Ax - lam * x)
        w = M.psolve(r)
        Aw = matvec(w)
        AwAp = float(v.dot(Aw, Ap)); pAw = float(v.dot(p, Aw))
        wAp = float(v.dot(w, Ap)); wp = float(v.dot(w, p))
        beta = -(AwAp - lam * (pAw + wAp) + lam * lam * wp) / den
        p = w + beta * p
        Ap = Aw + beta * Ap
        resid = float(v.nrm2(r)) / abs(lam)
        rh.append(resid)
        if resid < opts.tol:
            status, iters = C.LIS_SUCCESS, it
            break
    x = x / v.nrm2(x)
    return _result(lam + sigma, x, iters, resid, status, rh)


@_partial(_jax.jit, static_argnums=(3, 4))
def _ecr_run(A, M, x, maxiter, tol):
    """The ecr iteration as one compiled while_loop (standard problem)."""
    dt = jnp.real(x).dtype
    Ax = A.matvec(x)
    lam = v.dot(x, Ax)
    r = -(Ax - lam * x)
    p = r
    Ap = A.matvec(p)
    rh0 = jnp.full(maxiter + 1, jnp.nan, dtype=dt)

    def cond(s):
        it, x, lam, r, p, Ap, resid, rh = s
        return (it <= maxiter) & (resid >= tol)

    def step(s):
        it, x, lam, r, p, Ap, resid, rh = s
        d = v.dot
        rAp, rp = d(r, Ap), d(r, p)
        ApAp, pAp, pp = d(Ap, Ap), d(p, Ap), d(p, p)
        den = ApAp - 2.0 * lam * pAp + lam * lam * pp
        den = jnp.where(den == 0, 1.0, den)
        alpha = (rAp - lam * rp) / den
        x = x + alpha * p
        Ax = A.matvec(x)
        lam = d(x, Ax) / (v.nrm2(x) ** 2)
        r = -(Ax - lam * x)
        w = M.psolve(r)
        Aw = A.matvec(w)
        beta = -(d(Aw, Ap) - lam * (d(p, Aw) + d(w, Ap))
                 + lam * lam * d(w, p)) / den
        p = w + beta * p
        Ap = Aw + beta * Ap
        resid = v.nrm2(r) / jnp.abs(jnp.where(lam == 0, 1.0, lam))
        rh = rh.at[it].set(jnp.real(resid))
        return (it + 1, x, lam, r, p, Ap, resid, rh)

    big = jnp.asarray(jnp.inf, dt)
    it, x, lam, r, p, Ap, resid, rh = _jax.lax.while_loop(
        cond, step, (jnp.asarray(1), x, lam, r, p, Ap, big, rh0))
    return it - 1, x / v.nrm2(x), lam, resid, rh
