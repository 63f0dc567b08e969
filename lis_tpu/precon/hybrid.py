"""Hybrid preconditioner — an inner iterative solver as M⁻¹.

Reference: lis_precon_create_hybrid / lis_psolve_hybrid
(src/precon/lis_precon_hybrid.c:61,165): the preconditioner application
runs ``-hybrid_i`` (default SOR) for ``-hybrid_maxiter`` (25) iterations at
``-hybrid_tol`` (1e-3) on A z = r.  Because every lis_tpu solver is a pure
jit-traceable function, the inner Krylov/stationary loop nests directly
inside the outer solver's compiled while-loop — no host round trips.

psolveh runs the inner solver on Aᴴ (needed by the BiCG family).
"""

from __future__ import annotations

import jax.numpy as jnp

from lis_tpu.precon.base import NonePrecon, precon_pytree, register_precon
from lis_tpu.solvers.base import SolverSpec


@precon_pytree
class _AdjointPrecon:
    """Mᴴ as a preconditioner view — the inner solve on Aᴴ is
    preconditioned by the adjoint of the inner preconditioner."""
    inner: object

    def psolve(self, r):
        return self.inner.psolveh(r)

    def psolveh(self, r):
        return self.inner.psolve(r)


@precon_pytree
class HybridPrecon:
    A: object                 # matrix pytree
    At: object                # Aᴴ matrix pytree
    aux: object               # inner solver prepare() result (A)
    aux_t: object             # inner solver prepare() result (Aᴴ)
    M: object = None          # -hybrid_p inner preconditioner (or None)
    _static = ("spec",)
    spec: SolverSpec = None

    def psolve(self, r):
        from lis_tpu.solvers.base import SOLVER_FNS
        out = SOLVER_FNS[self.spec.solver](
            self.A, r, jnp.zeros_like(r),
            self.M if self.M is not None else NonePrecon(), self.spec,
            aux=self.aux)
        return out.x

    def psolveh(self, r):
        from lis_tpu.solvers.base import SOLVER_FNS
        out = SOLVER_FNS[self.spec.solver](
            self.At, r, jnp.zeros_like(r),
            _AdjointPrecon(inner=self.M) if self.M is not None
            else NonePrecon(), self.spec,
            aux=self.aux_t)
        return out.x


@register_precon("hybrid")
def create_hybrid(A, opts):
    from lis_tpu.solvers.base import SOLVER_PREPARE
    from lis_tpu.matrix.csr import CSRMatrix
    from lis_tpu.matrix.convert import convert_matrix

    spec = SolverSpec(solver=getattr(opts, "hybrid_i", "sor"),
                      tol=getattr(opts, "hybrid_tol", 1e-3),
                      maxiter=getattr(opts, "hybrid_maxiter", 25),
                      restart=getattr(opts, "hybrid_restart", 40),
                      ell=getattr(opts, "hybrid_ell", 2),
                      omega=getattr(opts, "hybrid_omega", 1.5),
                      conv_cond=0)
    At = convert_matrix(A, "csr").transpose()
    prepare = SOLVER_PREPARE.get(spec.solver)
    aux = prepare(A, spec) if prepare else None
    aux_t = prepare(At, spec) if prepare else None
    # -hybrid_p: the inner solver's preconditioner (the reference passes
    # LIS_OPTIONS_PPRECON through as the psolver's LIS_OPTIONS_PRECON,
    # lis_precon_hybrid.c:89)
    M = None
    pname = getattr(opts, "hybrid_p", "none")
    if pname not in ("none", "hybrid"):      # no hybrid-in-hybrid recursion
        from lis_tpu.precon.base import create_precon
        M = create_precon(pname, A, opts)
    return HybridPrecon(A=A, At=At, aux=aux, aux_t=aux_t, M=M, spec=spec)
