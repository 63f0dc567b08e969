"""SSOR preconditioner.

Reference: lis_precon_create_ssor / lis_psolve_ssor
(src/precon/lis_precon_ssor.c:58,99): M = (D/ω + L)(I + ωD⁻¹U), applied by
the forward+backward sweep of lis_matrix_solve(...,LIS_MATRIX_SSOR)
(src/matrix/lis_matrix_csr.c SSOR branch) with WD = (D/ω)⁻¹.

TPU form: two level-scheduled triangular plans.  The backward sweep
x[i] -= WD[i]·Σ U[i,j]x[j] is algebraically (D̃+U)x = D̃y with D̃ = D/ω,
so it reuses the same trisolve kernel with rhs y·D̃.

psolveh solves Mᵀ = (I + ωUᵀD⁻¹)(D/ω + Lᵀ) with the transposed triangles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from lis_tpu.matrix.split import split_matrix
from lis_tpu.ops.trisolve import TriSolvePlan, make_plan, trisolve
from lis_tpu.precon.base import precon_pytree, register_precon


@precon_pytree
class SSORPrecon:
    fwd: TriSolvePlan         # (D/ω + L)
    bwd: TriSolvePlan         # (D/ω + U)
    fwd_t: TriSolvePlan       # (I + ωUᵀD⁻¹)
    bwd_t: TriSolvePlan       # (D/ω + Lᵀ)
    dtil: jax.Array           # D/ω

    def psolve(self, r):
        y = trisolve(self.fwd, r)
        return trisolve(self.bwd, y * self.dtil)

    def psolveh(self, r):
        z = trisolve(self.fwd_t, r)
        return trisolve(self.bwd_t, z)


@register_precon("ssor")
def create_ssor(A, opts):
    w = getattr(opts, "ssor_omega", 1.0)
    s = split_matrix(A)
    n = A.nrows
    d = np.asarray(s.D)
    with np.errstate(divide="ignore"):
        wd = np.where(d != 0, w / np.where(d != 0, d, 1), 1.0)   # (D/ω)⁻¹
    dtil = np.where(wd != 0, 1.0 / wd, 1.0)                      # D/ω

    lp, li, lv = s.L.to_csr_arrays()
    up, ui, uv = s.U.to_csr_arrays()
    fwd = make_plan(lp, li, lv, wd, lower=True)
    bwd = make_plan(up, ui, uv, wd, lower=False)

    # transposed triangles for psolveh
    Lt = sp.csr_matrix((lv, li, lp), shape=A.shape).T.tocsr()
    Ut = sp.csr_matrix((uv, ui, up), shape=A.shape).T.tocsr()
    Lt.sort_indices(); Ut.sort_indices()
    # (I + ωUᵀD⁻¹): strictly lower Uᵀ with column scaling 1/d[col]·ω,
    # unit diagonal multiplier
    utv = Ut.data * (w / d[Ut.indices])
    fwd_t = make_plan(Ut.indptr, Ut.indices, utv, np.ones(n), lower=True)
    bwd_t = make_plan(Lt.indptr, Lt.indices, Lt.data, wd, lower=False)

    return SSORPrecon(fwd=fwd, bwd=bwd, fwd_t=fwd_t, bwd_t=bwd_t,
                      dtil=jnp.asarray(dtil))
