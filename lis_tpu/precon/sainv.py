"""SAINV — stabilized approximate-inverse preconditioner.

Reference: lis_precon_create_sainv (src/precon/lis_precon_sainv.c:59,
factorisation :~100-700) and lis_psolve_sainv (:735): M⁻¹ = Z D⁻¹ Wᴴ from
A-biconjugation with post-dropping (drop tolerance -sainv_drop, 0.05).

The apply is two sparse SpMVs + a diagonal scale — ideal for TPU (an
approximate inverse needs no triangular solves at all).  The biconjugation
runs on host at create; entries |z| < drop are discarded after each update
like the reference's stabilised right-looking scheme.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from lis_tpu.matrix.csr import CSRMatrix
from lis_tpu.precon.base import precon_pytree, register_precon


@precon_pytree
class SAINVPrecon:
    W: CSRMatrix              # biconjugation left factor (unit diag)
    Z: CSRMatrix              # right factor (unit diag)
    dinv: jax.Array

    def psolve(self, r):
        t = self.W.matvech(r)          # Wᴴ r
        return self.Z.matvec(self.dinv * t)

    def psolveh(self, r):
        t = self.Z.matvech(r)
        d = jnp.conj(self.dinv) if jnp.iscomplexobj(self.dinv) else self.dinv
        return self.W.matvec(d * t)


@register_precon("sainv")
def create_sainv(A, opts):
    drop = getattr(opts, "sainv_drop", 0.05)
    n = A.nrows
    dense = np.asarray(A.to_dense())

    # right-looking stabilized A-biconjugation: WᵀAZ = D
    Z = np.eye(n)
    W = np.eye(n)
    d = np.zeros(n)
    for i in range(n):
        Azi = dense @ Z[:, i]
        ATwi = dense.T @ W[:, i]
        d[i] = W[:, i] @ Azi
        if d[i] == 0.0:
            d[i] = 1.0
            continue
        if i + 1 < n:
            # update all later columns at once (vectorised right-looking)
            cz = (ATwi @ Z[:, i + 1:]) / d[i]
            Z[:, i + 1:] -= np.outer(Z[:, i], cz)
            cw = (Azi @ W[:, i + 1:]) / d[i]
            W[:, i + 1:] -= np.outer(W[:, i], cw)
            # stabilised post-dropping
            Z[:, i + 1:][np.abs(Z[:, i + 1:]) < drop] = 0.0
            W[:, i + 1:][np.abs(W[:, i + 1:]) < drop] = 0.0

    with np.errstate(divide="ignore"):
        dinv = np.where(d != 0, 1.0 / np.where(d != 0, d, 1), 1.0)
    return SAINVPrecon(W=CSRMatrix.from_dense(W),
                       Z=CSRMatrix.from_dense(Z),
                       dinv=jnp.asarray(dinv))
