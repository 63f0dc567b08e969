"""Additive Schwarz wrapper (-adds true -adds_iter N).

Reference: lis_precon_create_adds / lis_psolve_adds
(src/precon/lis_precon_ads.c:58,116): x = 0; r = b; repeat adds_iter+1
times { x += M⁻¹r; r = b - A x } — iterative refinement of any inner
preconditioner, which under MPI gives the overlapping-domain additive
Schwarz effect (used by hpcg_kernel, test/test3b.c:172).
"""

from __future__ import annotations

import jax.numpy as jnp

from lis_tpu.precon.base import precon_pytree


@precon_pytree
class AdditiveSchwarzPrecon:
    A: object
    inner: object
    _static = ("iters",)
    iters: int = 1

    def psolve(self, b):
        x = self.inner.psolve(b)
        for _ in range(self.iters):
            r = b - self.A.matvec(x)
            x = x + self.inner.psolve(r)
        return x

    def psolveh(self, b):
        x = self.inner.psolveh(b)
        for _ in range(self.iters):
            r = b - self.A.matvech(x)
            x = x + self.inner.psolveh(r)
        return x


def wrap_additive_schwarz(A, inner, opts):
    return AdditiveSchwarzPrecon(A=A, inner=inner,
                                 iters=getattr(opts, "adds_iter", 1))
