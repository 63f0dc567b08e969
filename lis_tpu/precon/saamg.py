"""SA-AMG — smoothed-aggregation algebraic multigrid preconditioner.

Reference: the one Fortran-90 component (src/fortran/amg/, 12.5k LoC):
setup = independent-set aggregation (lis_m_aggregate_mod.F90:45) +
smoothed prolongator + Galerkin RAP coarse matrices
(lis_m_data_creation_AMGCG.F90:61), apply = V-cycle with symmetric
Gauss-Seidel smoothing and a direct coarsest solve
(v_cycle_ssi_amg / sgs / ll_slv, lis_m_solver_AMGCG.F90:50+).
Options: -saamg_theta (strength threshold, 0.05), -saamg_unsym.

TPU design: the irregular graph work (strength-of-connection, greedy
aggregation, RAP) runs once on host with scipy; each level becomes a
static pytree (CSR operator + prolongator + SGS trisolve plans), and the
V-cycle unrolls over the static level list inside jit — per level it is
SpMV + two level-scheduled triangular sweeps, all device-resident.  The
coarsest level applies a precomputed dense inverse on the MXU.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from lis_tpu.matrix.csr import CSRMatrix
from lis_tpu.ops.trisolve import TriSolvePlan, make_plan, trisolve
from lis_tpu.precon.base import register_precon


@dataclass(frozen=True)
class AMGLevel:
    A: CSRMatrix
    P: CSRMatrix              # prolongator level l+1 -> l
    fwd: TriSolvePlan         # (D+L) plan for SGS pre/post smoothing
    bwd: TriSolvePlan         # (D+U) plan
    dinv: object = None       # 1/diag for the weighted-Jacobi smoother

jax.tree_util.register_pytree_node(
    AMGLevel,
    lambda l: ((l.A, l.P, l.fwd, l.bwd, l.dinv), None),
    lambda aux, c: AMGLevel(*c))


@dataclass(frozen=True)
class SAAMGPrecon:
    levels: tuple             # tuple[AMGLevel]
    coarse_inv: jax.Array     # dense inverse of the coarsest operator
    smoother: str = "sgs"     # "sgs" (reference parity) | "jacobi"
                              # (pure streams — TPU-fast at scale, where
                              # level-scheduled trisolves gather)

    def _presmooth(self, level, b):
        if self.smoother == "jacobi":
            w = 2.0 / 3.0
            x = w * level.dinv * b
            return x + w * level.dinv * (b - level.A.matvec(x))
        x = trisolve(level.fwd, b)
        return x + trisolve(level.bwd, b - level.A.matvec(x))

    def _postsmooth(self, level, x, b):
        if self.smoother == "jacobi":
            w = 2.0 / 3.0
            x = x + w * level.dinv * (b - level.A.matvec(x))
            return x + w * level.dinv * (b - level.A.matvec(x))
        x = x + trisolve(level.fwd, b - level.A.matvec(x))
        return x + trisolve(level.bwd, b - level.A.matvec(x))

    def _cycle(self, lev: int, b):
        if lev == len(self.levels):
            return self.coarse_inv @ b
        level = self.levels[lev]
        x = self._presmooth(level, b)
        # coarse-grid correction
        r = b - level.A.matvec(x)
        rc = level.P.matvech(r)
        ec = self._cycle(lev + 1, rc)
        x = x + level.P.matvec(ec)
        return self._postsmooth(level, x, b)

    def psolve(self, r):
        return self._cycle(0, r)

    def psolveh(self, r):
        # the SA-AMG hierarchy is built for the (near-)symmetric case
        # (the reference's unsym variant changes setup, not the transpose
        # apply); V-cycle reused.
        return self._cycle(0, r)

jax.tree_util.register_pytree_node(
    SAAMGPrecon,
    lambda p: ((p.levels, p.coarse_inv), (p.smoother,)),
    lambda aux, c: SAAMGPrecon(c[0], c[1], aux[0]))


def _aggregate(S: sp.csr_matrix) -> np.ndarray:
    """Greedy independent-set aggregation (the reference's aggregate_mod
    scheme): pick unaggregated root nodes, absorb their strong neighbors,
    then attach leftovers to a neighboring aggregate.  Native C++ engine
    (O(nnz), production sizes) with this Python loop as the fallback."""
    from lis_tpu import _native
    out = _native.amg_aggregate(S.indptr, S.indices)
    if out is not None:
        return out[1].astype(np.int64)
    n = S.shape[0]
    agg = np.full(n, -1, dtype=np.int64)
    nagg = 0
    # phase 1: roots whose strong neighborhood is unaggregated
    for i in range(n):
        if agg[i] != -1:
            continue
        neigh = S.indices[S.indptr[i]:S.indptr[i + 1]]
        if (agg[neigh] == -1).all():
            agg[i] = nagg
            agg[neigh] = nagg
            nagg += 1
    # phase 2: attach stragglers to an adjacent aggregate
    for i in range(n):
        if agg[i] != -1:
            continue
        neigh = S.indices[S.indptr[i]:S.indptr[i + 1]]
        hit = neigh[agg[neigh] != -1]
        if len(hit):
            agg[i] = agg[hit[0]]
        else:
            agg[i] = nagg
            nagg += 1
    return agg


def _strength(A: sp.csr_matrix, theta: float) -> sp.csr_matrix:
    d = np.abs(A.diagonal())
    d[d == 0] = 1.0
    C = A.tocoo()
    keep = (np.abs(C.data) > theta * np.sqrt(d[C.row] * d[C.col])) \
        & (C.row != C.col)
    return sp.csr_matrix((np.ones(keep.sum()),
                          (C.row[keep], C.col[keep])), shape=A.shape)


def build_hierarchy(A_csr: sp.csr_matrix, theta: float = 0.05,
                    max_levels: int = 10, coarse_size: int = 32):
    """Aggregation + smoothed prolongator + Galerkin RAP per level."""
    levels = []
    A = A_csr.tocsr()
    while A.shape[0] > coarse_size and len(levels) < max_levels - 1:
        # adaptive strength threshold: a theta above the operator's
        # off-diagonal strength ratio (e.g. the 27-pt HPCG stencil at
        # 1/26 ~ 0.038 vs the 0.05 default) leaves every node isolated
        # and aggregation stalls — relax theta until coarsening happens
        th = theta
        while True:
            S = _strength(A, th)
            agg = _aggregate(S)
            nc = int(agg.max()) + 1
            if nc < A.shape[0] or th < 1e-4:
                break
            th = th / 4.0
        if nc >= A.shape[0]:      # aggregation stalled even at theta~0
            break
        # tentative piecewise-constant prolongator, column-normalised
        counts = np.bincount(agg, minlength=nc).astype(float)
        Pt = sp.csr_matrix((1.0 / np.sqrt(counts[agg]),
                            (np.arange(A.shape[0]), agg)),
                           shape=(A.shape[0], nc))
        # Jacobi smoothing: P = (I - ω D⁻¹ A) Pt, ω = 2/3
        dinv = 1.0 / np.where(A.diagonal() != 0, A.diagonal(), 1.0)
        P = (Pt - (2.0 / 3.0) * sp.diags(dinv) @ (A @ Pt)).tocsr()
        Ac = (P.T @ A @ P).tocsr()
        Ac.sort_indices()
        levels.append((A, P))
        A = Ac
    return levels, A


def _sgs_plans(A: sp.csr_matrix):
    n = A.shape[0]
    C = A.tocoo()
    d = np.zeros(n)
    dm = C.row == C.col
    np.add.at(d, C.row[dm], C.data[dm])
    with np.errstate(divide="ignore"):
        dinv = np.where(d != 0, 1.0 / np.where(d != 0, d, 1), 1.0)

    def tri(mask, lower):
        r, c, v = C.row[mask], C.col[mask], C.data[mask]
        order = np.lexsort((c, r))
        r, c, v = r[order], c[order], v[order]
        ptr = np.zeros(n + 1, dtype=np.int32)
        np.add.at(ptr, r + 1, 1)
        ptr = np.cumsum(ptr).astype(np.int32)
        return make_plan(ptr, c.astype(np.int32), v, dinv, lower=lower)

    return tri(C.row > C.col, True), tri(C.row < C.col, False)


@register_precon("saamg")
def create_saamg(A, opts):
    ptr, index, value = A.to_csr_arrays()
    A_sp = sp.csr_matrix((value, index, ptr), shape=A.shape)
    theta = getattr(opts, "saamg_theta", 0.05)
    raw_levels, A_coarse = build_hierarchy(A_sp, theta=theta)

    smoother = getattr(opts, "saamg_smoother", "sgs")

    def _fast_op(m):
        """Level operator through auto_storage (DIA/HDI/BES when the
        structure allows — the V-cycle's matvecs then stream instead of
        gathering; CSR fallback otherwise)."""
        from lis_tpu.solvers.driver import auto_storage
        return auto_storage(CSRMatrix.from_csr_arrays(
            m.indptr, m.indices, m.data, m.shape))

    def _fast_prolongator(m):
        """Prolongators track rows at slope ncols/nrows, with one affine
        band per plane neighbour of the fine stencil: the multi-window
        strided BES covers them gather-free (e.g. exactly 3 windows for
        an aggregated 3-D operator); CSR fallback when the profile is
        too scattered."""
        from lis_tpu.matrix.bes import multi_bes_from_csr
        try:
            # a 3-D fine stencil puts the prolongator's columns in up to
            # 9 affine bands (3 z-planes x 3 y-rows) — give the greedy
            # builder enough windows to find them all.  Acceptance is a
            # cost comparison: slab slots stream ~1300x faster than
            # gathers, so even heavy padding beats the CSR fallback.
            bp = multi_bes_from_csr(m.indptr, m.indices, m.data, m.shape,
                                    max_windows=12, max_bytes=2 << 30)
            rem_frac = (bp.rem.nnz / max(bp.nnz, 1)
                        if bp.rem is not None else 0.0)
            if bp.fill_blowup <= 512 and rem_frac <= 0.2:
                return bp
        except Exception:
            pass
        return CSRMatrix.from_csr_arrays(m.indptr, m.indices, m.data,
                                         m.shape)

    levels = []
    for (Al, Pl) in raw_levels:
        fwd, bwd = _sgs_plans(Al)
        Al.sort_indices()
        Pl.sort_indices()
        d = Al.diagonal()
        with np.errstate(divide="ignore"):
            dinv = np.where(d != 0, 1.0 / np.where(d != 0, d, 1), 1.0)
        levels.append(AMGLevel(
            A=_fast_op(Al), P=_fast_prolongator(Pl),
            fwd=fwd, bwd=bwd, dinv=jnp.asarray(dinv)))
    if A_coarse.shape[0] > 4096:
        raise ValueError(
            f"saamg: hierarchy failed to coarsen (coarsest level "
            f"{A_coarse.shape[0]} rows); the operator has no usable "
            "strength structure — use -p ssor/ilu instead")
    coarse_inv = jnp.asarray(np.linalg.inv(A_coarse.toarray()))
    return SAAMGPrecon(levels=tuple(levels), coarse_inv=coarse_inv,
                       smoother=smoother)
