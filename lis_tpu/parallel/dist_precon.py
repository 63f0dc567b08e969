"""Distributed (block-local) preconditioners.

The reference's MPI behavior for ILU/SSOR is block-Jacobi: each rank
factors and sweeps only its owned diagonal block (lis_precon_iluk.c — the
fact loops run over local rows; the OpenMP tri-solve drops out-of-block
columns, src/matrix/lis_matrix_csr.c:1577-1605).  The TPU equivalent:
extract each shard's diagonal block on host, factor it with the standard
(single-chip) create functions, and stack the resulting level-scheduled
plans with a leading shard axis so a P("p") in_spec hands every shard its
own local plan inside shard_map.  The apply is then the UNCHANGED psolve of
the single-chip preconditioner class, run per-shard.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lis_tpu.matrix.base import host
from lis_tpu.matrix.csr import CSRMatrix
from lis_tpu.ops.trisolve import TriSolvePlan
from lis_tpu.parallel.mesh import AXIS


def local_diag_blocks(A) -> list:
    """Per-shard diagonal blocks of a distributed matrix (CSR or DIA
    sharding) as host CSRMatrix objects of uniform size (nlocal × nlocal).
    Padding rows (beyond the true global size) get an explicit unit
    diagonal so factors act as identity there."""
    from lis_tpu.parallel.dist import undistribute_csr
    g = undistribute_csr(A)
    gp, gi, gv = g.to_csr_arrays()
    gs = sp.csr_matrix((np.asarray(gv), np.asarray(gi), np.asarray(gp)),
                       shape=(A.gn, A.gn))
    p, nl, gn = A.nprocs, A.nlocal, A.gn
    blocks = []
    for k in range(p):
        lo, hi = k * nl, min((k + 1) * nl, gn)
        m = gs[lo:hi, lo:hi].tocoo()
        r, c, v = m.row, m.col, m.data
        npad = nl - (hi - lo)
        if npad > 0:
            r = np.concatenate([r, np.arange(hi - lo, nl)])
            c = np.concatenate([c, np.arange(hi - lo, nl)])
            v = np.concatenate([v, np.ones(npad, dtype=v.dtype)])
        m = sp.coo_matrix((v, (r, c)), shape=(nl, nl)).tocsr()
        m.sort_indices()
        blocks.append(CSRMatrix.from_csr_arrays(m.indptr, m.indices, m.data,
                                                (nl, nl)))
    return blocks


def _stack_plans(plans: list[TriSolvePlan], mesh: Mesh) -> TriSolvePlan:
    """Pad per-shard plans to common (nlev, max_rows, max_nnz) and stack
    with the shard axis leading-and-flattened, so P("p") splits cleanly."""
    n = plans[0].n
    nlev = max(p.rows.shape[0] for p in plans)
    mr = max(p.rows.shape[1] for p in plans)
    mn = max(p.cols.shape[2] for p in plans)
    sh = NamedSharding(mesh, P(AXIS))

    def pad(a, shape, fill):
        out = np.full(shape, fill, dtype=host(a).dtype)
        s = a.shape
        out[tuple(slice(0, d) for d in s)] = host(a)
        return out

    rows = np.stack([pad(p.rows, (nlev, mr), n) for p in plans])
    cols = np.stack([pad(p.cols, (nlev, mr, mn), n) for p in plans])
    vals = np.stack([pad(p.vals, (nlev, mr, mn), 0) for p in plans])
    dinv = np.stack([host(p.dinv) for p in plans])
    put = lambda a: jax.device_put(jnp.asarray(a.reshape((-1,) + a.shape[2:])), sh)
    return TriSolvePlan(rows=put(rows), cols=put(cols), vals=put(vals),
                        dinv=put(dinv), n=n)


def stack_precons(precons: list, mesh: Mesh):
    """Stack a list of identical-structure single-chip preconditioners into
    one whose leaves carry a flattened leading shard axis.  TriSolvePlan
    sub-trees are padded to a common level/row/nnz geometry; plain array
    leaves are stacked directly."""
    import dataclasses
    cls = type(precons[0])
    fields = {}
    for f in dataclasses.fields(precons[0]):
        vs = [getattr(p, f.name) for p in precons]
        if isinstance(vs[0], TriSolvePlan):
            fields[f.name] = _stack_plans(vs, mesh)
        else:
            a = np.stack([host(v) for v in vs])
            fields[f.name] = jax.device_put(
                jnp.asarray(a.reshape((-1,) + a.shape[2:])),
                NamedSharding(mesh, P(AXIS)))
    return cls(**fields)


def make_dist_block_precon(A, mesh: Mesh, opts):
    """Block-Jacobi version of any plan-based preconditioner: factor each
    shard's diagonal block with the standard registry create function."""
    from lis_tpu.precon.base import PRECON_REGISTRY
    create = PRECON_REGISTRY[opts.precon]
    return stack_precons([create(b, opts) for b in local_diag_blocks(A)],
                         mesh)
