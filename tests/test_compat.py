"""lis.h-style imperative API shim (lis_tpu.compat) — the reference's
test4.c / test1.c flow ported line by line."""

import numpy as np

import lis_tpu.compat as lis


def test_test4_flow():
    """The reference's test4.c: 12x12 tridiagonal via set_value, BiCG."""
    n = 12
    lis.lis_initialize([])
    A = lis.lis_matrix_create(0)
    assert lis.lis_matrix_set_size(A, 0, n) == lis.LIS_SUCCESS
    for i in range(n):
        if i > 0:
            lis.lis_matrix_set_value(lis.LIS_INS_VALUE, i, i - 1, -1.0, A)
        if i < n - 1:
            lis.lis_matrix_set_value(lis.LIS_INS_VALUE, i, i + 1, -1.0, A)
        lis.lis_matrix_set_value(lis.LIS_INS_VALUE, i, i, 2.0, A)
    lis.lis_matrix_set_type(A, lis.LIS_MATRIX_CSR)
    assert lis.lis_matrix_assemble(A) == lis.LIS_SUCCESS

    b = lis.lis_vector_create(0)
    x = lis.lis_vector_create(0)
    lis.lis_vector_set_size(b, 0, n)
    lis.lis_vector_set_size(x, 0, n)
    u = lis.lis_vector_duplicate(b)
    lis.lis_vector_set_all(1.0, u)
    lis.lis_matvec(A, u, b)             # b = A·1

    solver = lis.lis_solver_create()
    lis.lis_solver_set_option("-i bicg -print none -tol 1e-12", solver)
    st = lis.lis_solve(A, b, x, solver)
    assert st == lis.LIS_SUCCESS
    assert lis.lis_solver_get_iter(solver) <= n
    assert lis.lis_solver_get_residualnorm(solver) < 1e-11
    np.testing.assert_allclose(lis.lis_vector_get_values(x, 0, n), 1.0,
                               atol=1e-9)
    assert lis.lis_solver_get_solvername(
        lis.lis_solver_get_solver(solver)) == "bicg"


def test_set_csr_and_esolve():
    import scipy.sparse as sp
    n = 64
    a = sp.diags([-1, 2, -1], [-1, 0, 1], shape=(n, n), format="csr")
    a.sort_indices()
    A = lis.lis_matrix_create(0)
    lis.lis_matrix_set_size(A, 0, n)
    lis.lis_matrix_set_csr(a.nnz, a.indptr, a.indices,
                           a.data.astype(float), A)
    lis.lis_matrix_assemble(A)
    x = lis.lis_vector_create(0)
    lis.lis_vector_set_size(x, 0, n)
    es = lis.lis_esolver_create()
    lis.lis_esolver_set_option("-e li -ss 2 -etol 1e-9", es)
    st, ev = lis.lis_esolve(A, x, es)
    assert st == lis.LIS_SUCCESS
    # the converged pair is a true eigenpair of the 1-D laplacian
    evs = 2 - 2 * np.cos(np.arange(1, n + 1) * np.pi / (n + 1))
    assert np.min(np.abs(evs - ev)) < 1e-7
    xv = lis.lis_vector_get_values(x, 0, n)
    r = np.asarray(a @ xv) - ev * xv
    assert np.linalg.norm(r) < 1e-7


def test_io_roundtrip(tmp_path):
    n = 10
    A = lis.lis_matrix_create(0)
    lis.lis_matrix_set_size(A, 0, n)
    for i in range(n):
        lis.lis_matrix_set_value(lis.LIS_INS_VALUE, i, i, float(i + 1), A)
    lis.lis_matrix_assemble(A)
    f = str(tmp_path / "a.mtx")
    lis.lis_output(A, None, None, "mm", f)
    B = lis.lis_matrix_create(0)
    lis.lis_input(B, None, None, f)
    d = lis.lis_vector_create(0)
    lis.lis_matrix_get_diagonal(B, d)
    np.testing.assert_allclose(lis.lis_vector_get_values(d, 0, n),
                               np.arange(1.0, n + 1))


def test_psd_decoupled_flow():
    """The test8f.F90 PSD workflow (reference test/test8f.F90): bind the
    matrix, create the preconditioner WITHOUT solving, lis_solve_kernel with
    it, update matrix values in the assembled structure, psd_update the
    factors, solve again — both solves must converge on the right answers."""
    n = 40
    A = lis.lis_matrix_create(0)
    lis.lis_matrix_set_size(A, 0, n)
    for i in range(n):
        lis.lis_matrix_set_value(lis.LIS_INS_VALUE, i, i, 2.5, A)
        if i > 0:
            lis.lis_matrix_set_value(lis.LIS_INS_VALUE, i, i - 1, -1.0, A)
        if i < n - 1:
            lis.lis_matrix_set_value(lis.LIS_INS_VALUE, i, i + 1, -1.0, A)
    lis.lis_matrix_assemble(A)

    solver = lis.lis_solver_create()
    lis.lis_solver_set_option("-i bicgstab -p ilu -tol 1e-12", solver)
    lis.lis_solver_set_matrix(A, solver)
    precon = lis.lis_precon_psd_create(solver)
    assert precon.precon_type == "ilu"

    b = lis.lis_vector_create(0)
    lis.lis_vector_set_size(b, 0, n)
    lis.lis_vector_set_all(1.0, b)
    x = lis.lis_vector_duplicate(b)

    st = lis.lis_solve_kernel(A, b, x, solver, precon)
    assert st == lis.LIS_SUCCESS
    dense1 = np.asarray(A.m.to_dense())
    np.testing.assert_allclose(
        dense1 @ np.asarray(lis.lis_vector_get_values(x, 0, n)),
        np.ones(n), atol=1e-9)
    iters1 = lis.lis_solver_get_iter(solver)

    # strengthen the diagonal in place (structure unchanged), refresh factors
    for i in range(n):
        assert lis.lis_matrix_psd_set_value(
            lis.LIS_ADD_VALUE, i, i, 2.0, A) == lis.LIS_SUCCESS
    # an entry OUTSIDE the structure is rejected, not inserted
    assert lis.lis_matrix_psd_set_value(
        lis.LIS_INS_VALUE, 0, n - 1, 9.9, A) == lis.LIS_ERR_ILL_ARG
    assert lis.lis_precon_psd_update(solver, precon) == lis.LIS_SUCCESS
    lis.lis_matrix_psd_reset_scale(A)
    lis.lis_vector_psd_reset_scale(b)

    st = lis.lis_solve_kernel(A, b, x, solver, precon)
    assert st == lis.LIS_SUCCESS
    dense2 = np.asarray(A.m.to_dense())
    np.testing.assert_allclose(np.diag(dense2), np.diag(dense1) + 2.0)
    np.testing.assert_allclose(
        dense2 @ np.asarray(lis.lis_vector_get_values(x, 0, n)),
        np.ones(n), atol=1e-9)
    # better-conditioned system + refreshed ILU: no more iterations needed
    assert lis.lis_solver_get_iter(solver) <= iters1


def _tri5_dense():
    d = np.zeros((6, 6))
    for i in range(6):
        d[i, i] = 2.0 + i
        if i > 0:
            d[i, i - 1] = -1.0
        if i < 5:
            d[i, i + 1] = -1.5
    return d


def _handle(n=6, mtype=None):
    A = lis.lis_matrix_create(0)
    lis.lis_matrix_set_size(A, 0, n)
    if mtype is not None:
        lis.lis_matrix_set_type(A, mtype)
    return A


def test_raw_layout_set_formats():
    """Every lis_matrix_set_<fmt> adopts the reference's raw packing
    (layouts cross-checked against src/matvec/lis_matvec_*.c loop
    orders) and assembles to the same operator."""
    d = _tri5_dense()
    n = 6
    import scipy.sparse as sp

    # --- coo ---
    A = _handle(mtype=lis.LIS_MATRIX_COO)
    coo = sp.coo_matrix(d)
    lis.lis_matrix_set_coo(coo.nnz, coo.row, coo.col, coo.data, A)
    lis.lis_matrix_assemble(A)
    np.testing.assert_allclose(np.asarray(A.m.to_dense()), d)

    # --- csc ---
    A = _handle(mtype=lis.LIS_MATRIX_CSC)
    csc = sp.csc_matrix(d)
    lis.lis_matrix_set_csc(csc.nnz, csc.indptr, csc.indices, csc.data, A)
    lis.lis_matrix_assemble(A)
    np.testing.assert_allclose(np.asarray(A.m.to_dense()), d)

    # --- dns (column-major) ---
    A = _handle(mtype=lis.LIS_MATRIX_DNS)
    lis.lis_matrix_set_dns(d.reshape(-1, order="F"), A)
    lis.lis_matrix_assemble(A)
    np.testing.assert_allclose(np.asarray(A.m.to_dense()), d)

    # --- dia (diagonal-major value[j*n+i]) ---
    A = _handle(mtype=lis.LIS_MATRIX_DIA)
    offs = np.array([-1, 0, 1])
    val = np.zeros(3 * n)
    for j, off in enumerate(offs):
        for i in range(max(0, -off), min(n, n - off)):
            val[j * n + i] = d[i, i + off]
    lis.lis_matrix_set_dia(3, offs, val, A)
    lis.lis_matrix_assemble(A)
    np.testing.assert_allclose(np.asarray(A.m.to_dense()), d)

    # --- ell (slot-major value[j*n+i]) ---
    A = _handle(mtype=lis.LIS_MATRIX_ELL)
    w = 3
    eidx = np.zeros(w * n, dtype=np.int64)
    eval_ = np.zeros(w * n)
    for i in range(n):
        slots = [(j, d[i, j]) for j in range(n) if d[i, j] != 0]
        for k, (j, v) in enumerate(slots):
            eidx[k * n + i] = j
            eval_[k * n + i] = v
    lis.lis_matrix_set_ell(w, eidx, eval_, A)
    lis.lis_matrix_assemble(A)
    np.testing.assert_allclose(np.asarray(A.m.to_dense()), d)

    # --- msr (diag first, shared index/value tail) ---
    A = _handle(mtype=lis.LIS_MATRIX_MSR)
    tail_idx, tail_val = [], []
    ptrs = [n + 1]
    for i in range(n):
        for j in range(n):
            if i != j and d[i, j] != 0:
                tail_idx.append(j)
                tail_val.append(d[i, j])
        ptrs.append(n + 1 + len(tail_idx))
    midx = np.concatenate([ptrs, tail_idx]).astype(np.int64)
    mval = np.concatenate([np.diag(d), [0.0], tail_val])
    lis.lis_matrix_set_msr(len(mval) - 1, 0, midx, mval, A)
    lis.lis_matrix_assemble(A)
    np.testing.assert_allclose(np.asarray(A.m.to_dense()), d)

    # --- jad (rows sorted by count; perm maps position -> original row) ---
    A = _handle(mtype=lis.LIS_MATRIX_JAD)
    counts = (d != 0).sum(1)
    perm = np.argsort(-counts, kind="stable").astype(np.int64)
    maxnzr = int(counts.max())
    jptr, jidx, jval = [0], [], []
    rowslots = [[(j, d[r, j]) for j in range(n) if d[r, j] != 0]
                for r in perm]
    for s in range(maxnzr):
        for k in range(n):
            if s < len(rowslots[k]):
                jidx.append(rowslots[k][s][0])
                jval.append(rowslots[k][s][1])
        jptr.append(len(jidx))
    lis.lis_matrix_set_jad(len(jval), maxnzr, perm, np.array(jptr),
                           np.array(jidx), np.array(jval), A)
    lis.lis_matrix_assemble(A)
    np.testing.assert_allclose(np.asarray(A.m.to_dense()), d)

    # --- bsr (column-major 2x2 blocks) ---
    A = _handle(mtype=lis.LIS_MATRIX_BSR)
    bsr = sp.bsr_matrix(d, blocksize=(2, 2))
    # scipy blocks are row-major (bnr, bnc); reference wants column-major
    bval = bsr.data.transpose(0, 2, 1).reshape(-1)
    lis.lis_matrix_set_bsr(2, 2, bsr.indptr[-1], bsr.indptr, bsr.indices,
                           bval, A)
    lis.lis_matrix_assemble(A)
    np.testing.assert_allclose(np.asarray(A.m.to_dense()), d)

    # --- bsc (column-major blocks, block-column pointers) ---
    A = _handle(mtype=lis.LIS_MATRIX_BSC)
    bsc = sp.bsr_matrix(d.T, blocksize=(2, 2))  # transpose trick: col blocks
    bval = bsc.data.reshape(-1)  # (bc, bnc, bnr) of d == col-major of block
    lis.lis_matrix_set_bsc(2, 2, bsc.indptr[-1], bsc.indptr, bsc.indices,
                           bval, A)
    lis.lis_matrix_assemble(A)
    np.testing.assert_allclose(np.asarray(A.m.to_dense()), d)

    # --- vbr (variable 2/1/3 row and 3/3 col partition) ---
    A = _handle(mtype=lis.LIS_MATRIX_VBR)
    rp = np.array([0, 2, 3, 6])
    cp = np.array([0, 3, 6])
    bptr, bindex, vptr, vvals = [0], [], [0], []
    for bi in range(3):
        for bj in range(2):
            blk = d[rp[bi]:rp[bi + 1], cp[bj]:cp[bj + 1]]
            if np.any(blk != 0):
                bindex.append(bj)
                vvals.extend(blk.reshape(-1, order="F"))
                vptr.append(len(vvals))
        bptr.append(len(bindex))
    lis.lis_matrix_set_vbr(len(vvals), 3, 2, len(bindex), rp, cp,
                           np.array(vptr), np.array(bptr),
                           np.array(bindex), np.array(vvals), A)
    lis.lis_matrix_assemble(A)
    np.testing.assert_allclose(np.asarray(A.m.to_dense()), d)


def test_matrix_ops_surface():
    """copy / scale / is_assembled / unset / set_values / value_csr /
    malloc buffers (man lis_matrix_*.3)."""
    d = _tri5_dense()
    A = _handle()
    assert lis.lis_matrix_is_assembled(A) == 0
    lis.lis_matrix_set_values(lis.LIS_INS_VALUE, 6, d.reshape(-1), A)
    lis.lis_matrix_assemble(A)
    assert lis.lis_matrix_is_assembled(A) == 1
    np.testing.assert_allclose(np.asarray(A.m.to_dense()), d)

    B = lis.lis_matrix_create(0)
    lis.lis_matrix_copy(A, B)
    np.testing.assert_allclose(np.asarray(B.m.to_dense()), d)

    # row scaling: D^-1 A has unit diagonal; d receives the scaling
    bvec = lis.lis_vector_create(0)
    lis.lis_vector_set_size(bvec, 0, 6)
    lis.lis_vector_set_all(2.0, bvec)
    dvec = lis.lis_vector_create(0)
    lis.lis_matrix_scale(A, bvec, dvec, 1)
    np.testing.assert_allclose(np.diag(np.asarray(A.m.to_dense())), 1.0)
    np.testing.assert_allclose(np.asarray(dvec.value), 1.0 / np.diag(d))
    np.testing.assert_allclose(np.asarray(bvec.value), 2.0 / np.diag(d))

    # structure-preserving CSR value update
    assert lis.lis_matrix_set_value_csr(lis.LIS_INS_VALUE, 0, 1, -9.0,
                                        B) == lis.LIS_SUCCESS
    assert np.asarray(B.m.to_dense())[0, 1] == -9.0
    lis.lis_matrix_unset(B)
    assert B.m is not None

    ptr, idx, val = lis.lis_matrix_malloc_csr(6, 16)
    assert ptr.shape == (7,) and idx.shape == (16,) and val.dtype == float
    assert lis.lis_is_malloc(val) == 1


def test_vector_ops_surface():
    """The full lis_vector_* BLAS-1 set (man lis_vector_*.3)."""
    v = lis.lis_vector_create(0)
    lis.lis_vector_set_size(v, 0, 5)
    lis.lis_vector_set_values(lis.LIS_INS_VALUE, 3, np.array([0, 2, 4]),
                              np.array([1.0, -2.0, 3.0]), v)
    lis.lis_vector_set_values2(lis.LIS_ADD_VALUE, 1, 2,
                               np.array([0.5, 0.5]), v)
    np.testing.assert_allclose(np.asarray(v.value),
                               [1.0, 0.5, -1.5, 0.0, 3.0])
    assert lis.lis_vector_get_size(v) == (5, 5)
    assert lis.lis_vector_get_range(v) == (0, 5)
    assert lis.lis_vector_nrm1(v) == 6.0
    assert lis.lis_vector_nrmi(v) == 3.0
    assert lis.lis_vector_sum(v) == 3.0

    w = lis.lis_vector_duplicate(v)
    lis.lis_vector_set_all(2.0, w)
    assert lis.lis_vector_nhdot(v, w) == 6.0
    z = lis.lis_vector_duplicate(v)
    lis.lis_vector_axpyz(3.0, v, w, z)       # z = 3v + w
    np.testing.assert_allclose(np.asarray(z.value),
                               3 * np.asarray(v.value) + 2.0)
    lis.lis_vector_xpay(v, 0.5, z)           # z = v + 0.5 z
    lis.lis_vector_pmul(v, w, z)
    np.testing.assert_allclose(np.asarray(z.value), 2 * np.asarray(v.value))
    lis.lis_vector_pdiv(z, w, z)
    np.testing.assert_allclose(np.asarray(z.value), np.asarray(v.value))
    lis.lis_vector_abs(z)
    assert float(z.value.min()) >= 0
    lis.lis_vector_shift(1.0, z)
    np.testing.assert_allclose(np.asarray(z.value),
                               np.abs(np.asarray(v.value)) - 1.0)
    lis.lis_vector_set_all(4.0, z)
    lis.lis_vector_reciprocal(z)
    np.testing.assert_allclose(np.asarray(z.value), 0.25)
    a, bvec = lis.lis_vector_duplicate(v), lis.lis_vector_duplicate(v)
    lis.lis_vector_set_all(1.0, a)
    lis.lis_vector_set_all(2.0, bvec)
    lis.lis_vector_swap(a, bvec)
    assert float(a.value[0]) == 2.0 and float(bvec.value[0]) == 1.0
    buf = np.zeros(5)
    lis.lis_vector_gather(v, buf)
    np.testing.assert_allclose(buf, np.asarray(v.value))
    lis.lis_vector_scatter(buf * 2, a)
    np.testing.assert_allclose(np.asarray(a.value), buf * 2)


def test_array_ops_surface():
    """The full lis_array_* set on raw column-major buffers
    (man lis_array_*.3)."""
    rng = np.random.RandomState(7)
    n = 4
    a = rng.randn(n * n)
    b = rng.randn(n * n)
    c = np.zeros(n * n)
    x = rng.randn(n)
    y = np.zeros(n)

    am = a.reshape(n, n, order="F")
    bm = b.reshape(n, n, order="F")

    lis.lis_array_matvech(n, a, x, y, lis.LIS_INS_VALUE)
    np.testing.assert_allclose(y, am.T @ x)
    lis.lis_array_matmat(n, a, b, c, lis.LIS_INS_VALUE)
    np.testing.assert_allclose(c.reshape(n, n, order="F"), am @ bm,
                               rtol=1e-12)
    # non-square with leading dimensions
    c2 = np.zeros(3 * 2)
    lis.lis_array_matmat_ns(3, 2, 4, a, 4, b, 4, c2, 3, lis.LIS_INS_VALUE)
    np.testing.assert_allclose(c2.reshape(3, 2, order="F"),
                               am[:3, :] @ bm[:, :2], rtol=1e-12)
    y2 = np.zeros(3)
    lis.lis_array_matvec_ns(3, 4, a, 4, x, y2, lis.LIS_INS_VALUE)
    np.testing.assert_allclose(y2, am[:3, :] @ x)

    inv = a.copy()
    lis.lis_array_ge(n, inv)
    np.testing.assert_allclose(inv.reshape(n, n, order="F") @ am,
                               np.eye(n), atol=1e-10)

    q, r = np.zeros(n * n), np.zeros(n * n)
    for fac in (lis.lis_array_cgs, lis.lis_array_mgs):
        fac(n, a.copy(), q, r)
        qm = q.reshape(n, n, order="F")
        rm = r.reshape(n, n, order="F")
        np.testing.assert_allclose(qm @ rm, am, atol=1e-10)
        np.testing.assert_allclose(qm.T @ qm, np.eye(n), atol=1e-10)
        assert np.allclose(rm, np.triu(rm))

    # QR eigenvalue iteration on a symmetric matrix
    s = am + am.T
    sa = s.reshape(-1, order="F").copy()
    it, err = lis.lis_array_qr(n, sa, q, r)
    assert err < 1e-10
    evals = np.sort(np.diag(sa.reshape(n, n, order="F")))
    np.testing.assert_allclose(evals, np.sort(np.linalg.eigvalsh(s)),
                               atol=1e-6)

    # BLAS-1 family
    u = np.array([1.0, -2.0, 3.0])
    w = np.array([2.0, 2.0, 2.0])
    assert lis.lis_array_dot(3, u, w) == 4.0
    assert lis.lis_array_nhdot(3, u, w) == 4.0
    assert lis.lis_array_nrm1(3, u) == 6.0
    assert lis.lis_array_nrmi(3, u) == 3.0
    assert lis.lis_array_sum(3, u) == 2.0
    z = np.zeros(3)
    lis.lis_array_axpyz(3, 2.0, u, w, z)
    np.testing.assert_allclose(z, 2 * u + w)
    lis.lis_array_axpy(3, -1.0, u, w)
    np.testing.assert_allclose(w, 2.0 - u)
    lis.lis_array_pmul(3, u, u, z)
    np.testing.assert_allclose(z, u * u)
    lis.lis_array_pdiv(3, z, u, z)
    np.testing.assert_allclose(z, u)
    lis.lis_array_scale(3, 2.0, z)
    np.testing.assert_allclose(z, 2 * u)
    lis.lis_array_abs(3, z)
    lis.lis_array_shift(3, 1.0, z)
    np.testing.assert_allclose(z, 2 * np.abs(u) - 1)
    lis.lis_array_reciprocal(3, w)
    np.testing.assert_allclose(w, 1.0 / (2.0 - u))
    t1, t2 = u.copy(), 5 * u
    lis.lis_array_swap(3, t1, t2)
    np.testing.assert_allclose(t1, 5 * u)
    lis.lis_array_copy(3, t1, t2)
    np.testing.assert_allclose(t2, t1)


def test_solver_esolver_getter_surface():
    """solve_setup / get_precon(+name); esolver evectors / specific-mode /
    iters / residualnorms / rhistory / time getters (man lis_*_get_*.3)."""
    n = 30
    A = _handle(n)
    for i in range(n):
        lis.lis_matrix_set_value(lis.LIS_INS_VALUE, i, i, 2.0, A)
        if i:
            lis.lis_matrix_set_value(lis.LIS_INS_VALUE, i, i - 1, -1.0, A)
            lis.lis_matrix_set_value(lis.LIS_INS_VALUE, i - 1, i, -1.0, A)
    lis.lis_matrix_assemble(A)

    s = lis.lis_solver_create()
    lis.lis_solver_set_option("-i cg -p ssor -tol 1e-10", s)
    lis.lis_solve_setup(A, s)
    p = lis.lis_precon_psd_create(s)
    b = lis.lis_vector_create(0)
    lis.lis_vector_set_size(b, 0, n)
    lis.lis_vector_set_all(1.0, b)
    x = lis.lis_vector_duplicate(b)
    assert lis.lis_solve_kernel(A, b, x, s, p) == lis.LIS_SUCCESS
    assert lis.lis_solver_get_preconname(lis.lis_solver_get_precon(s)) \
        == "ssor"

    es = lis.lis_esolver_create()
    # etol with headroom: deflated subspace iteration floors later modes
    # near the tol of the earlier converged vectors (same behavior as the
    # reference's sequential deflation, lis_esolver_si.c:230-330)
    lis.lis_esolver_set_option("-e si -ss 4 -emaxiter 3000 -etol 1e-6", es)
    ex = lis.lis_vector_duplicate(b)
    st, ev = lis.lis_esolve(A, ex, es)
    assert st == lis.LIS_SUCCESS
    M = lis.lis_matrix_create(0)
    lis.lis_esolver_get_evectors(es, M)
    evs = lis.lis_esolver_get_evalues(es)
    dense = np.asarray(A.m.to_dense())
    vecs = np.asarray(M.m.to_dense())
    # each returned pair is a true eigenpair
    for k in range(min(2, vecs.shape[1])):
        lam = lis.lis_esolver_get_specific_evalue(es, k)
        vk = lis.lis_vector_duplicate(b)
        lis.lis_esolver_get_specific_evector(es, k, vk)
        vkv = np.asarray(vk.value)
        assert np.linalg.norm(dense @ vkv - lam * vkv) < 1e-4
        assert lis.lis_esolver_get_specific_iter(es, k) >= 0
        assert lis.lis_esolver_get_specific_residualnorm(es, k) < 1e-5
    assert len(lis.lis_esolver_get_iters(es)) == len(evs)
    assert len(lis.lis_esolver_get_residualnorms(es)) == len(evs)
    assert lis.lis_esolver_get_rhistory(es) is not None
    assert lis.lis_esolver_get_time(es) >= 0.0
    assert lis.lis_iesolver_destroy(es) == lis.LIS_SUCCESS


def test_user_precon_register_compat():
    """lis_precon_register: a user preconditioner reachable via -p <name>
    (man lis_precon_register.3)."""
    n = 40
    A = _handle(n)
    for i in range(n):
        lis.lis_matrix_set_value(lis.LIS_INS_VALUE, i, i, 3.0, A)
        if i:
            lis.lis_matrix_set_value(lis.LIS_INS_VALUE, i, i - 1, -1.0, A)
            lis.lis_matrix_set_value(lis.LIS_INS_VALUE, i - 1, i, -1.0, A)
    lis.lis_matrix_assemble(A)

    def pcreate(m, opts):
        return 1.0 / m.get_diagonal()

    def psolve(state, r):
        return state * r

    assert lis.lis_precon_register("mydiag", pcreate, psolve) \
        == lis.LIS_SUCCESS
    from lis_tpu import solve
    res = solve(A.m, np.ones(n), options="-i cg -p mydiag -tol 1e-10")
    assert res.status == lis.LIS_SUCCESS
    assert res.true_resid < 1e-9
    lis.lis_precon_register_free()
    from lis_tpu.precon.base import PRECON_REGISTRY
    assert "mydiag" not in PRECON_REGISTRY


def test_psd_matches_direct_solve_with_scaling():
    """PSD factors must be built on the same scaled operator
    lis_solve_kernel iterates on: -p is forces Jacobi scaling
    (lis_solver.c:613-626), so a PSD solve must converge like the direct
    lis_solve, not like IS-on-unscaled (508 vs 26 iterations class of
    mismatch)."""
    n = 60
    A = _handle(n)
    rng = np.random.RandomState(3)
    d = rng.uniform(5.0, 50.0, n)          # strongly non-unit diagonal
    for i in range(n):
        lis.lis_matrix_set_value(lis.LIS_INS_VALUE, i, i, d[i], A)
        if i:
            lis.lis_matrix_set_value(lis.LIS_INS_VALUE, i, i - 1, -1.0, A)
            lis.lis_matrix_set_value(lis.LIS_INS_VALUE, i - 1, i, -1.0, A)
    lis.lis_matrix_assemble(A)
    b = lis.lis_vector_create(0)
    lis.lis_vector_set_size(b, 0, n)
    lis.lis_vector_set_all(1.0, b)

    for optstr in ("-i bicgstab -p is -tol 1e-10",
                   "-i gmres -p ilu -tol 1e-10"):
        s1 = lis.lis_solver_create()
        lis.lis_solver_set_option(optstr, s1)
        x1 = lis.lis_vector_duplicate(b)
        assert lis.lis_solve(A, b, x1, s1) == lis.LIS_SUCCESS

        s2 = lis.lis_solver_create()
        lis.lis_solver_set_option(optstr, s2)
        lis.lis_solver_set_matrix(A, s2)
        p = lis.lis_precon_psd_create(s2)
        x2 = lis.lis_vector_duplicate(b)
        assert lis.lis_solve_kernel(A, b, x2, s2, p) == lis.LIS_SUCCESS
        assert abs(lis.lis_solver_get_iter(s2)
                   - lis.lis_solver_get_iter(s1)) <= 1, optstr


def test_vector_dot_is_hermitian_complex():
    """lis_vector_dot conjugates u (man lis_vector_dot.3): <u,u> = ||u||^2
    even for purely imaginary u; nhdot is the unconjugated product."""
    import jax.numpy as jnp
    u = lis.lis_vector_create(0)
    u.n = 3
    u.value = jnp.asarray(np.array([1j, 2j, 0.0]))
    assert lis.lis_vector_dot(u, u) == 5.0
    assert lis.lis_vector_nhdot(u, u) == -5.0
    assert lis.lis_vector_sum(u) == 3j
    assert lis.lis_vector_get_value(u, 1) == 2j


def test_set_coo_preserves_complex():
    """lis_matrix_set_* adopt LIS_SCALAR (complex) arrays without
    truncation."""
    import scipy.sparse as sp
    d = _tri5_dense() + 1j * np.eye(6)
    A = _handle(mtype=lis.LIS_MATRIX_COO)
    coo = sp.coo_matrix(d)
    lis.lis_matrix_set_coo(coo.nnz, coo.row, coo.col, coo.data, A)
    lis.lis_matrix_assemble(A)
    np.testing.assert_allclose(np.asarray(A.m.to_dense()), d)


def test_get_preconname_user_registered():
    """get_precon/get_preconname round-trip for a user preconditioner
    (ids number from LIS_PRECON_TYPE_USERDEF)."""
    n = 20
    A = _handle(n)
    for i in range(n):
        lis.lis_matrix_set_value(lis.LIS_INS_VALUE, i, i, 4.0, A)
    lis.lis_matrix_assemble(A)
    lis.lis_precon_register("udiag2", lambda m, o: 1.0 / m.get_diagonal(),
                            lambda st, r: st * r)
    from lis_tpu import solve
    res = solve(A.m, np.ones(n), options="-i cg -p udiag2 -tol 1e-10")
    assert res.status == lis.LIS_SUCCESS
    pid = res.options.precon_id
    assert lis.lis_solver_get_preconname(pid) == "udiag2"
    lis.lis_precon_register_free()


def test_matrix_get_range_is_zero_based():
    """compat (C-parity) returns the reference C semantics is=0, ie=n;
    the +1 Fortran shift lives in the binding layer (lisf_matrix.c
    analogue: interop.fapi)."""
    A = _handle(10)
    assert lis.lis_matrix_get_range(A) == (0, 10)
    from lis_tpu.interop import fapi
    h = fapi.matrix_create(0)
    fapi.matrix_set_size(h, 0, 10)
    assert fapi.matrix_get_range_is(h) == 1
    assert fapi.matrix_get_range_ie(h) == 11


def test_full_lis_h_surface_present():
    """Every public lis_* function declared in the reference's lis.h
    exists in compat (the managed-runtime memory functions are honest
    no-ops)."""
    import re
    import lis_tpu.compat as c
    hdr = open("/root/reference/include/lis.h").read()
    pub = (set(re.findall(r"extern LIS_INT (lis_\w+)", hdr))
           | set(re.findall(r"extern \w+ (lis_\w+)\(", hdr)))
    missing = sorted(n for n in pub if not hasattr(c, n))
    assert not missing, missing
    assert isinstance(c.lis_date(), str)
    c.lis_do_not_handle_mpi()
    c.lis_free(None)
    c.lis_free2(2, None, None)
