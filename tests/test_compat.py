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
