"""Iteration-count parity against the reference's own test matrix.

Ground truth measured by building the reference (configure --enable-quad &&
make) and running ``test1 testmat.mtx 1 -i <solver> -tol 1e-12`` — the
lsolve smoke test of test/test.sh.  The reference accepts tolerance-based
parity across its own serial/OMP/MPI builds (doc/lis-ug-en.tex:576-640);
we assert the same band (±2 iterations), with the two product-type methods
that converge *faster* here noted explicitly.
"""

import os

import numpy as np
import pytest

import lis_tpu
from lis_tpu import solve

TESTMAT = "/root/reference/test/testmat.mtx"

# solver -> iterations of the reference binary (BiCG default tol 1e-12)
REFERENCE_ITERS = {
    "cg": 15, "bicg": 15, "cgs": 15, "bicgstab": 15, "bicgstabl": 15,
    "tfqmr": 15, "orthomin": 15, "gmres": 15, "bicgsafe": 15, "cr": 15,
    "bicr": 15, "crs": 15, "bicrstab": 15, "bicrsafe": 15, "fgmres": 15,
    "idrs": 23, "idr1": 28, "minres": 15,
    # product-type exceptions: this implementation converges in fewer
    # iterations than the reference (14 vs 20 / 29 vs 26)
    "gpbicg": (14, 20), "gpbicr": (26, 29),
}


@pytest.fixture(scope="module")
def testmat():
    if not os.path.exists(TESTMAT):
        pytest.skip("reference testmat.mtx not available")
    return lis_tpu.read_matrix_market(TESTMAT)


def test_bicg_testmat_headline(testmat):
    """The user-guide headline run: BiCG, no precon, 15 iterations,
    relative residual ≈e-16 (doc/lis-ug-en.tex:576-640)."""
    b = np.ones(testmat.nrows)
    res = solve(testmat, b, options="-i bicg -tol 1e-12")
    assert res.status == lis_tpu.LIS_SUCCESS
    assert res.iters == 15
    assert res.resid < 1e-12


@pytest.mark.parametrize("name", sorted(REFERENCE_ITERS))
def test_iteration_parity(testmat, name):
    b = np.ones(testmat.nrows)
    res = solve(testmat, b, options=f"-i {name} -tol 1e-12 -maxiter 1000")
    assert res.status == lis_tpu.LIS_SUCCESS, (name, res)
    expected = REFERENCE_ITERS[name]
    if isinstance(expected, tuple):
        lo, hi = expected
        assert lo - 2 <= res.iters <= hi + 2, (name, res.iters, expected)
    else:
        assert abs(res.iters - expected) <= 2, (name, res.iters, expected)


def test_quad_gamma_parity():
    """test5 200 2.0: reference quad BiCG converges in 231 iterations
    (double: LIS_MAXITER); this implementation: ≈228."""
    from lis_tpu.utils.testmat import gamma_matrix
    g = gamma_matrix(200, 2.0)
    b = np.asarray(g.to_dense() @ np.ones(200))
    rq = solve(g, b, options="-i bicg -f quad -tol 1e-12 -maxiter 500")
    assert rq.status == lis_tpu.LIS_SUCCESS
    assert abs(rq.iters - 231) < 60


# preconditioner iteration parity, ground truth from the built reference:
# test1 testmat.mtx 1 -i bicgstab -p <name> -tol 1e-12 (round 2)
PRECON_REFERENCE_ITERS = {
    "jacobi": 15, "ssor": 12, "ilu": 11, "ilut": 6, "iluc": 8,
    "is": 26, "sainv": 14, "hybrid": 7,
}


@pytest.mark.parametrize("p", sorted(PRECON_REFERENCE_ITERS))
def test_precon_iteration_parity(testmat, p):
    """-auto_storage false keeps the exact level-scheduled triangular
    apply (the default TPU relaxed-sweep apply trades a few extra cheap
    iterations for stream-speed psolves; -ssor_sweeps 6 recovers the
    exact counts there too)."""
    b = np.ones(testmat.nrows)
    res = solve(testmat, b, options=f"-i bicgstab -p {p} -tol 1e-12 "
                                    "-maxiter 1000 -auto_storage false")
    assert res.status == lis_tpu.LIS_SUCCESS, (p, res)
    expected = PRECON_REFERENCE_ITERS[p]
    # converging FASTER than the reference is fine (hybrid does: its
    # inner iteration is a fully-converging compiled loop); everything
    # else must land in a band so a semantics change can't hide behind
    # "stronger-but-slower" or "weaker-but-luckier" drift
    assert res.iters <= expected + 3, (p, res.iters, expected)
    if p != "hybrid":
        assert res.iters >= expected - 3, (p, res.iters, expected)


# block ILU(k) on BSR, ground truth from the built reference:
# lsolve testmat.mtx 1 -i <s> -p ilu -storage 7 -storage_block <bnr>
BILU_REFERENCE = [
    ("bicg", 2, 0, 17), ("bicg", 3, 0, 11), ("bicg", 2, 1, 9),
    ("gmres", 2, 0, 16), ("bicgstab", 2, 0, 10),
]


@pytest.mark.parametrize("s,bnr,fill,expected", BILU_REFERENCE)
def test_block_ilu_parity(testmat, s, bnr, fill, expected):
    """-p ilu on a BSR-stored matrix runs the block factorization
    (lis_precon_iluk.c:1289/:1670) — iteration counts must track the
    reference's block-ILU, not the scalar CSR ILU."""
    b = np.ones(testmat.nrows)
    res = solve(testmat, b,
                options=f"-i {s} -p ilu -ilu_fill {fill} -storage bsr "
                        f"-storage_block {bnr} -tol 1e-12 -maxiter 1000")
    assert res.status == lis_tpu.LIS_SUCCESS, (s, bnr, fill, res)
    assert abs(res.iters - expected) <= 2, (s, bnr, fill, res.iters,
                                            expected)


# variable-block ILU(k) on VBR, ground truth from the built reference:
# lsolve testmat.mtx 1 -i <s> -p ilu -ilu_fill <f> -storage 9
# (automatic partition via lis_matrix_get_vbr_rowcol).  BiCG is absent:
# the reference's lis_psolveh_iluk_vbr is unimplemented and errors out.
VBILU_REFERENCE = [
    ("gmres", 0, 17), ("gmres", 1, 13),
    ("bicgstab", 0, 11), ("bicgstab", 1, 8),
]


@pytest.mark.parametrize("s,fill,expected", VBILU_REFERENCE)
def test_vbr_block_ilu_parity(testmat, s, fill, expected):
    """-p ilu on a VBR-stored matrix runs the variable-block factorization
    (lis_precon_iluk.c:2220/:2619) with the reference's automatic
    sparsity-pattern partition (lis_matrix_vbr.c:262)."""
    b = np.ones(testmat.nrows)
    res = solve(testmat, b,
                options=f"-i {s} -p ilu -ilu_fill {fill} -storage vbr "
                        "-tol 1e-12 -maxiter 1000")
    assert res.status == lis_tpu.LIS_SUCCESS, (s, fill, res)
    assert abs(res.iters - expected) <= 2, (s, fill, res.iters, expected)


def test_vbr_block_ilu_bicg_transpose_apply(testmat):
    """BiCG needs M⁻ᴴ; the reference errors out on VBR (psolveh
    unimplemented) — here the transposed apply is complete."""
    b = np.ones(testmat.nrows)
    res = solve(testmat, b, options="-i bicg -p ilu -storage vbr "
                                    "-tol 1e-12 -maxiter 1000")
    assert res.status == lis_tpu.LIS_SUCCESS
    assert res.resid < 1e-12


# block-Jacobi scaling (-scale 1 -storage bsr), ground truth from the built
# reference: lsolve testmat.mtx 1 -i <s> -scale 1 -storage 7 -storage_block <b>
# (lis_solve_kernel :659-691 converts to BSR, inverts the block diagonal and
# bscales A and b; CG's scale upgrade is bypassed on this branch)
BSCALE_REFERENCE = [
    ("bicg", 2, 24), ("cg", 2, 62), ("bicgstab", 2, 17), ("gmres", 3, 38),
]


@pytest.mark.parametrize("s,bnr,expected", BSCALE_REFERENCE)
def test_block_scale_parity(testmat, s, bnr, expected):
    b = np.ones(testmat.nrows)
    res = solve(testmat, b,
                options=f"-i {s} -scale 1 -storage bsr -storage_block {bnr} "
                        "-tol 1e-12 -maxiter 1000")
    assert res.status == lis_tpu.LIS_SUCCESS, (s, bnr, res)
    assert abs(res.iters - expected) <= 5, (s, bnr, res.iters, expected)
    assert res.true_resid < 1e-10


def test_scaled_ssor_not_degraded(testmat):
    """The reference creates preconditioners BEFORE lis_solve_kernel
    scales A and b (lis_solver.c:385→441), so its -scale 1 -p ssor combo
    preconditions with the unscaled split while iterating the scaled
    system and degrades itself (22 vs 12 BiCGSTAB iterations on
    testmat).  We factor the operator actually iterated: scaled SSOR
    keeps the unscaled iteration count.  Jacobi/ILU/ILUT preconditioned
    operators are invariant under row scaling, so those combos match the
    reference either way (test_precon_iteration_parity covers them)."""
    b = np.ones(testmat.nrows)
    r0 = solve(testmat, b, options="-i bicgstab -p ssor -tol 1e-12 "
                                   "-auto_storage false")
    r1 = solve(testmat, b, options="-i bicgstab -p ssor -scale 1 -tol 1e-12 "
                                   "-auto_storage false")
    assert abs(r1.iters - r0.iters) <= 2, (r0.iters, r1.iters)
    assert r1.iters <= 22  # strictly better than the reference's 22


# eigensolver parity, ground truth from the built reference:
# etest1 testmat.mtx -e <n> -etol 1e-8 (round 2)
ESOLVER_REFERENCE = {
    "pi": (7.365014, 143), "ii": (0.1620281, 13),
    "cg": (0.1620281, 24), "cr": (0.1620281, 32),
}


@pytest.mark.parametrize("e", sorted(ESOLVER_REFERENCE))
def test_esolver_iteration_parity(testmat, e):
    from lis_tpu import esolve
    ev, it = ESOLVER_REFERENCE[e]
    r = esolve(testmat, options=f"-e {e} -etol 1e-8 -emaxiter 2000")
    assert r.status == lis_tpu.LIS_SUCCESS
    assert abs(r.evalue - ev) < 1e-5 * max(abs(ev), 1)
    assert abs(r.iters - it) <= 2, (e, r.iters, it)


def test_si_parity_smallest_pairs(testmat):
    """etest1 testmat.mtx -e 6 -ss 3: 0.162028 (13 iters), 0.398507,
    0.398507 (a multiplicity-2 pair) — the deflated sequential inverse
    iteration reproduces all three."""
    from lis_tpu import esolve
    r = esolve(testmat, options="-e si -ss 3 -etol 1e-8 -emaxiter 2000")
    np.testing.assert_allclose(r.evalues,
                               [0.1620281, 0.3985070, 0.3985070], atol=1e-5)
    assert abs(int(r.iters_all[0]) - 13) <= 2


def test_conv_cond_and_scale_parity(testmat):
    """Ground truth from the built reference: test1 testmat.mtx 1
    -i bicgstab -tol 1e-10 with -conv_cond {0,1,2} -> 14/14/1 iterations
    and -scale {1,2} -> 14/14 (ours counts one fewer consistently)."""
    b = np.ones(testmat.nrows)
    for cc, ref in ((0, 14), (1, 14), (2, 1)):
        r = solve(testmat, b, options=f"-i bicgstab -tol 1e-10 "
                                      f"-conv_cond {cc}")
        assert abs(r.iters - ref) <= 2, (cc, r.iters, ref)
    for s in (1, 2):
        r = solve(testmat, b, options=f"-i bicgstab -tol 1e-10 -scale {s}")
        assert abs(r.iters - 14) <= 2, (s, r.iters)


def test_poisson2d_parity():
    """test2 30 30 1 (2-D 5-pt Poisson, 900 rows) against the built
    reference: GMRES+ILU 33, CG+SSOR 39 iterations (exact-apply mode)."""
    from tests.problems import poisson2d
    a = poisson2d(30, 30)
    b = np.ones(900)
    r = solve(a, b, options="-i gmres -p ilu -tol 1e-10 -auto_storage false")
    assert abs(r.iters - 33) <= 2, r.iters
    r = solve(a, b, options="-i cg -p ssor -tol 1e-10 -auto_storage false")
    assert abs(r.iters - 39) <= 2, r.iters


def test_generalized_eigensolver_parity(testmat):
    """Pencil Ax = λBx against the built reference (getest5 testmat.mtx
    massB, B = tridiag(4,-1)): gpi 2.181504 @111, gii 0.0788490 @14,
    gcr 0.0788490 @35 (reference gcg itself diverges to nan on this
    pencil; ours converges — not asserted)."""
    from lis_tpu import gesolve
    from tests.problems import tridiag
    B = tridiag(100, diag=4.0)
    for e, ev, it in (("gpi", 2.181504, 111), ("gii", 0.07884905, 14),
                      ("gcr", 0.07884905, 35)):
        r = gesolve(testmat, B, options=f"-e {e} -etol 1e-8 -emaxiter 3000")
        assert r.status == lis_tpu.LIS_SUCCESS, e
        assert abs(r.evalue - ev) < 1e-5, (e, r.evalue)
        assert abs(r.iters - it) <= 5, (e, r.iters, it)


def test_hpcg_kernel_parity():
    """hpcg_kernel flow (test3b 32 32 32: CG + SSOR + additive Schwarz on
    the 27-pt operator) against the built reference: 31 iterations —
    iteration-EXACT with the exact triangular apply, +1 with the TPU
    relaxed-sweep apply."""
    import jax.numpy as jnp
    from lis_tpu.utils.testmat import poisson3d27
    A = poisson3d27(32, 32, 32)
    b = A.matvec(jnp.ones(A.nrows))
    r = solve(A, b, options="-i cg -p ssor -adds true -tol 1e-12 "
                            "-auto_storage false")
    assert r.status == lis_tpu.LIS_SUCCESS
    assert abs(r.iters - 31) <= 1, r.iters


def test_use_at_explicit_transpose_parity(testmat):
    """-use_at true gives BiCG an explicitly materialised Aᴴ for its dual
    matvec (lis_solver.c:836-843 builds a CSC copy); iteration counts
    match the implicit-transpose path and the reference (15)."""
    b = np.ones(testmat.nrows)
    on = solve(testmat, b, options="-i bicg -use_at true -tol 1e-12")
    off = solve(testmat, b, options="-i bicg -use_at false -tol 1e-12")
    assert on.status == off.status == lis_tpu.LIS_SUCCESS
    assert on.iters == off.iters == 15
    assert on.resid < 1e-12
    # the explicit-Aᴴ operator is really in use: matvech must equal Aᵀx
    from lis_tpu.matrix.useat import with_explicit_transpose
    m = with_explicit_transpose(testmat)
    x = np.random.default_rng(2).standard_normal(testmat.nrows)
    import jax.numpy as jnp
    np.testing.assert_allclose(np.asarray(m.matvech(jnp.asarray(x))),
                               testmat.to_dense().T @ x, rtol=1e-12)


# parameter-variant parity, ground truth from the built reference:
# lsolve testmat.mtx 1 <opts> -tol 1e-12.  gmres -restart 10 converges
# FASTER here (50 vs 64: restarted-GMRES counts are sensitive to the
# restart bookkeeping; beating the reference is acceptable).
PARAM_REFERENCE = [
    ("-i bicgstabl -ell 4", 15, 15),
    ("-i idrs -irestart 4", 19, 19),
    ("-i orthomin -m 5", 15, 15),
    ("-i gmres -restart 10", 45, 64),
]


@pytest.mark.parametrize("opt,lo,hi", PARAM_REFERENCE)
def test_parameter_variant_parity(testmat, opt, lo, hi):
    b = np.ones(testmat.nrows)
    res = solve(testmat, b, options=f"{opt} -tol 1e-12 -maxiter 1000")
    assert res.status == lis_tpu.LIS_SUCCESS, (opt, res)
    assert lo - 2 <= res.iters <= hi + 2, (opt, res.iters, (lo, hi))
