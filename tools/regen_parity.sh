#!/bin/bash
# Regenerate every hard-coded ground-truth constant in tests/test_parity.py
# and tests/test_esolvers.py from the reference binaries.
#
# The reference tree is read-only, so it is configured/built out-of-tree
# into $BUILD (default /tmp/lis-ref-build).  Takes ~5-10 minutes once;
# binaries are reused on re-runs.
#
# Usage:  tools/regen_parity.sh [reference-dir] [build-dir]
# Output: the measured tables on stdout, in the exact Python-literal
#         layout of the test files, ready to diff/paste.
set -euo pipefail

REF=${1:-/root/reference}
BUILD=${2:-/tmp/lis-ref-build}
MTX=$REF/test/testmat.mtx

mkdir -p "$BUILD"
if [ ! -x "$BUILD/test/lsolve" ] && [ ! -x "$BUILD/test/test1" ]; then
    (cd "$BUILD" && "$REF/configure" --enable-quad --enable-omp=no \
        > configure.log 2>&1 && make -j2 > make.log 2>&1)
fi
T=$BUILD/test
LS=$T/lsolve; [ -x "$LS" ] || LS=$T/test1
ES=$T/esolve; [ -x "$ES" ] || ES=$T/etest1

iters() {  # iters <binary args...>
    "$@" 2>/dev/null | sed -n 's/.*number of iterations = \([0-9]*\).*/\1/p' | head -1
}

echo "# REFERENCE_ITERS (test_parity.py:22) — lsolve testmat 1 -i <s> -tol 1e-12"
for s in cg bicg cgs bicgstab bicgstabl tfqmr orthomin gmres bicgsafe cr \
         bicr crs bicrstab bicrsafe fgmres idrs idr1 minres gpbicg gpbicr; do
    printf '    "%s": %s,\n' "$s" "$(iters "$LS" "$MTX" 1 /dev/null /dev/null -i "$s" -tol 1.0e-12 -maxiter 1000)"
done

echo "# PRECON_REFERENCE_ITERS (test_parity.py:76) — -i bicgstab -p <p>"
for p in jacobi ssor ilu ilut iluc is sainv hybrid; do
    printf '    "%s": %s,\n' "$p" "$(iters "$LS" "$MTX" 1 /dev/null /dev/null -i bicgstab -p "$p" -tol 1.0e-12 -maxiter 1000)"
done

echo "# BILU_REFERENCE (test_parity.py:104) — -p ilu -storage 7 -storage_block <b>"
for row in "bicg 2 0" "bicg 3 0" "bicg 2 1" "gmres 2 0" "bicgstab 2 0"; do
    set -- $row
    printf '    ("%s", %s, %s, %s),\n' "$1" "$2" "$3" \
        "$(iters "$LS" "$MTX" 1 /dev/null /dev/null -i "$1" -p ilu -ilu_fill "$3" -storage 7 -storage_block "$2" -tol 1.0e-12 -maxiter 1000)"
done

echo "# VBILU_REFERENCE (test_parity.py:128) — -p ilu -storage 9"
for row in "gmres 0" "gmres 1" "bicgstab 0" "bicgstab 1"; do
    set -- $row
    printf '    ("%s", %s, %s),\n' "$1" "$2" \
        "$(iters "$LS" "$MTX" 1 /dev/null /dev/null -i "$1" -p ilu -ilu_fill "$2" -storage 9 -tol 1.0e-12 -maxiter 1000)"
done

echo "# BSCALE_REFERENCE (test_parity.py:161) — -scale 1 -storage 7"
for row in "bicg 2" "cg 2" "bicgstab 2" "gmres 3"; do
    set -- $row
    printf '    ("%s", %s, %s),\n' "$1" "$2" \
        "$(iters "$LS" "$MTX" 1 /dev/null /dev/null -i "$1" -scale 1 -storage 7 -storage_block "$2" -tol 1.0e-12 -maxiter 1000)"
done

echo "# ESOLVER_REFERENCE (test_parity.py:197) — etest1 -e <n> -etol 1e-8"
for e in pi ii cg cr; do
    out=$("$ES" "$MTX" /dev/null /dev/null -e "$e" -etol 1.0e-8 -emaxiter 2000 2>/dev/null)
    ev=$(echo "$out" | sed -n 's/.*eigenvalue *= \([-0-9.e+]*\).*/\1/ip' | head -1)
    it=$(echo "$out" | sed -n 's/.*number of iterations = \([0-9]*\).*/\1/p' | head -1)
    printf '    "%s": (%s, %s),\n' "$e" "$ev" "$it"
done
