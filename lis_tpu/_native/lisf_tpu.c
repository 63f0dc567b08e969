/* lisf_tpu — Fortran/C binding shim for lis_tpu.
 *
 * Role-equivalent of the reference's src/fortran/lisf_*.c layer (e.g.
 * lisf_solver.c, lisf_init.F): C functions with Fortran calling
 * conventions — trailing-underscore symbols, every argument passed by
 * reference, character arguments carrying a hidden trailing length —
 * so F77/F90 programs call lis_tpu exactly like they call Lis:
 *
 *     call lis_initialize(ierr)
 *     call lis_matrix_create(0, A, ierr)
 *     call lis_matrix_set_value(LIS_INS_VALUE, i, j, v, A, ierr)
 *     call lis_solver_set_option('-i cg -tol 1.0e-12', solver, ierr)
 *     call lis_solve(A, b, x, solver, ierr)
 *
 * The compute lives in the embedded CPython interpreter (lis_tpu runs on
 * JAX/XLA); handles are integers mapping to objects held by
 * lis_tpu.interop.fapi.  Build:
 *
 *   gcc -shared -fPIC lisf_tpu.c $(python3-config --includes) \
 *       $(python3-config --ldflags --embed) -o liblisf_tpu.so
 *
 * Each wrapper also has a no-underscore alias so plain C callers can use
 * the same library.
 */

#include <Python.h>
#include <string.h>

typedef long lisf_int;     /* LIS_INT analogue on the Fortran side */

static PyObject* g_api = NULL;   /* lis_tpu.interop.fapi module */

static int ensure_python(void) {
    if (g_api) return 0;
    if (!Py_IsInitialized()) Py_Initialize();
    g_api = PyImport_ImportModule("lis_tpu.interop.fapi");
    if (!g_api) { PyErr_Print(); return -1; }
    return 0;
}

static lisf_int call_ll(const char* name, const char* fmt, ...) {
    /* call fapi.<name>(...) returning an integer (or -1 on error) */
    va_list ap;
    if (ensure_python()) return -1;
    PyObject* fn = PyObject_GetAttrString(g_api, name);
    if (!fn) { PyErr_Print(); return -1; }
    va_start(ap, fmt);
    PyObject* args = Py_VaBuildValue(fmt, ap);
    va_end(ap);
    PyObject* res = PyObject_CallObject(fn, args);
    Py_XDECREF(args);
    Py_DECREF(fn);
    if (!res) { PyErr_Print(); return -1; }
    lisf_int out = (lisf_int)PyLong_AsLong(res);
    Py_DECREF(res);
    return out;
}

static double call_dd(const char* name, const char* fmt, ...) {
    va_list ap;
    if (ensure_python()) return 0.0;
    PyObject* fn = PyObject_GetAttrString(g_api, name);
    if (!fn) { PyErr_Print(); return 0.0; }
    va_start(ap, fmt);
    PyObject* args = Py_VaBuildValue(fmt, ap);
    va_end(ap);
    PyObject* res = PyObject_CallObject(fn, args);
    Py_XDECREF(args);
    Py_DECREF(fn);
    if (!res) { PyErr_Print(); return 0.0; }
    double out = PyFloat_AsDouble(res);
    Py_DECREF(res);
    return out;
}

#define F77(name) void name##_

/* ---- lifecycle ---------------------------------------------------------- */

F77(lis_initialize)(lisf_int* ierr) {
    *ierr = call_ll("initialize", "()");
}

F77(lis_finalize)(lisf_int* ierr) {
    *ierr = call_ll("finalize", "()");
}

/* ---- matrix ------------------------------------------------------------- */

F77(lis_matrix_create)(lisf_int* comm, lisf_int* A, lisf_int* ierr) {
    *A = call_ll("matrix_create", "(l)", (long)*comm);
    *ierr = (*A > 0) ? 0 : -1;
}

F77(lis_matrix_destroy)(lisf_int* A, lisf_int* ierr) {
    *ierr = call_ll("matrix_destroy", "(l)", (long)*A);
}

F77(lis_matrix_set_size)(lisf_int* A, lisf_int* local_n, lisf_int* global_n,
                         lisf_int* ierr) {
    *ierr = call_ll("matrix_set_size", "(lll)", (long)*A, (long)*local_n,
                    (long)*global_n);
}

F77(lis_matrix_set_type)(lisf_int* A, lisf_int* mtype, lisf_int* ierr) {
    *ierr = call_ll("matrix_set_type", "(ll)", (long)*A, (long)*mtype);
}

F77(lis_matrix_set_value)(lisf_int* flag, lisf_int* i, lisf_int* j,
                          double* value, lisf_int* A, lisf_int* ierr) {
    *ierr = call_ll("matrix_set_value", "(llldl)", (long)*flag, (long)*i,
                    (long)*j, *value, (long)*A);
}

F77(lis_matrix_assemble)(lisf_int* A, lisf_int* ierr) {
    *ierr = call_ll("matrix_assemble", "(l)", (long)*A);
}

/* ---- vector ------------------------------------------------------------- */

F77(lis_vector_create)(lisf_int* comm, lisf_int* v, lisf_int* ierr) {
    *v = call_ll("vector_create", "(l)", (long)*comm);
    *ierr = (*v > 0) ? 0 : -1;
}

F77(lis_vector_destroy)(lisf_int* v, lisf_int* ierr) {
    *ierr = call_ll("vector_destroy", "(l)", (long)*v);
}

F77(lis_vector_set_size)(lisf_int* v, lisf_int* local_n, lisf_int* global_n,
                         lisf_int* ierr) {
    *ierr = call_ll("vector_set_size", "(lll)", (long)*v, (long)*local_n,
                    (long)*global_n);
}

F77(lis_vector_set_all)(double* alpha, lisf_int* v, lisf_int* ierr) {
    *ierr = call_ll("vector_set_all", "(dl)", *alpha, (long)*v);
}

F77(lis_vector_set_value)(lisf_int* flag, lisf_int* i, double* value,
                          lisf_int* v, lisf_int* ierr) {
    *ierr = call_ll("vector_set_value", "(lldl)", (long)*flag, (long)*i,
                    *value, (long)*v);
}

F77(lis_vector_get_value)(lisf_int* v, lisf_int* i, double* value,
                          lisf_int* ierr) {
    *value = call_dd("vector_get_value", "(ll)", (long)*v, (long)*i);
    *ierr = 0;
}

F77(lis_vector_nrm2)(lisf_int* v, double* nrm, lisf_int* ierr) {
    *nrm = call_dd("vector_nrm2", "(l)", (long)*v);
    *ierr = 0;
}

/* ---- solver ------------------------------------------------------------- */

F77(lis_solver_create)(lisf_int* s, lisf_int* ierr) {
    *s = call_ll("solver_create", "()");
    *ierr = (*s > 0) ? 0 : -1;
}

F77(lis_solver_destroy)(lisf_int* s, lisf_int* ierr) {
    *ierr = call_ll("solver_destroy", "(l)", (long)*s);
}

/* Fortran character arg: pointer + hidden length appended after ierr */
F77(lis_solver_set_option)(const char* text, lisf_int* s, lisf_int* ierr,
                           long text_len) {
    char buf[1024];
    long n = text_len < 1023 ? text_len : 1023;
    memcpy(buf, text, (size_t)n);
    while (n > 0 && buf[n - 1] == ' ') --n;     /* trim F77 blank padding */
    buf[n] = '\0';
    *ierr = call_ll("solver_set_option", "(sl)", buf, (long)*s);
}

F77(lis_solve)(lisf_int* A, lisf_int* b, lisf_int* x, lisf_int* s,
               lisf_int* ierr) {
    *ierr = call_ll("solve", "(llll)", (long)*A, (long)*b, (long)*x,
                    (long)*s);
}

F77(lis_solver_get_iter)(lisf_int* s, lisf_int* iter, lisf_int* ierr) {
    *iter = call_ll("solver_get_iter", "(l)", (long)*s);
    *ierr = 0;
}

F77(lis_solver_get_residualnorm)(lisf_int* s, double* resid,
                                 lisf_int* ierr) {
    *resid = call_dd("solver_get_residualnorm", "(l)", (long)*s);
    *ierr = 0;
}

F77(lis_solver_get_status)(lisf_int* s, lisf_int* status, lisf_int* ierr) {
    *status = call_ll("solver_get_status", "(l)", (long)*s);
    *ierr = 0;
}

/* ---- eigensolver -------------------------------------------------------- */

F77(lis_esolver_create)(lisf_int* e, lisf_int* ierr) {
    *e = call_ll("esolver_create", "()");
    *ierr = (*e > 0) ? 0 : -1;
}

F77(lis_esolver_destroy)(lisf_int* e, lisf_int* ierr) {
    *ierr = call_ll("esolver_destroy", "(l)", (long)*e);
}

F77(lis_esolver_set_option)(const char* text, lisf_int* e, lisf_int* ierr,
                            long text_len) {
    char buf[1024];
    long n = text_len < 1023 ? text_len : 1023;
    memcpy(buf, text, (size_t)n);
    while (n > 0 && buf[n - 1] == ' ') --n;
    buf[n] = '\0';
    *ierr = call_ll("esolver_set_option", "(sl)", buf, (long)*e);
}

F77(lis_esolve)(lisf_int* A, lisf_int* x, lisf_int* e, double* evalue,
                lisf_int* ierr) {
    *evalue = call_dd("esolve", "(lll)", (long)*A, (long)*x, (long)*e);
    *ierr = 0;
}

F77(lis_esolver_get_iter)(lisf_int* e, lisf_int* iter, lisf_int* ierr) {
    *iter = call_ll("esolver_get_iter", "(l)", (long)*e);
    *ierr = 0;
}
