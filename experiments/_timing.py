"""Shared chip-timing helper for the experiments/ scripts.

Same methodology as bench.py:28 — the iteration loop runs inside one
compiled program, a result-dependent scalar forces synchronisation, and
two loop lengths are differenced to cancel fixed dispatch cost (the
remote-chip relay adds tens of ms of jittery per-call overhead).

Pass the operator through ``data`` rather than closing over it: closures
embed the arrays as HLO constants and oversize the remote compile
payload (HTTP 413 past ~100 MB)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def timed_apply(fn, arg, iters_a=5, iters_b=55, repeats=5, outer=3,
                data=None):
    """Per-application seconds of ``fn`` on device.

    Without ``data``: fn(v) -> v.  With ``data``: fn(data, v) -> v and
    ``data`` (any pytree, e.g. a matrix) is passed as a jit ARGUMENT."""
    if data is None:
        f2 = lambda d, v: fn(v)
    else:
        f2 = fn

    def make(iters):
        @jax.jit
        def run(d, v):
            def body(i, vv):
                return f2(d, vv) * jnp.asarray(1.0 / 32.0, vv.dtype)
            return jnp.sum(jax.lax.fori_loop(0, iters, body, v))
        return run
    fa, fb = make(iters_a), make(iters_b)
    float(fa(data, arg)); float(fb(data, arg))
    def best(f):
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(f(data, arg))
            ts.append(time.perf_counter() - t0)
        return min(ts)
    est = []
    for _ in range(outer):
        ta, tb = best(fa), best(fb)
        est.append(max((tb - ta) / (iters_b - iters_a), 1e-12))
    return min(est)
