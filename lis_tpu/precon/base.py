"""Preconditioner interface.

Reference: src/precon/lis_precon.c — creation registry at :58-93, applied by
solvers through lis_psolve(solver, r, z) / lis_psolveh.  Here a
preconditioner is a pytree object with ``psolve``/``psolveh`` methods
(device closures over its factor arrays); creation is host-side
factorisation.  User preconditioners register like the reference's
lis_precon_register (lis_precon.c:411).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax

from lis_tpu.utils.trace import traced

PRECON_REGISTRY: dict[str, Callable] = {}

# user-registered preconditioners get stable numeric ids above the
# built-in table (LIS_PRECON_TYPE_USERDEF = LIS_PRECON_TYPE_LEN,
# include/lis.h:250) so get_precon/get_preconname round-trip
_USER_PRECON_IDS: dict[str, int] = {}


def user_precon_id(name: str, base: int) -> int:
    if name not in _USER_PRECON_IDS:
        _USER_PRECON_IDS[name] = base + len(_USER_PRECON_IDS)
    return _USER_PRECON_IDS[name]


def user_precon_name(pid: int):
    for n, i in _USER_PRECON_IDS.items():
        if i == pid:
            return n
    return None


def register_precon(name: str):
    """Register a creation function ``create(A, opts) -> precon pytree``."""
    def deco(fn):
        PRECON_REGISTRY[name] = fn
        return fn
    return deco


def precon_pytree(cls):
    """Register a (frozen) dataclass preconditioner as a pytree; all fields
    are array leaves unless listed in cls._static."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    static = tuple(getattr(cls, "_static", ()))
    arr = tuple(f for f in fields if f not in static)

    def flatten(m):
        return (tuple(getattr(m, a) for a in arr),
                tuple(getattr(m, s) for s in static))

    def unflatten(aux, children):
        kw = dict(zip(arr, children))
        kw.update(zip(static, aux))
        return cls(**kw)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@traced
def create_precon(name: str, A, opts) -> "object":
    return PRECON_REGISTRY[name](A, opts)


@precon_pytree
class NonePrecon:
    """psolve = copy (reference: precon type 0)."""

    def psolve(self, r):
        return r

    def psolveh(self, r):
        return r
