"""Eigensolver registry + shared helpers."""

from __future__ import annotations

from typing import Any, Callable

ESOLVER_FNS: dict[str, Callable] = {}


def register_esolver(name: str):
    def deco(fn):
        ESOLVER_FNS[name] = fn
        return fn
    return deco
