"""Typed aliases + the ``is_circuit_code`` marker
(reference: src/zkevm_specs/util/typing.py:1-18).

``is_circuit_code`` marks a function as *constraint code*: it must be pure
over its inputs (no host side effects, no data-dependent Python control
flow beyond the lane-masked ``branch`` protocol) so the same body runs
eagerly on numpy (spec mode) AND traces into one XLA program (production
mode).  The marker is enforced structurally by the dual execution paths —
every marked body is exercised by both — and mechanically by
tests/test_circuit_markers.py, which asserts every registered gadget and
circuit check body carries it.
"""
from __future__ import annotations

from typing import Callable, NewType, TypeVar

U8 = NewType("U8", int)
U64 = NewType("U64", int)
U128 = NewType("U128", int)
U160 = NewType("U160", int)
U256 = NewType("U256", int)

F = TypeVar("F", bound=Callable)


def is_circuit_code(func: F) -> F:
    """Mark ``func`` as circuit (constraint) code."""
    func.__is_circuit_code__ = True  # type: ignore[attr-defined]
    return func


def marked(func) -> bool:
    return bool(getattr(func, "__is_circuit_code__", False))
