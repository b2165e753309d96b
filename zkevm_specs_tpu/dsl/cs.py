"""Mask-aware constraint accumulation and lane-uniform branching.

The reference evaluates constraints with Python ``assert`` per scalar step
(reference: src/zkevm_specs/util/constraint_system.py:12-74 and
evm_circuit/instruction.py:145-188).  Here a constraint is a boolean tensor
over a *batch* of lanes; failures are accumulated per lane under the current
condition mask and surfaced after the whole batch is evaluated:

* eager mode keeps lazy message records so the earliest-failing lane can
  raise an error equivalent to the reference's, and supports *lane
  splitting*: when gadget code branches on a non-uniform condition, a
  ``LaneSplit`` is raised and the runner re-evaluates each lane subset.
* jit mode only ORs failure bits (one verdict tensor comes out of XLA).
"""
from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import numpy as np

from .value import Ctx, F, Word


class ConstraintUnsatFailure(AssertionError):
    def __init__(self, message: str) -> None:
        super().__init__(message)
        self.message = message


class LookupUnsatFailure(AssertionError):
    def __init__(self, table_name: str, inputs=None) -> None:
        message = f"Lookup {table_name} is unsatisfied on inputs {inputs}"
        super().__init__(message)
        self.message = message
        self.inputs = inputs


class LookupAmbiguousFailure(AssertionError):
    def __init__(self, table_name: str, inputs=None) -> None:
        message = f"Lookup {table_name} is ambiguous on inputs {inputs}"
        super().__init__(message)
        self.message = message
        self.inputs = inputs


class LaneSplit(Exception):
    """Raised by branch() when lanes disagree; the runner partitions them."""

    def __init__(self, mask) -> None:
        super().__init__("non-uniform branch")
        self.mask = np.asarray(mask)


class ConstraintSystem:
    """Accumulates per-lane failure bits under a stack of condition masks."""

    def __init__(self, ctx: Ctx):
        self.ctx = ctx
        xp = ctx.xp
        self.fail = xp.zeros((ctx.batch,), dtype=bool)
        self.records: List[Tuple[object, Callable[[], str]]] = []
        self._mask = None  # current condition mask (None = all lanes)
        # branch-decision machinery (consumed/extended by branch())
        self.decisions: List[bool] = []
        self._decision_idx = 0
        # witness-hint stream: eager trace records hint arrays; the jit pass
        # replays them as kernel inputs (two-phase hint protocol)
        self.hint_record: Optional[List] = None
        self.hint_bits: Optional[List] = None
        self.hint_replay: Optional[List] = None
        self._hint_idx = 0

    # -- condition masks ---------------------------------------------------

    def push_mask(self, mask):
        prev = self._mask
        self._mask = mask if prev is None else (prev & mask)
        return prev

    def pop_mask(self, prev):
        self._mask = prev

    def current_mask(self):
        return self._mask

    # -- constraint recording ---------------------------------------------

    def check(self, ok_mask, msg: Callable[[], str]):
        """Record a constraint: ok_mask must hold wherever the current
        condition mask is active."""
        xp = self.ctx.xp
        bad = ~ok_mask
        if self._mask is not None:
            bad = bad & self._mask
        bad = xp.broadcast_to(bad, (self.ctx.batch,))
        self.fail = self.fail | bad
        if self.ctx.eager:
            self.records.append((bad, msg))

    # -- reference-compatible constraint API ------------------------------

    def constrain_zero(self, value: F, name: str = "value"):
        self.check(value.is_zero_mask(), lambda: f"Expected {name} to be 0, but got {value!r}")

    def constrain_not_zero(self, value: F, name: str = "value"):
        self.check(~value.is_zero_mask(), lambda: f"Expected {name} to be != 0")

    def constrain_zero_word(self, value: Word, name: str = "word"):
        self.check(value.is_zero_mask(), lambda: f"Expected {name} to be 0, but got {value!r}")

    def constrain_not_zero_word(self, value: Word, name: str = "word"):
        self.check(~value.is_zero_mask(), lambda: f"Expected {name} to be != 0")

    def constrain_equal(self, lhs: F, rhs: F, name: str = "values"):
        self.check(
            lhs.eq_mask(rhs),
            lambda: f"Expected {name} to be equal, but got {lhs!r} and {rhs!r}",
        )

    def constrain_equal_word(self, lhs: Word, rhs: Word, name: str = "words"):
        self.check(
            lhs.eq_mask(rhs),
            lambda: f"Expected {name} to be equal, but got {lhs!r} and {rhs!r}",
        )

    def constrain_bool(self, value: F, name: str = "value"):
        self.check(value.is_bool_mask(), lambda: f"Expected {name} to be a bool, but got {value!r}")

    def constrain_in_consts(self, value: F, options, name: str = "value"):
        mask = value.eq_mask(F.const(self.ctx, int(options[0])))
        for o in options[1:]:
            mask = mask | value.eq_mask(F.const(self.ctx, int(o)))
        self.check(mask, lambda: f"Expected {name} to be in {options}, but got {value!r}")

    def range_check(self, value: F, n_bytes: int, name: str = "value"):
        """value must fit in n_bytes (mirrors reference range_check,
        util/constraint_system.py:64-69)."""
        self.check(
            value.le_bits_mask(8 * n_bytes),
            lambda: f"Value {value!r} has too many bytes to fit {n_bytes} bytes",
        )

    # -- branching ---------------------------------------------------------

    def branch(self, cond_mask) -> bool:
        """Resolve a data-dependent Python branch to a lane-uniform bool.

        Gadget code may take different lookup schedules per branch, so all
        lanes of a group must agree.  In eager mode a disagreement raises
        LaneSplit and the runner re-runs each subset; decisions are recorded
        to form the group's control signature.  In jit mode decisions are
        replayed from the precomputed signature and the condition is
        *constrained* to match, preserving soundness.
        """
        if self._decision_idx < len(self.decisions):
            decided = self.decisions[self._decision_idx]
            self._decision_idx += 1
            self.check(
                cond_mask == decided,
                lambda: f"Branch condition diverged from signature {decided}",
            )
            return decided
        assert self.ctx.eager, "jit mode requires a full branch signature"
        arr = np.asarray(cond_mask)
        arr = np.broadcast_to(arr, (self.ctx.batch,))
        if arr.all():
            decided = True
        elif not arr.any():
            decided = False
        else:
            raise LaneSplit(arr)
        self.decisions.append(decided)
        self._decision_idx += 1
        return decided

    # -- results -----------------------------------------------------------

    def first_failure_message(self) -> Optional[List[Optional[str]]]:
        """Eager mode: per-lane message of the first failing constraint."""
        msgs: List[Optional[str]] = [None] * self.ctx.batch
        for bad, msg in self.records:
            arr = np.asarray(bad)
            for i in range(self.ctx.batch):
                if arr[i] and msgs[i] is None:
                    msgs[i] = msg()
        return msgs
