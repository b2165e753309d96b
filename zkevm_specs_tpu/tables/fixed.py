"""Fixed-table lookups as computed predicates.

The reference materializes ~221k fixed rows (ranges, 3x65536 bitwise tables,
sign bytes, pow2, responsible-opcode pairs; reference:
src/zkevm_specs/evm_circuit/table.py:14-103,583) and scans them per lookup.
On TPU the same membership relations are *computed* as vectorized ALU
predicates — semantically identical (a query is satisfied iff the row is in
the generated table; every fixed row is unique so ambiguity cannot occur),
with zero memory traffic.  Small irregular sets (ResponsibleOpcode,
OpcodeConstantGas, PrecompileInfo) use sorted-constant membership checks.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ..dsl.value import Ctx, F
from ..dsl.cs import ConstraintSystem
from .schemas import FixedTableTag


def _u32_value(v: F, n_limbs: int = 2):
    """Low-32-bit integer view of an F (valid only where le_bits holds)."""
    xp = v.ctx.xp
    out = v.limbs[..., 0]
    if v.width > 1:
        out = out | (v.limbs[..., 1] << 16)
    return out


def _isin_sorted(xp, values, sorted_codes):
    """Membership of u32 values in a sorted host constant array."""
    table = xp.asarray(sorted_codes)
    pos = xp.searchsorted(table, values)
    pos = xp.minimum(pos, len(sorted_codes) - 1)
    return table[pos] == values


class FixedTables:
    """Stateless fixed-table predicate engine (shared across circuits)."""

    def __init__(self):
        self._sets: Dict[FixedTableTag, np.ndarray] = {}

    def register_set(self, tag: FixedTableTag, codes) -> None:
        """Install the sorted code set for an irregular fixed sub-table."""
        self._sets[tag] = np.sort(np.asarray(codes, dtype=np.uint32))

    def lookup(
        self,
        cs: ConstraintSystem,
        tag: FixedTableTag,
        value0: F,
        value1: F,
        value2: F,
        enabled=None,
    ) -> None:
        xp = value0.ctx.xp
        ok = self._predicate(xp, tag, value0, value1, value2)
        if enabled is not None:
            ok = ok | ~enabled
        cs.check(
            ok,
            lambda: f"Lookup FixedTableRow is unsatisfied on inputs "
            f"{{'tag': {tag!r}, 'value0': {value0!r}, 'value1': {value1!r}, 'value2': {value2!r}}}",
        )

    def _predicate(self, xp, tag: FixedTableTag, v0: F, v1: F, v2: F):
        rng = {
            FixedTableTag.Range5: 5,
            FixedTableTag.Range16: 16,
            FixedTableTag.Range32: 32,
            FixedTableTag.Range64: 64,
            FixedTableTag.Range256: 256,
            FixedTableTag.Range512: 512,
            FixedTableTag.Range1024: 1024,
            FixedTableTag.Range24_576: 24576,
        }.get(tag)
        if rng is not None:
            return v0.lt_mask(rng) & v1.is_zero_mask() & v2.is_zero_mask()

        if tag == FixedTableTag.SignByte:
            ok = v0.le_bits_mask(8) & v2.is_zero_mask()
            sign = (v0.limbs[..., 0] >> 7) * 0xFF
            return ok & v1.le_bits_mask(8) & (v1.limbs[..., 0] == sign)

        if tag in (FixedTableTag.BitwiseAnd, FixedTableTag.BitwiseOr, FixedTableTag.BitwiseXor):
            ok = v0.le_bits_mask(8) & v1.le_bits_mask(8) & v2.le_bits_mask(8)
            a, b, c = v0.limbs[..., 0], v1.limbs[..., 0], v2.limbs[..., 0]
            if tag == FixedTableTag.BitwiseAnd:
                return ok & ((a & b) == c)
            if tag == FixedTableTag.BitwiseOr:
                return ok & ((a | b) == c)
            return ok & ((a ^ b) == c)

        if tag == FixedTableTag.Pow2:
            # (value, 2^value if value<128 else 0, 0 if value<128 else 2^(value-128))
            ok = v0.le_bits_mask(8)
            n = _u32_value(v0) & 0xFF
            is_lo = n < 128
            exp_lo = xp.where(is_lo, n, 0)
            exp_hi = xp.where(is_lo, 0, n - 128)
            ok = ok & _eq_pow2(xp, v1, xp.where(is_lo, exp_lo, 0), is_lo)
            ok = ok & _eq_pow2(xp, v2, exp_hi, ~is_lo)
            return ok

        if tag == FixedTableTag.ResponsibleOpcode:
            # code = state*2048*2048 + opcode*2048 + aux (aux <= 1024)
            ok = v0.le_bits_mask(8) & v1.le_bits_mask(8) & v2.le_bits_mask(11)
            code = (
                _u32_value(v0) * (2048 * 256)
                + _u32_value(v1) * 2048
                + _u32_value(v2)
            )
            return ok & _isin_sorted(xp, code, self._sets[tag])

        if tag == FixedTableTag.OpcodeConstantGas:
            ok = v0.le_bits_mask(8) & v1.le_bits_mask(16) & v2.is_zero_mask()
            code = _u32_value(v0) * 65536 + _u32_value(v1)
            return ok & _isin_sorted(xp, code, self._sets[tag])

        if tag == FixedTableTag.PrecompileInfo:
            ok = v0.le_bits_mask(8) & v1.le_bits_mask(8) & v2.le_bits_mask(16)
            code = (
                _u32_value(v0) * (65536 * 256)
                + _u32_value(v1) * 65536
                + _u32_value(v2)
            )
            return ok & _isin_sorted(xp, code, self._sets[tag])

        raise ValueError(f"unknown fixed table tag {tag}")


def _eq_pow2(xp, v: F, exponent, active):
    """Check v == 2^exponent where active, v == 0 elsewhere.

    exponent: u32 array < 128; v is a (possibly wide) canonical F."""
    w = v.width
    ok = xp.ones(exponent.shape, dtype=bool)
    limb_idx = exponent >> 4
    bit = exponent & 15
    for i in range(max(w, 8)):
        want_active = xp.where(limb_idx == i, (1 << bit).astype(v.limbs.dtype), 0)
        want = xp.where(active, want_active, 0)
        have = v.limbs[..., i] if i < w else xp.zeros_like(want)
        ok = ok & (have == want)
    return ok
