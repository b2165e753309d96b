"""Exp circuit — verifies exponentiation-by-squaring traces
(reference: src/zkevm_specs/exp_circuit.py:14-97), vectorized with cyclic
next-row shifts."""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..dsl.cs import ConstraintSystem
from ..utils.typing import is_circuit_code
from ..dsl.value import Ctx, F, Word
from ..witness.typing import ExpCircuit

_BITS = {"q_usable": 1, "is_step": 1, "identifier": 32, "is_last": 1, "r": 8}
_WORDS = ("base", "exponent", "exponentiation", "a", "b", "c", "d", "q")


def _mul_add_words(cs: ConstraintSystem, ctx: Ctx, a: Word, b: Word, c: Word,
                   d: Word, mask, msg: str):
    """Constrain a*b + c == d mod 2^256 under mask (reference
    util/arithmetic.py:245-276 used by the exp circuit)."""
    a64s = a.to_64s()
    b64s = b.to_64s()
    pow64 = F.const(ctx, 1 << 64)
    pow128 = F.const(ctx, 1 << 128)
    t0 = a64s[0] * b64s[0]
    t1 = a64s[0] * b64s[1] + a64s[1] * b64s[0]
    t2 = a64s[0] * b64s[2] + a64s[1] * b64s[1] + a64s[2] * b64s[0]
    t3 = a64s[0] * b64s[3] + a64s[1] * b64s[2] + a64s[2] * b64s[1] + a64s[3] * b64s[0]
    carry_lo = (t0 + t1 * pow64 + c.lo - d.lo).fdiv_const(1 << 128)
    carry_hi = (t2 + t3 * pow64 + c.hi + carry_lo - d.hi).fdiv_const(1 << 128)
    cs.check(carry_lo.le_bits_mask(72) | ~mask, lambda: f"{msg}: carry_lo out of range")
    cs.check(carry_hi.le_bits_mask(72) | ~mask, lambda: f"{msg}: carry_hi out of range")
    cs.check(
        (t0 + t1 * pow64 + c.lo).eq_mask(d.lo + carry_lo * pow128) | ~mask,
        lambda: f"{msg}: low constraint failed",
    )
    cs.check(
        (t2 + t3 * pow64 + c.hi + carry_lo).eq_mask(d.hi + carry_hi * pow128) | ~mask,
        lambda: f"{msg}: high constraint failed",
    )


def build_exp_cols(ctx: Ctx, rows: List[dict]):
    cols = {name: F.from_ints(ctx, [r[name] for r in rows], bits)
            for name, bits in _BITS.items()}
    for name in _WORDS:
        cols[name] = Word.from_ints(ctx, [r[name] for r in rows])
    return cols


@is_circuit_code
def check_exp(ctx: Ctx, cs: ConstraintSystem, cols, tables, static, extra):
    """The exp-circuit constraint body (reference exp_circuit.py:14-86) —
    runs eagerly (spec mode) and under jit (production) unchanged."""
    xp = ctx.xp
    c = {name: cols[name] for name in _BITS}
    words = {name: cols[name] for name in _WORDS}
    n = ctx.batch
    i1 = (xp.arange(n) + 1) % n
    n1 = {name: v.gather(i1) for name, v in c.items()}
    w1 = {name: v.gather(i1) for name, v in words.items()}

    def check(mask, ok, msg):
        cs.check(ok | ~mask, lambda: msg)

    is_step = ~c["is_step"].is_zero_mask()
    is_last = ~c["is_last"].is_zero_mask()

    # every step except the last (reference :16-24)
    m = is_step & ~is_last
    check(m, words["base"].eq_mask(w1["base"]), "base changes within trace")
    check(m, words["a"].eq_mask(w1["d"]), "a != next d")
    check(m, c["identifier"].eq_mask(n1["identifier"]), "identifier changes within trace")

    # every step (reference :26-50)
    check(is_step, c["is_last"].le_bits_mask(1), "is_last not boolean")
    check(is_step, c["r"].le_bits_mask(1), "parity not boolean")
    _mul_add_words(cs, ctx, words["a"], words["b"], words["c"], words["d"],
                   is_step, "exp multiplication")
    check(is_step, words["exponentiation"].eq_mask(words["d"]), "exponentiation != d")
    check(is_step, words["c"].is_zero_mask(), "c != 0")
    two = Word.const(ctx, 2)
    _mul_add_words(cs, ctx, two, words["q"], Word.from_lo(c["r"]), words["exponent"],
                   is_step, "parity check")

    # odd exponent steps (reference :52-61)
    m = is_step & ~is_last & ~c["r"].is_zero_mask()
    check(m, w1["exponent"].lo.eq_mask(words["exponent"].lo - 1), "odd: lo not decremented")
    check(m, w1["exponent"].hi.eq_mask(words["exponent"].hi), "odd: hi changed")
    check(m, words["base"].eq_mask(words["b"]), "odd: b != base")

    # even exponent steps (reference :63-73)
    m = is_step & ~is_last & c["r"].is_zero_mask()
    check(m, w1["exponent"].lo.eq_mask(words["q"].lo), "even: lo != quotient lo")
    check(m, w1["exponent"].hi.eq_mask(words["q"].hi), "even: hi != quotient hi")
    check(m, words["a"].eq_mask(words["b"]), "even: a != b")

    # last step (reference :75-83)
    check(is_last, words["exponent"].lo.eq_mask(2), "last: exponent lo != 2")
    check(is_last, words["exponent"].hi.is_zero_mask(), "last: exponent hi != 0")
    check(is_last, words["base"].eq_mask(words["a"]), "last: a != base")
    check(is_last, words["base"].eq_mask(words["b"]), "last: b != base")


def verify_exp_circuit(exp_circuit: ExpCircuit, success: bool = True, xp=np):
    """Spec-mode (eager) driver with reference verdict semantics."""
    from ..runtime.kernels import run_spec

    rows = exp_circuit.table()
    if not rows:
        return
    ctx = Ctx(xp, len(rows), "eager")
    run_spec("exp", check_exp, build_exp_cols(ctx, rows), success=success)


def exp_kernel(exp_circuit: ExpCircuit):
    """Production path: the same constraint body compiled to one XLA kernel."""
    from ..runtime.kernels import CircuitKernel

    rows = exp_circuit.table()
    if not rows:
        return None
    ctx = Ctx(np, len(rows), "eager")
    return CircuitKernel("exp", check_exp, build_exp_cols(ctx, rows))
