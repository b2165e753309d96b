"""Block-level EXP conformance sweep through the exp circuit.

The exp circuit verifies exponentiation-by-squaring traces per event
(reference exp_circuit.py:14-97: per-step mul_add_words + parity split
2*q + r == exponent, odd/even transitions, last-step exponent == 2).
The reference's vectors (tests/evm/test_exp.py) are gadget-level; here
each (base, exponent) class is traced end-to-end so the EXP gadget's
exp-table lookup, the traced dynamic gas (50/exponent byte), and the
exp circuit's squaring trace must all agree.  Results are pinned to
storage and checked against pow(base, exp, 2^256)."""
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))

from zkevm_specs_tpu.circuits.super_circuit import verify_super_circuit
from zkevm_specs_tpu.tables.schemas import Target
from zkevm_specs_tpu.witness.tracer import trace_block
from zkevm_specs_tpu.witness.typing import Block, Bytecode, Transaction

U256M = (1 << 256) - 1


def _trace(bc):
    tx = Transaction(id=1, gas=1000000, gas_price=int(2e9),
                     caller_address=0xFE, callee_address=0xFF)
    return trace_block(Block(base_fee=int(1e9)), [(tx, bc)])


def _stored(w, slot=0x07):
    rows = [r for r in w.rw.rws
            if r["key0"] == int(Target.AccountStorage) and r["rw"] == 1
            and r["storage_key"] == slot]
    rows.sort(key=lambda r: r["rw_counter"])
    return rows[-1]["value"]


@pytest.mark.parametrize("base,exponent", [
    (2, 3),                # tiny odd exponent
    (3, 2),                # the circuit's last-step exponent
    (2, 16),               # power-of-two exponent (all-even squaring path)
    (7, 21),               # mixed odd/even chain
    (0xFF, 0x100),         # exponent crossing a byte boundary (gas step)
    (U256M, 3),            # wrapping base
    (2, 255),              # long all-ones-ish chain
    (123456789, 2**31 - 1),  # Mersenne exponent: maximal odd steps
])
def test_block_exp_sweep(base, exponent):
    bc = (Bytecode()
          .push32(exponent).push32(base).exp()
          .push1(0x07).sstore().stop())
    w = _trace(bc)
    assert _stored(w) == pow(base, exponent, 1 << 256)
    assert len({r["identifier"] for r in w.exp_circuit.rows}) == 1
    verify_super_circuit(w)


@pytest.mark.parametrize("base,exponent", [
    (5, 0),   # x^0 == 1: the gadget's zero-exponent branch (no exp event)
    (5, 1),   # x^1 == x: one-exponent branch (no exp event)
    (0, 0),   # 0^0 == 1 per EVM
    (0, 7),   # 0^n == 0
])
def test_block_exp_degenerate(base, exponent):
    bc = (Bytecode()
          .push32(exponent).push32(base).exp()
          .push1(0x07).sstore().stop())
    w = _trace(bc)
    assert _stored(w) == pow(base, exponent, 1 << 256)
    verify_super_circuit(w)


def test_block_exp_multiple_events():
    """Three EXPs in one tx: the exp circuit carries three identified
    events and each gadget lookup binds to its own."""
    bc = Bytecode()
    for slot, (b, e) in enumerate([(2, 5), (3, 7), (10, 10)]):
        bc.push32(e).push32(b).exp().push1(0x10 + slot).sstore()
    bc.stop()
    w = _trace(bc)
    assert len({r["identifier"] for r in w.exp_circuit.rows}) == 3
    for slot, (b, e) in enumerate([(2, 5), (3, 7), (10, 10)]):
        assert _stored(w, 0x10 + slot) == pow(b, e, 1 << 256)
    verify_super_circuit(w)


def test_block_exp_corrupt_result_rejected():
    """Corrupting the pushed EXP result breaks the exp-table lookup."""
    bc = (Bytecode()
          .push32(21).push32(7).exp()
          .push1(0x07).sstore().stop())
    w = _trace(bc)
    want = pow(7, 21, 1 << 256)
    for r in w.rw.rws:
        if (r["key0"] == int(Target.Stack) and r["rw"] == 1
                and r["value"] == want):
            r["value"] = (want + 1) % (1 << 256)
    with pytest.raises(AssertionError):
        verify_super_circuit(w)


def test_block_exp_gas_per_byte():
    """Dynamic gas is 50 per significant exponent byte: a 2-byte exponent
    costs 100 more than a 1-byte one (reference opcode table + exp gadget
    byte_size term)."""
    costs = {}
    for exponent in (0xFF, 0x100):
        bc = (Bytecode()
              .push32(exponent).push32(2).exp().pop().stop())
        w = _trace(bc)
        verify_super_circuit(w)
        states = [s.execution_state.name for s in w.steps]
        i = states.index("EXP")
        costs[exponent] = w.steps[i].gas_left - w.steps[i + 1].gas_left
    assert costs[0x100] - costs[0xFF] == 50
