"""Block-level block-context opcode sweep: every BLOCK_CTX opcode reads
its value from the traced block table, and BLOCKHASH resolves through the
256-entry history window (reference tests/evm/test_block_ctx.py +
test_blockhash.py scenarios, traced end-to-end)."""
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))

from zkevm_specs_tpu.circuits.super_circuit import verify_super_circuit
from zkevm_specs_tpu.tables.schemas import Target
from zkevm_specs_tpu.witness.tracer import trace_block
from zkevm_specs_tpu.witness.typing import Block, Bytecode, Transaction

HASHES = [0x1000 + i for i in range(8)]  # most-recent-last
BLOCK = dict(coinbase=0xC0FFEE, gas_limit=int(12e6), number=100,
             timestamp=0x5EED, prev_randao=0xDA0, base_fee=int(1e9),
             chainid=0x539, history_hashes=HASHES)


def _trace(bc, **overrides):
    cfg = {**BLOCK, **overrides}
    tx = Transaction(id=1, gas=1000000, gas_price=int(2e9),
                     caller_address=0xFE, callee_address=0xFF)
    return trace_block(Block(**cfg), [(tx, bc)])


def _stored(w, slot=0x07):
    rows = [r for r in w.rw.rws
            if r["key0"] == int(Target.AccountStorage) and r["rw"] == 1
            and r["storage_key"] == slot]
    rows.sort(key=lambda r: r["rw_counter"])
    return rows[-1]["value"]


@pytest.mark.parametrize("op,want", [
    ("coinbase", BLOCK["coinbase"]),
    ("timestamp", BLOCK["timestamp"]),
    ("number", BLOCK["number"]),
    ("gaslimit", BLOCK["gas_limit"]),
    ("chainid", BLOCK["chainid"]),
    ("basefee", BLOCK["base_fee"]),
    ("prevrandao", BLOCK["prev_randao"]),  # post-merge DIFFICULTY
])
def test_block_ctx_opcodes(op, want):
    bc = Bytecode()
    getattr(bc, op)()
    bc.push1(0x07).sstore().stop()
    w = _trace(bc)
    assert _stored(w) == want
    verify_super_circuit(w)


@pytest.mark.parametrize("lookback,expect_hash", [
    (1, HASHES[-1]),    # parent block
    (8, HASHES[0]),     # oldest available
])
def test_blockhash_window(lookback, expect_hash):
    number = BLOCK["number"] - lookback
    bc = (Bytecode().push32(number).blockhash()
          .push1(0x07).sstore().stop())
    w = _trace(bc)
    assert _stored(w) == expect_hash
    verify_super_circuit(w)


def test_blockhash_out_of_window_is_zero():
    """A block older than the 256-block window pushes 0 (block number 300,
    asking for block 10: window starts at 44)."""
    bc = (Bytecode().push32(10).blockhash()
          .push1(0x07).sstore().stop())
    w = _trace(bc, number=300, history_hashes=[])
    assert _stored(w) == 0
    verify_super_circuit(w)


def test_blockhash_in_window_unrecorded_guarded():
    """An in-window lookback with no recorded hash cannot form a provable
    block-table lookup: the tracer raises the documented guard."""
    bc = (Bytecode().push32(BLOCK["number"] - 9).blockhash()
          .push1(0x07).sstore().stop())
    with pytest.raises(AssertionError, match="history"):
        _trace(bc)


def test_blockhash_future_block_is_zero():
    bc = (Bytecode().push32(BLOCK["number"] + 5).blockhash()
          .push1(0x07).sstore().stop())
    w = _trace(bc)
    assert _stored(w) == 0
    verify_super_circuit(w)


def test_block_ctx_corrupt_value_rejected():
    """A corrupted TIMESTAMP push breaks the block-table lookup."""
    bc = Bytecode().timestamp().push1(0x07).sstore().stop()
    w = _trace(bc)
    for r in w.rw.rws:
        if (r["key0"] == int(Target.Stack) and r["rw"] == 1
                and r["value"] == BLOCK["timestamp"]):
            r["value"] += 1
    with pytest.raises(AssertionError):
        verify_super_circuit(w)
