"""Block-level LOG conformance matrix (mirrors the scenario dimensions of
reference tests/evm/test_logs.py:31-77: topic-count 0..4, memory data,
persistent vs reverted frames, and MULTI-log sequences within and across
transactions).

Everything is traced end-to-end by witness/tracer.py and verified through
every sub-circuit, so the TxLog row layout (address / topics / data rows,
reference table.py TxLogFieldTag), per-tx log_id sequencing, the receipt
LogLength binding, and the reverted-frame log gating must all agree."""
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))

from zkevm_specs_tpu.circuits.super_circuit import verify_super_circuit
from zkevm_specs_tpu.tables.schemas import (
    Target,
    TxLogFieldTag,
    TxReceiptFieldTag,
)
from zkevm_specs_tpu.witness.tracer import trace_block
from zkevm_specs_tpu.witness.typing import Block, Bytecode, Transaction

BASE_FEE = int(1e9)


def _tx(i, **kw):
    return Transaction(id=i, gas=1000000, gas_price=int(2e9),
                       caller_address=0xFE, callee_address=0xFF + i, **kw)


def _emit_log(bc, topics, data_start, data_len):
    for t in reversed(topics):
        bc.push32(t)
    bc.push2(data_len).push2(data_start)
    getattr(bc, f"log{len(topics)}")()
    return bc


def _log_rows(w, field_tag):
    """TxLog rows pack (log_id, field_tag, index) into the address column:
    address = index + field_tag * 2^32 + log_id * 2^48 (reference
    table.py TxLog key layout, mirrored by the tracer's log emission)."""
    out = []
    for r in w.rw.rws:
        if r["key0"] != int(Target.TxLog):
            continue
        packed = r["address"]
        if (packed >> 32) & 0xFFFF == int(field_tag):
            out.append({**r, "index": packed & 0xFFFFFFFF,
                        "log_id": packed >> 48})
    return out


def _receipt(w, field_tag):
    return [r["value"] for r in w.rw.rws
            if r["key0"] == int(Target.TxReceipt)
            and r["field_tag"] == int(field_tag)]


@pytest.mark.parametrize("topics,mstart,msize", [
    ([], 10, 2),
    ([0x030201], 20, 3),
    ([0x030201, 0x0F0E0D], 100, 20),
    ([0x030201, 0x0F0E0D, 0x0D8F01], 180, 50),
    ([0x030201, 0x0F0E0D, 0x0D8F01, 0x0A0B0C], 0, 32),
])
def test_single_log(topics, mstart, msize):
    """One LOGn per block: topic rows match the pushed topics in order and
    the data rows carry the memory window bytes."""
    bc = Bytecode().push32(0xCAFEBABE_DEADBEEF).push1(0).mstore()
    bc = _emit_log(bc, topics, mstart, msize).stop()
    w = trace_block(Block(base_fee=BASE_FEE), [(_tx(1), bc)])
    verify_super_circuit(w)
    topic_rows = _log_rows(w, TxLogFieldTag.Topic)
    assert [r["value"] for r in topic_rows] == topics
    data_rows = _log_rows(w, TxLogFieldTag.Data)
    assert len(data_rows) == msize
    assert _receipt(w, TxReceiptFieldTag.LogLength) == [1]


def test_multi_logs_one_tx():
    """Three LOGs in one tx: log_id increments 1,2,3 (stored in the rw
    row's storage_key slot per the TxLog key layout)."""
    bc = Bytecode().push32(0x1122334455).push1(0).mstore()
    bc = _emit_log(bc, [], 10, 2)
    bc = _emit_log(bc, [0x030201], 20, 3)
    bc = _emit_log(bc, [0x030201, 0x0F0E0D], 0, 8)
    bc = bc.stop()
    w = trace_block(Block(base_fee=BASE_FEE), [(_tx(1), bc)])
    verify_super_circuit(w)
    addr_rows = _log_rows(w, TxLogFieldTag.Address)
    assert len(addr_rows) == 3
    assert [r["log_id"] for r in addr_rows] == [1, 2, 3]
    assert _receipt(w, TxReceiptFieldTag.LogLength) == [3]


def test_multi_logs_across_txs():
    """Logs in multiple txs: the log_id restarts per tx and each receipt's
    LogLength counts only its own tx's logs (reference
    MULTI_LOGS_TESTING_DATA multi-tx rows)."""
    bc1 = Bytecode().push32(0xAA).push1(0).mstore()
    bc1 = _emit_log(bc1, [0x030201, 0x0F0E0D, 0x0D8F01], 0, 16)
    bc1 = _emit_log(bc1, [0x030201], 20, 3).stop()
    bc2 = Bytecode().push32(0xBB).push1(0).mstore()
    bc2 = _emit_log(bc2, [], 10, 2).stop()
    w = trace_block(Block(base_fee=BASE_FEE),
                    [(_tx(1), bc1), (_tx(2), bc2)])
    verify_super_circuit(w)
    assert _receipt(w, TxReceiptFieldTag.LogLength) == [2, 1]
    addr_rows = _log_rows(w, TxLogFieldTag.Address)
    assert [r["id"] for r in addr_rows] == [1, 1, 2]
    assert [r["log_id"] for r in addr_rows] == [1, 2, 1]  # restarts per tx


def test_log_zero_data_length():
    """LOG with msize == 0 emits no data rows but still logs."""
    bc = _emit_log(Bytecode(), [0x42], 0, 0).stop()
    w = trace_block(Block(base_fee=BASE_FEE), [(_tx(1), bc)])
    verify_super_circuit(w)
    assert len(_log_rows(w, TxLogFieldTag.Data)) == 0
    assert _receipt(w, TxReceiptFieldTag.LogLength) == [1]


def test_reverted_log_not_counted():
    """A LOG inside a frame that reverts leaves no committed TxLog rows and
    LogLength 0 (reference test_logs is_persistent=False rows)."""
    bc = Bytecode().push32(0xAA).push1(0).mstore()
    bc = _emit_log(bc, [0x030201], 0, 4)
    bc = bc.push1(0).push1(0).revert()
    w = trace_block(Block(base_fee=BASE_FEE), [(_tx(1), bc)])
    verify_super_circuit(w)
    assert _receipt(w, TxReceiptFieldTag.LogLength) == [0]


def test_corrupt_topic_rejected():
    """Flipping a committed topic row's value breaks the LOG gadget's
    stack<->TxLog binding."""
    bc = _emit_log(Bytecode(), [0x030201, 0x0F0E0D], 0, 0).stop()
    w = trace_block(Block(base_fee=BASE_FEE), [(_tx(1), bc)])
    # mutate the witness row itself (not the decoded copy)
    rows = [r for r in w.rw.rws
            if r["key0"] == int(Target.TxLog)
            and (r["address"] >> 32) & 0xFFFF == int(TxLogFieldTag.Topic)]
    assert rows
    rows[0]["value"] ^= 1
    with pytest.raises(AssertionError):
        verify_super_circuit(w)


def test_corrupt_log_length_rejected():
    """Overstating the receipt LogLength breaks the end_tx binding to the
    step's log_id."""
    bc = _emit_log(Bytecode(), [0x42], 0, 0).stop()
    w = trace_block(Block(base_fee=BASE_FEE), [(_tx(1), bc)])
    for r in w.rw.rws:
        if (r["key0"] == int(Target.TxReceipt)
                and r["field_tag"] == int(TxReceiptFieldTag.LogLength)):
            r["value"] += 1
    with pytest.raises(AssertionError):
        verify_super_circuit(w)
