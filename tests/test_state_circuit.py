"""State circuit conformance vectors (mirrors reference
tests/test_state_circuit.py scenarios)."""
import pytest

from zkevm_specs_tpu.circuits.state import (
    AccountOp,
    CallContextOp,
    MemoryOp,
    StackOp,
    StartOp,
    StorageOp,
    TxAccessListAccountOp,
    TxAccessListAccountStorageOp,
    TxLogOp,
    TxReceiptOp,
    TxRefundOp,
    assign_state_circuit,
    mpt_table_from_ops,
    verify_state_rows,
)
from zkevm_specs_tpu.tables.schemas import (
    AccountFieldTag,
    CallContextFieldTag,
    RW,
    TxLogFieldTag,
    TxReceiptFieldTag,
)


def verify(ops, success=True):
    rows = ops if isinstance(ops[0], dict) else assign_state_circuit(ops)
    base_ops = ops if not isinstance(ops[0], dict) else None
    mpt = mpt_table_from_ops(base_ops) if base_ops else []
    verify_state_rows(rows, mpt, success=success)


def full_trace_ops():
    return [
        StartOp(rw_counter=1, rw=RW.Read, lexicographic_ordering_selector=0),
        StartOp(rw_counter=2, rw=RW.Read),
        StartOp(rw_counter=3, rw=RW.Read),
        MemoryOp(rw_counter=1, rw=RW.Read, call_id=1, mem_addr=0, value=0),
        MemoryOp(rw_counter=2, rw=RW.Write, call_id=1, mem_addr=0, value=42),
        MemoryOp(rw_counter=3, rw=RW.Read, call_id=1, mem_addr=0, value=42),
        StackOp(rw_counter=4, rw=RW.Write, call_id=1, stack_ptr=1022, value=4321),
        StackOp(rw_counter=5, rw=RW.Write, call_id=1, stack_ptr=1023, value=533),
        StackOp(rw_counter=6, rw=RW.Read, call_id=1, stack_ptr=1023, value=533),
        StorageOp(rw_counter=7, rw=RW.Read, tx_id=1, addr=0x12345678, key=0x1516, value=789, committed_value=789),
        StorageOp(rw_counter=8, rw=RW.Write, tx_id=1, addr=0x12345678, key=0x4959, value=38491, committed_value=98765),
        CallContextOp(rw_counter=9, rw=RW.Read, call_id=1, field_tag=CallContextFieldTag.IsStatic, value=0),
        CallContextOp(rw_counter=10, rw=RW.Read, call_id=2, field_tag=CallContextFieldTag.IsStatic, value=0),
        AccountOp(rw_counter=12, rw=RW.Write, addr=0x12345678, field_tag=AccountFieldTag.Nonce, value=1, committed_value=0),
        AccountOp(rw_counter=13, rw=RW.Read, addr=0x12345678, field_tag=AccountFieldTag.Nonce, value=1, committed_value=0),
        TxRefundOp(rw_counter=14, rw=RW.Write, tx_id=1, value=1),
        TxRefundOp(rw_counter=15, rw=RW.Write, tx_id=1, value=1),
        TxAccessListAccountOp(rw_counter=16, rw=RW.Read, tx_id=1, addr=0x12345678, value=0),
        TxAccessListAccountOp(rw_counter=17, rw=RW.Write, tx_id=1, addr=0x12345678, value=1),
        TxAccessListAccountStorageOp(rw_counter=18, rw=RW.Read, tx_id=1, addr=0x12345678, key=0x1516, value=0),
        TxAccessListAccountStorageOp(rw_counter=19, rw=RW.Write, tx_id=1, addr=0x12345678, key=0x1516, value=1),
        TxLogOp(rw_counter=20, rw=RW.Write, tx_id=1, log_id=1, field_tag=TxLogFieldTag.Address, index=0, value=124),
        TxLogOp(rw_counter=21, rw=RW.Write, tx_id=1, log_id=1, field_tag=TxLogFieldTag.Topic, index=0, value=10),
        TxLogOp(rw_counter=22, rw=RW.Write, tx_id=1, log_id=1, field_tag=TxLogFieldTag.Topic, index=1, value=5),
        TxLogOp(rw_counter=23, rw=RW.Write, tx_id=1, log_id=1, field_tag=TxLogFieldTag.Topic, index=2, value=200),
        TxLogOp(rw_counter=24, rw=RW.Write, tx_id=1, log_id=1, field_tag=TxLogFieldTag.Topic, index=3, value=278),
        TxLogOp(rw_counter=25, rw=RW.Write, tx_id=1, log_id=1, field_tag=TxLogFieldTag.Data, index=0, value=10),
        TxLogOp(rw_counter=26, rw=RW.Write, tx_id=1, log_id=1, field_tag=TxLogFieldTag.Data, index=1, value=255),
        TxLogOp(rw_counter=27, rw=RW.Write, tx_id=1, log_id=2, field_tag=TxLogFieldTag.Address, index=0, value=255),
        TxLogOp(rw_counter=28, rw=RW.Write, tx_id=1, log_id=2, field_tag=TxLogFieldTag.Data, index=0, value=88),
        TxLogOp(rw_counter=29, rw=RW.Write, tx_id=2, log_id=1, field_tag=TxLogFieldTag.Address, index=0, value=210),
        TxLogOp(rw_counter=30, rw=RW.Write, tx_id=2, log_id=1, field_tag=TxLogFieldTag.Topic, index=0, value=255),
        TxLogOp(rw_counter=31, rw=RW.Write, tx_id=2, log_id=1, field_tag=TxLogFieldTag.Data, index=0, value=10),
        TxReceiptOp(rw_counter=32, rw=RW.Read, tx_id=1, field_tag=TxReceiptFieldTag.PostStateOrStatus, value=1),
        TxReceiptOp(rw_counter=33, rw=RW.Read, tx_id=1, field_tag=TxReceiptFieldTag.CumulativeGasUsed, value=200),
        TxReceiptOp(rw_counter=34, rw=RW.Read, tx_id=2, field_tag=TxReceiptFieldTag.PostStateOrStatus, value=1),
        TxReceiptOp(rw_counter=35, rw=RW.Read, tx_id=2, field_tag=TxReceiptFieldTag.CumulativeGasUsed, value=500),
    ]


def test_state_ok():
    verify(full_trace_ops())


def test_mpt_updates_ok():
    ops = [
        StartOp(rw_counter=1, rw=RW.Read, lexicographic_ordering_selector=0),
        StorageOp(rw_counter=7, rw=RW.Read, tx_id=1, addr=0x12345678, key=0x1516, value=789, committed_value=789),
        StorageOp(rw_counter=8, rw=RW.Write, tx_id=1, addr=0x12345678, key=0x4959, value=38491, committed_value=98765),
        AccountOp(rw_counter=12, rw=RW.Write, addr=0x12345678, field_tag=AccountFieldTag.Nonce, value=1, committed_value=0),
        AccountOp(rw_counter=13, rw=RW.Read, addr=0x12345678, field_tag=AccountFieldTag.Balance, value=3, committed_value=0),
    ]
    verify(ops)


def test_state_bad_is_write():
    ops = [
        StartOp(rw_counter=1, rw=RW.Read, lexicographic_ordering_selector=0),
        StorageOp(rw_counter=1, rw=RW.Write, tx_id=1, addr=0x12345678, key=0x15161718, value=789, committed_value=789),
    ]
    rows = assign_state_circuit(ops)
    rows[1]["is_write"] = 2
    mpt = mpt_table_from_ops(ops)
    verify_state_rows(rows, mpt, success=False)


@pytest.mark.parametrize("key_a,key_b", [
    (0x1112, 0x1111),
    (2 << 250, 1 << 250),
    (123, 123),
])
def test_state_keys_non_lexicographic_order(key_a, key_b):
    ops = [
        StartOp(rw_counter=1, rw=RW.Read, lexicographic_ordering_selector=0),
        StorageOp(rw_counter=1, rw=RW.Write, tx_id=1, addr=0x12345678, key=key_a, value=98765, committed_value=98765),
        StorageOp(rw_counter=1, rw=RW.Write, tx_id=1, addr=0x12345678, key=key_b, value=789, committed_value=98765),
    ]
    verify(ops, success=False)


def test_state_bad_read_consistency():
    ops = [
        StartOp(rw_counter=1, rw=RW.Read, lexicographic_ordering_selector=0),
        MemoryOp(rw_counter=1, rw=RW.Write, call_id=1, mem_addr=0, value=42),
        MemoryOp(rw_counter=2, rw=RW.Read, call_id=1, mem_addr=0, value=43),
    ]
    verify(ops, success=False)


def test_state_memory_value_not_byte():
    ops = [
        StartOp(rw_counter=1, rw=RW.Read, lexicographic_ordering_selector=0),
        MemoryOp(rw_counter=1, rw=RW.Write, call_id=1, mem_addr=0, value=256),
    ]
    verify(ops, success=False)


def test_state_stack_first_access_read_rejected():
    ops = [
        StartOp(rw_counter=1, rw=RW.Read, lexicographic_ordering_selector=0),
        StackOp(rw_counter=1, rw=RW.Read, call_id=1, stack_ptr=1023, value=5),
    ]
    verify(ops, success=False)


def test_state_stack_pointer_jump_rejected():
    ops = [
        StartOp(rw_counter=1, rw=RW.Read, lexicographic_ordering_selector=0),
        StackOp(rw_counter=1, rw=RW.Write, call_id=1, stack_ptr=1000, value=5),
        StackOp(rw_counter=2, rw=RW.Write, call_id=1, stack_ptr=1002, value=5),
    ]
    verify(ops, success=False)


def test_state_bad_mpt_root_chain():
    ops = [
        StartOp(rw_counter=1, rw=RW.Read, lexicographic_ordering_selector=0),
        StorageOp(rw_counter=7, rw=RW.Read, tx_id=1, addr=0x12345678, key=0x1516, value=789, committed_value=789),
    ]
    rows = assign_state_circuit(ops)
    rows[1]["root"] = 999  # break the root chain
    mpt = mpt_table_from_ops(ops)
    verify_state_rows(rows, mpt, success=False)


def test_state_tx_receipt_id_jump_rejected():
    ops = [
        StartOp(rw_counter=1, rw=RW.Read, lexicographic_ordering_selector=0),
        TxReceiptOp(rw_counter=1, rw=RW.Read, tx_id=1, field_tag=TxReceiptFieldTag.PostStateOrStatus, value=1),
        TxReceiptOp(rw_counter=2, rw=RW.Read, tx_id=3, field_tag=TxReceiptFieldTag.PostStateOrStatus, value=1),
    ]
    verify(ops, success=False)
