"""CALLDATACOPY edge sweep: in-bound, multi-word, out-of-bound (source
shorter than the copy), and zero-length copies, from a root frame (tx-table
calldata) and an internal frame (caller memory) — mirroring the scenario
matrix of reference tests/evm/test_calldatacopy.py:26-39, with copy-table
verification and corrupt-vector negatives."""
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from zkevm_specs_tpu.evm import (
    Block,
    Bytecode,
    CallContextFieldTag,
    ExecutionState,
    Opcode,
    RWDictionary,
    StepState,
    Tables,
    Transaction,
    verify_steps,
)
from zkevm_specs_tpu.circuits.copy import verify_copy_table
from zkevm_specs_tpu.evm.opcode import constant_gas_cost
from zkevm_specs_tpu.tables.schemas import CopyDataTypeTag
from zkevm_specs_tpu.utils.param import GAS_COST_COPY
from zkevm_specs_tpu.witness.typing import CopyCircuit, copy_circuit_to_table
from common import memory_expansion, memory_word_size, rand_bytes, rand_fq

TX_ID = 13
CALLER_ID = 7
CALL_ID = 1

# (call_data_length, data_offset, memory_offset, length, from_tx, cd_offset)
# — the reference's TESTING_DATA (test_calldatacopy.py:26-39)
SWEEP = [
    # simple cases
    (32, 5, 0xA0, 8, True, 0),
    (32, 5, 0xA0, 8, False, 0x20),
    # multiple words
    (128, 10, 0xA0, 90, True, 0),
    (128, 10, 0xA0, 90, False, 0x20),
    # out-of-bound cases (source exhausted -> zero padding)
    (32, 5, 0xA0, 45, True, 0),
    (32, 40, 0xA0, 5, True, 0),
    (32, 5, 0xA0, 45, False, 0x20),
    # zero length
    (32, 5, 0xA0, 0, True, 0),
    (32, 5, 0xA0, 0, False, 0x20),
]


def build_calldatacopy_vector(call_data_length, data_offset, memory_offset,
                              length, from_tx, cd_offset,
                              corrupt=None, success=True):
    r = rand_fq()
    call_data = rand_bytes(call_data_length)

    bytecode = (
        Bytecode()
        .push(length, n_bytes=32).push(data_offset, n_bytes=32)
        .push(memory_offset, n_bytes=32).calldatacopy().stop()
    )
    h = bytecode.hash()

    curr_mws = memory_word_size(0 if from_tx else cd_offset + call_data_length)
    next_mws, mem_gas = memory_expansion(
        curr_mws, memory_offset + length if length else 0)
    gas = (constant_gas_cost(Opcode.CALLDATACOPY) + mem_gas
           + GAS_COST_COPY * ((length + 31) // 32))

    rw = (
        RWDictionary(24)
        .stack_read(CALL_ID, 1021, memory_offset)
        .stack_read(CALL_ID, 1022, data_offset)
        .stack_read(CALL_ID, 1023, length)
    )
    if from_tx:
        assert cd_offset == 0
        rw.call_context_read(CALL_ID, CallContextFieldTag.TxId, TX_ID)
        rw.call_context_read(CALL_ID, CallContextFieldTag.CallDataLength,
                             call_data_length)
        src_id, src_tag = TX_ID, CopyDataTypeTag.TxCalldata
    else:
        rw.call_context_read(CALL_ID, CallContextFieldTag.CallerId, CALLER_ID)
        rw.call_context_read(CALL_ID, CallContextFieldTag.CallDataLength,
                             call_data_length)
        rw.call_context_read(CALL_ID, CallContextFieldTag.CallDataOffset,
                             cd_offset)
        src_id, src_tag = CALLER_ID, CopyDataTypeTag.Memory

    copy_circuit = CopyCircuit()
    if length:
        src_data = {cd_offset + i: call_data[i]
                    for i in range(call_data_length)}
        copy_circuit.copy(
            r, rw, src_id, src_tag, CALL_ID, CopyDataTypeTag.Memory,
            cd_offset + data_offset, cd_offset + call_data_length,
            memory_offset, length, src_data,
        )
        if corrupt == "copied_byte":
            # flip the first written byte in BOTH the rw row and the copy
            # row (a consistent lie): the copy circuit's source-side rows no
            # longer match the tx-table/memory source
            for row in copy_circuit.rows:
                if row["q_step"] == 0:  # write row
                    row["value"] = (row["value"] + 1) % 256
                    break
            for rw_row in rw.rws:
                if rw_row["key0"] == 2 and rw_row["rw"] == 1:  # memory write
                    rw_row["value"] = (rw_row["value"] + 1) % 256
                    break
    n_rw = rw.rw_counter - 24

    tx = (Transaction(id=TX_ID, gas=gas, call_data=call_data) if from_tx
          else Transaction(id=TX_ID, gas=gas))
    tables = Tables(
        block_table=Block().table_assignments(),
        tx_table=tx.table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
        copy_table=copy_circuit_to_table(copy_circuit),
    )
    pc = 99
    steps = [
        StepState(
            execution_state=ExecutionState.CALLDATACOPY, rw_counter=24,
            call_id=CALL_ID, is_root=from_tx, code_hash=h,
            program_counter=pc, stack_pointer=1021, gas_left=gas,
            memory_word_size=curr_mws,
        ),
        StepState(
            execution_state=ExecutionState.STOP, rw_counter=24 + n_rw,
            call_id=CALL_ID, is_root=from_tx, code_hash=h,
            program_counter=pc + 1, stack_pointer=1024, gas_left=0,
            memory_word_size=next_mws,
        ),
    ]
    verify_steps(tables=tables, steps=steps, success=success)
    if corrupt == "copied_byte":
        with pytest.raises(AssertionError):
            verify_copy_table(copy_circuit, tables, r)
    elif length:
        verify_copy_table(copy_circuit, tables, r)


@pytest.mark.parametrize(
    "call_data_length,data_offset,memory_offset,length,from_tx,cd_offset",
    SWEEP)
def test_calldatacopy_sweep(call_data_length, data_offset, memory_offset,
                            length, from_tx, cd_offset):
    build_calldatacopy_vector(call_data_length, data_offset, memory_offset,
                              length, from_tx, cd_offset)


@pytest.mark.parametrize("from_tx", [True, False])
def test_calldatacopy_corrupt_copied_byte_rejected(from_tx):
    build_calldatacopy_vector(32, 5, 0xA0, 8, from_tx,
                              0 if from_tx else 0x20,
                              corrupt="copied_byte")


def test_calldatacopy_entirely_out_of_bound():
    # data_offset past the end of calldata: every byte is zero padding
    build_calldatacopy_vector(16, 64, 0x40, 32, True, 0)


def test_calldatacopy_huge_memory_offset_expansion():
    # a copy landing deep into fresh memory pays quadratic expansion gas
    build_calldatacopy_vector(32, 0, 0x2000, 32, True, 0)
