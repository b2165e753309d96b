"""Precompile gadget vectors (modeled on reference
tests/evm/precompiles/)."""
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from zkevm_specs_tpu.evm import (
    Block,
    Bytecode,
    CallContextFieldTag,
    ExecutionState,
    RWDictionary,
    StepState,
    Tables,
    Transaction,
    verify_steps,
)
from zkevm_specs_tpu.circuits.ecc import EcAdd, EccCircuit, ecc_table_rows
from zkevm_specs_tpu.ops.ecc import bn254
from zkevm_specs_tpu.utils.param import Bn254AddGas

R_KECCAK = 0xABCDEF
CALLER_ID = 1
CALLEE_ID = 24


def test_ec_add_precompile():
    p = bn254.g1_mul(bn254.G1, 2)
    q = bn254.g1_mul(bn254.G1, 3)
    out = bn254.g1_add(p, q)
    aux = (p[0], p[1], q[0], q[1], out[0], out[1])

    gas_left = Bn254AddGas + 10
    caller_bytecode = Bytecode().stop()
    caller_hash = caller_bytecode.hash()

    ecc = EccCircuit(4, 4, 4)
    ecc.append_add(EcAdd(p=p, q=q, out=out))

    rw = (
        RWDictionary(CALLEE_ID)
        .call_context_read(CALLEE_ID, CallContextFieldTag.IsSuccess, 1)
        .call_context_read(CALLEE_ID, CallContextFieldTag.CalleeAddress, 0x06)
        .call_context_read(CALLEE_ID, CallContextFieldTag.CallerId, CALLER_ID)
        .call_context_read(CALLER_ID, CallContextFieldTag.IsRoot, 1)
        .call_context_read(CALLER_ID, CallContextFieldTag.IsCreate, 0)
        .call_context_read(CALLER_ID, CallContextFieldTag.CodeHash, caller_hash)
        .call_context_read(CALLER_ID, CallContextFieldTag.ProgramCounter, 0)
        .call_context_read(CALLER_ID, CallContextFieldTag.StackPointer, 1023)
        .call_context_read(CALLER_ID, CallContextFieldTag.GasLeft, 100)
        .call_context_read(CALLER_ID, CallContextFieldTag.MemorySize, 0)
        .call_context_read(CALLER_ID, CallContextFieldTag.ReversibleWriteCounter, 0)
        .call_context_write(CALLER_ID, CallContextFieldTag.LastCalleeId, CALLEE_ID)
        .call_context_write(CALLER_ID, CallContextFieldTag.LastCalleeReturnDataOffset, 0)
        .call_context_write(CALLER_ID, CallContextFieldTag.LastCalleeReturnDataLength, 64)
    )
    n_rw = rw.rw_counter - CALLEE_ID

    tables = Tables(
        block_table=Block().table_assignments(),
        tx_table=Transaction().table_assignments(),
        bytecode_table=caller_bytecode.table_assignments(),
        rw_table=rw.rws,
        ecc_table=ecc_table_rows(ecc, R_KECCAK),
    )

    steps = [
        StepState(
            execution_state=ExecutionState.BN254_ADD, rw_counter=CALLEE_ID,
            call_id=CALLEE_ID, is_root=False, code_hash=0,
            program_counter=0, stack_pointer=1024, gas_left=gas_left,
            aux_data=aux,
        ),
        StepState(
            execution_state=ExecutionState.STOP, rw_counter=CALLEE_ID + n_rw,
            call_id=CALLER_ID, is_root=True, is_create=False,
            code_hash=caller_hash, program_counter=0, stack_pointer=1023,
            gas_left=100 + (gas_left - Bn254AddGas), memory_word_size=0,
            reversible_write_counter=0,
        ),
    ]
    verify_steps(tables=tables, steps=steps)


def test_ec_add_precompile_bad_output_rejected():
    p = bn254.g1_mul(bn254.G1, 2)
    q = bn254.g1_mul(bn254.G1, 3)
    out = bn254.g1_add(p, q)
    bad_out = (out[0], out[1] + 1)
    aux = (p[0], p[1], q[0], q[1], bad_out[0], bad_out[1])

    ecc = EccCircuit(4, 4, 4)
    ecc.append_add(EcAdd(p=p, q=q, out=out))

    caller_bytecode = Bytecode().stop()
    rw = (
        RWDictionary(CALLEE_ID)
        .call_context_read(CALLEE_ID, CallContextFieldTag.IsSuccess, 1)
        .call_context_read(CALLEE_ID, CallContextFieldTag.CalleeAddress, 0x06)
    )
    tables = Tables(
        block_table=Block().table_assignments(),
        bytecode_table=caller_bytecode.table_assignments(),
        rw_table=rw.rws,
        ecc_table=ecc_table_rows(ecc, R_KECCAK),
    )
    steps = [
        StepState(
            execution_state=ExecutionState.BN254_ADD, rw_counter=CALLEE_ID,
            call_id=CALLEE_ID, is_root=False, gas_left=Bn254AddGas,
            aux_data=aux,
        ),
        StepState(execution_state=ExecutionState.STOP, rw_counter=CALLEE_ID + 14,
                  call_id=CALLER_ID),
    ]
    verify_steps(tables=tables, steps=steps, success=False)
