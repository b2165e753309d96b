"""Conformance vectors for the remaining error-state gadgets (mirrors the
scenarios of reference tests/evm/test_error_{oog_account_access,
oog_static_memory_expansion,oog_dynamic_memory_expansion,oog_memory_copy,
oog_sload_store,oog_call,oog_log,return_data_out_of_bound,code_store,
invalild_creation_code,oog_create,gas_uint_overflow}.py and
precompiles/error_oog_precompile)."""
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
from zkevm_specs_tpu.tables.schemas import AccountFieldTag
from common import rand_address

from test_errors import run_error_step


@pytest.mark.parametrize("opcode", [Opcode.BALANCE, Opcode.EXTCODESIZE, Opcode.EXTCODEHASH])
def test_error_oog_account_access(opcode):
    addr = rand_address()
    bytecode = Bytecode().push(addr, n_bytes=32)
    getattr(bytecode, opcode.name.lower())()
    bytecode.stop()
    rw = (
        RWDictionary(24)
        .stack_read(1, 1023, addr)
        .call_context_read(1, CallContextFieldTag.TxId, 1)
        .tx_access_list_account_read(1, addr, False)  # cold: needs 2600
        .call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    )
    run_error_step(ExecutionState.ErrorOutOfGasAccountAccess, bytecode, rw,
                   33, 1023, 100, 4)


def test_error_oog_account_access_enough_gas_rejected():
    addr = rand_address()
    bytecode = Bytecode().push(addr, n_bytes=32).balance().stop()
    rw = (
        RWDictionary(24)
        .stack_read(1, 1023, addr)
        .call_context_read(1, CallContextFieldTag.TxId, 1)
        .tx_access_list_account_read(1, addr, False)
        .call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    )
    run_error_step(ExecutionState.ErrorOutOfGasAccountAccess, bytecode, rw,
                   33, 1023, 3000, 4, success=False)


@pytest.mark.parametrize("opcode", [Opcode.MLOAD, Opcode.MSTORE, Opcode.MSTORE8])
def test_error_oog_static_memory_expansion(opcode):
    offset = 0x20000
    bytecode = Bytecode().push(offset, n_bytes=32)
    getattr(bytecode, opcode.name.lower())()
    bytecode.stop()
    rw = (
        RWDictionary(24)
        .stack_read(1, 1023, offset)
        .call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    )
    run_error_step(ExecutionState.ErrorOutOfGasStaticMemoryExpansion,
                   bytecode, rw, 33, 1023, 50, 2)


@pytest.mark.parametrize("opcode", [Opcode.RETURN, Opcode.REVERT])
def test_error_oog_dynamic_memory_expansion(opcode):
    offset, size = 0x20000, 32
    bytecode = Bytecode().push(size, n_bytes=32).push(offset, n_bytes=32)
    getattr(bytecode, opcode.name.lower().rstrip("_") + ("_" if opcode == Opcode.RETURN else ""))()
    bytecode.stop()
    rw = (
        RWDictionary(24)
        .stack_read(1, 1022, offset)
        .stack_read(1, 1023, size)
        .call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    )
    run_error_step(ExecutionState.ErrorOutOfGasDynamicMemoryExpansion,
                   bytecode, rw, 66, 1022, 10, 3)


def test_error_oog_memory_copy():
    memory_offset, data_offset, length = 0, 0, 0x8000
    bytecode = (
        Bytecode()
        .push(length, n_bytes=32).push(data_offset, n_bytes=32)
        .push(memory_offset, n_bytes=32).calldatacopy().stop()
    )
    rw = (
        RWDictionary(24)
        .stack_read(1, 1021, memory_offset)
        .stack_read(1, 1023, length)
        .call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    )
    run_error_step(ExecutionState.ErrorOutOfGasMemoryCopy, bytecode, rw,
                   99, 1021, 100, 3)


def test_error_oog_sload():
    key, callee = 7, rand_address()
    bytecode = Bytecode().push(key, n_bytes=32).sload().stop()
    rw = (
        RWDictionary(24)
        .stack_read(1, 1023, key)
        .call_context_read(1, CallContextFieldTag.TxId, 1)
        .call_context_read(1, CallContextFieldTag.CalleeAddress, callee)
        .tx_access_list_account_storage_read(1, callee, key, False)  # cold: 2100
        .call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    )
    run_error_step(ExecutionState.ErrorOutOfGasSloadSstore, bytecode, rw,
                   33, 1023, 100, 5)


@pytest.mark.parametrize("n_topics", [0, 2])
def test_error_oog_log(n_topics):
    opcode = Opcode(int(Opcode.LOG0) + n_topics)
    mstart, msize = 0, 100
    bytecode = Bytecode().push(msize, n_bytes=32).push(mstart, n_bytes=32)
    getattr(bytecode, opcode.name.lower())()
    bytecode.stop()
    rw = (
        RWDictionary(24)
        .stack_read(1, 1022, mstart)
        .stack_read(1, 1023, msize)
        .call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    )
    # needed: 375 + 375*n_topics + 8*100; give 50
    run_error_step(ExecutionState.ErrorOutOfGasLOG, bytecode, rw, 66, 1022, 50, 3)


def test_error_return_data_out_of_bound():
    memory_offset, data_offset, length = 0, 8, 8
    return_data_length = 8  # end = 16 > 8
    bytecode = (
        Bytecode()
        .push(length, n_bytes=32).push(data_offset, n_bytes=32)
        .push(memory_offset, n_bytes=32).returndatacopy().stop()
    )
    rw = (
        RWDictionary(24)
        .stack_read(1, 1022, data_offset)
        .stack_read(1, 1023, length)
        .call_context_read(1, CallContextFieldTag.LastCalleeReturnDataLength,
                           return_data_length)
        .call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    )
    run_error_step(ExecutionState.ErrorReturnDataOutOfBound, bytecode, rw,
                   99, 1021, 100, 4)


@pytest.mark.parametrize("state,ret_length,gas_left", [
    (ExecutionState.ErrorOutOfGasCodeStore, 100, 10),      # 100*200 > 10
    (ExecutionState.ErrorMaxCodeSizeExceeded, 30000, 10**7),  # > 24576
])
def test_error_code_store(state, ret_length, gas_left):
    offset = 0
    bytecode = (
        Bytecode().push(ret_length, n_bytes=32).push(offset, n_bytes=32)
        .return_().stop()
    )
    h = bytecode.hash()
    rw = (
        RWDictionary(24)
        .stack_read(1, 1023, ret_length)
        .call_context_read(1, CallContextFieldTag.IsStatic, 0)
        .call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    )
    tables = Tables(
        block_table=Block().table_assignments(),
        tx_table=Transaction().table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
    )
    steps = [
        StepState(execution_state=state, rw_counter=24, call_id=1,
                  is_root=True, is_create=True, code_hash=h, program_counter=66,
                  stack_pointer=1022, gas_left=gas_left),
        StepState(execution_state=ExecutionState.EndTx, rw_counter=27, call_id=1),
    ]
    verify_steps(tables=tables, steps=steps)


def test_error_invalid_creation_code():
    offset = 0
    bytecode = Bytecode().push(32, n_bytes=32).push(offset, n_bytes=32).return_().stop()
    h = bytecode.hash()
    rw = (
        RWDictionary(24)
        .stack_read(1, 1022, offset)
        .memory_read(1, offset, 0xEF)  # EIP-3541 forbidden first byte
        .call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    )
    tables = Tables(
        block_table=Block().table_assignments(),
        tx_table=Transaction().table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
    )
    steps = [
        StepState(execution_state=ExecutionState.ErrorInvalidCreationCode,
                  rw_counter=24, call_id=1, is_root=True, is_create=True,
                  code_hash=h, program_counter=66, stack_pointer=1022,
                  gas_left=100),
        StepState(execution_state=ExecutionState.EndTx, rw_counter=27, call_id=1),
    ]
    verify_steps(tables=tables, steps=steps)


def test_error_oog_call():
    addr = rand_address()
    bytecode = Bytecode().staticcall(0, addr, 0, 0, 0, 0).stop()
    rw = (
        RWDictionary(24)
        .call_context_read(1, CallContextFieldTag.TxId, 1)
        .stack_read(1, 1018, 0)       # gas
        .stack_read(1, 1019, addr)    # callee
        .stack_read(1, 1020, 0)       # cd_offset
        .stack_read(1, 1021, 0)       # cd_length
        .stack_read(1, 1022, 0)       # rd_offset
        .stack_read(1, 1023, 0)       # rd_length
        .stack_write(1, 1023, 0)      # result
        .account_read(addr, AccountFieldTag.CodeHash, 0)
        .tx_access_list_account_read(1, addr, False)  # cold: needs 2600
        .call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    )
    run_error_step(ExecutionState.ErrorOutOfGasCall, bytecode, rw,
                   198, 1018, 100, 11)


def test_error_oog_create():
    value, offset, size = 0, 0, 0
    bytecode = (
        Bytecode().push(size, n_bytes=32).push(offset, n_bytes=32)
        .push(value, n_bytes=32).create().stop()
    )
    rw = (
        RWDictionary(24)
        .stack_read(1, 1022, offset)
        .stack_read(1, 1023, size)
        .call_context_read(1, CallContextFieldTag.IsRoot, 1)
        .call_context_read(1, CallContextFieldTag.TxId, 1)
        .call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    )
    # creation-tx intrinsic gas 53000 > 100
    run_error_step(ExecutionState.ErrorOutOfGasCREATE, bytecode, rw,
                   99, 1021, 100, 5)


def test_error_oog_precompile():
    # identity precompile (0x04) called from a root caller: 15 + 3 = 18 > 10.
    # Precompile errors are not halting states (reference execution_state.py:
    # 374-400), so the step restores the caller's context.
    caller_bytecode = Bytecode().staticcall(0, 0x04, 0, 32, 0, 0).stop()
    caller_hash = caller_bytecode.hash()
    caller_pc, caller_sp, caller_gas = 199, 1023, 5000
    rw = (
        RWDictionary(24)
        .call_context_read(2, CallContextFieldTag.CalleeAddress, 0x04)
        .call_context_read(2, CallContextFieldTag.CallDataLength, 32)
        .call_context_read(2, CallContextFieldTag.IsSuccess, 0)
        .call_context_read(2, CallContextFieldTag.CallerId, 1)
        .call_context_read(1, CallContextFieldTag.IsRoot, 1)
        .call_context_read(1, CallContextFieldTag.IsCreate, 0)
        .call_context_read(1, CallContextFieldTag.CodeHash, caller_hash)
        .call_context_read(1, CallContextFieldTag.ProgramCounter, caller_pc)
        .call_context_read(1, CallContextFieldTag.StackPointer, caller_sp)
        .call_context_read(1, CallContextFieldTag.GasLeft, caller_gas)
        .call_context_read(1, CallContextFieldTag.MemorySize, 0)
        .call_context_read(1, CallContextFieldTag.ReversibleWriteCounter, 0)
        .call_context_write(1, CallContextFieldTag.LastCalleeId, 2)
        .call_context_write(1, CallContextFieldTag.LastCalleeReturnDataOffset, 0)
        .call_context_write(1, CallContextFieldTag.LastCalleeReturnDataLength, 0)
    )
    tables = Tables(
        block_table=Block().table_assignments(),
        tx_table=Transaction().table_assignments(),
        bytecode_table=caller_bytecode.table_assignments(),
        rw_table=rw.rws,
    )
    steps = [
        StepState(execution_state=ExecutionState.ErrorOutOfGasPrecompile,
                  rw_counter=24, call_id=2, is_root=False, code_hash=0,
                  program_counter=0, stack_pointer=1024, gas_left=10),
        StepState(execution_state=ExecutionState.STOP, rw_counter=39,
                  call_id=1, is_root=True, code_hash=caller_hash,
                  program_counter=caller_pc, stack_pointer=caller_sp,
                  gas_left=caller_gas),
    ]
    verify_steps(tables=tables, steps=steps)


def test_error_gas_uint_overflow():
    offset = 1 << 64  # memory size overflows u64
    bytecode = Bytecode().push(offset, n_bytes=32).mload().stop()
    rw = (
        RWDictionary(24)
        .call_context_read(1, CallContextFieldTag.CallDataLength, 0)
        .call_context_read(1, CallContextFieldTag.TxId, 1)
        .call_context_read(1, CallContextFieldTag.IsRoot, 1)
        .stack_read(1, 1023, offset)
        .call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    )
    run_error_step(ExecutionState.ErrorGasUintOverflow, bytecode, rw,
                   33, 1023, 100, 5)
