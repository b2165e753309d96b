"""Error-gadget conformance vectors (modeled on reference
tests/evm/test_error_*.py scenarios)."""
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


def run_error_step(state, bytecode, rw, pc, sp, gas_left, rwc_delta,
                   reversible=0, success=True):
    h = bytecode.hash()
    tables = Tables(
        block_table=Block().table_assignments(),
        tx_table=Transaction().table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
    )
    steps = [
        StepState(execution_state=state, rw_counter=24, call_id=1,
                  is_root=True, code_hash=h, program_counter=pc,
                  stack_pointer=sp, gas_left=gas_left,
                  reversible_write_counter=reversible),
        StepState(execution_state=ExecutionState.EndTx,
                  rw_counter=24 + rwc_delta, call_id=1),
    ]
    verify_steps(tables=tables, steps=steps, success=success)


def test_error_invalid_opcode():
    bytecode = Bytecode(bytearray([0x0C]))  # invalid opcode
    rw = RWDictionary(24).call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    run_error_step(ExecutionState.ErrorInvalidOpcode, bytecode, rw, 0, 1024, 0, 1)


def test_error_invalid_opcode_valid_rejected():
    bytecode = Bytecode().stop()
    rw = RWDictionary(24).call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    run_error_step(
        ExecutionState.ErrorInvalidOpcode, bytecode, rw, 0, 1024, 0, 1, success=False
    )


def test_error_stack_overflow():
    # PUSH1 with full stack (stack_pointer == 0)
    bytecode = Bytecode().push1(1).stop()
    rw = RWDictionary(24).call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    run_error_step(ExecutionState.ErrorStack, bytecode, rw, 0, 0, 3, 1)


def test_error_stack_underflow():
    # ADD with empty stack
    bytecode = Bytecode(bytearray([Opcode.ADD]))
    rw = RWDictionary(24).call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    run_error_step(ExecutionState.ErrorStack, bytecode, rw, 0, 1024, 3, 1)


def test_error_oog_constant():
    bytecode = Bytecode(bytearray([Opcode.CALLER]))
    rw = RWDictionary(24).call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    run_error_step(ExecutionState.ErrorOutOfGasConstant, bytecode, rw, 0, 1024, 1, 1)


def test_error_oog_constant_enough_gas_rejected():
    bytecode = Bytecode(bytearray([Opcode.CALLER]))
    rw = RWDictionary(24).call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    run_error_step(
        ExecutionState.ErrorOutOfGasConstant, bytecode, rw, 0, 1024, 100, 1,
        success=False,
    )


@pytest.mark.parametrize("dest,is_jumpi", [(100, False), (2, False), (100, True)])
def test_error_invalid_jump(dest, is_jumpi):
    # jump destination out of range or not a JUMPDEST
    if is_jumpi:
        bytecode = Bytecode().push1(7).push1(dest).jumpi().stop()
        pc = 4
        sp = 1022
    else:
        bytecode = Bytecode().push1(dest).jump().stop()
        pc = 2
        sp = 1023
    rw = RWDictionary(24).stack_read(1, sp, dest)
    if is_jumpi:
        rw.stack_read(1, 1023, 7)
    rw.call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    run_error_step(
        ExecutionState.ErrorInvalidJump, bytecode, rw, pc, sp,
        10, rw.rw_counter - 24,
    )


def test_error_write_protection():
    # SSTORE in a static context
    bytecode = Bytecode(bytearray([Opcode.SSTORE]))
    rw = (
        RWDictionary(24)
        .call_context_read(1, CallContextFieldTag.IsStatic, 1)
        .call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    )
    run_error_step(ExecutionState.ErrorWriteProtection, bytecode, rw, 0, 1022, 100, 2)


def test_error_oog_sha3():
    bytecode = Bytecode().push1(0xFF).push1(0).sha3().stop()
    rw = (
        RWDictionary(24)
        .stack_read(1, 1022, 0)       # offset
        .stack_read(1, 1023, 0xFF)    # size
        .call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    )
    # gas needed: 30 + 6*8 words + memory expansion; give less
    run_error_step(ExecutionState.ErrorOutOfGasSHA3, bytecode, rw, 4, 1022, 31, 3)


def test_error_oog_exp():
    bytecode = Bytecode().push(0xFFFF, n_bytes=32).push1(2).exp().stop()
    rw = (
        RWDictionary(24)
        .stack_read(1, 1023, 0xFFFF)  # exponent at offset 1
        .call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    )
    # dynamic gas = 50*2 + GAS_COST_SLOW = 110; give less
    run_error_step(ExecutionState.ErrorOutOfGasEXP, bytecode, rw, 35, 1022, 50, 2)
