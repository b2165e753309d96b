"""CALL-family and RETURN/REVERT conformance scenarios (modeled on reference
tests/evm/test_callop.py and test_return_revert.py)."""
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
from zkevm_specs_tpu.utils.param import (
    GAS_COST_ACCOUNT_COLD_ACCESS,
    GAS_COST_WARM_ACCESS,
)

CALLER_ADDRESS = 0xFE
CALLEE_ADDRESS = 0xFF


@pytest.mark.parametrize("is_warm", [False, True])
def test_call_to_contract(is_warm):
    caller_id = 1
    caller_balance = int(1e18)
    callee_bytecode = Bytecode().push1(0).stop()
    callee_hash = callee_bytecode.hash()

    gas_arg = 0xFFFFFFFF
    value = 0
    gas_cost = (GAS_COST_WARM_ACCESS if is_warm else GAS_COST_ACCOUNT_COLD_ACCESS)
    gas_left = gas_cost + 64
    gas_available = gas_left - gas_cost
    one_64th = gas_available // 64
    callee_gas_left = min(gas_available - one_64th, gas_arg)

    caller_bytecode = (
        Bytecode()
        .call(gas_arg, CALLEE_ADDRESS, value, 0, 0, 0, 0)
        .stop()
    )
    caller_hash = caller_bytecode.hash()
    pc = 33 * 7
    sp0 = 1017

    rw = RWDictionary(24)
    callee_call_id = 24
    (
        rw.call_context_read(caller_id, CallContextFieldTag.TxId, 1)
        .call_context_read(caller_id, CallContextFieldTag.RwCounterEndOfReversion, 0)
        .call_context_read(caller_id, CallContextFieldTag.IsPersistent, 1)
        .call_context_read(caller_id, CallContextFieldTag.CalleeAddress, CALLER_ADDRESS)
        .call_context_read(caller_id, CallContextFieldTag.IsStatic, 0)
        .call_context_read(caller_id, CallContextFieldTag.Depth, 1)
        .stack_read(caller_id, sp0 + 0, gas_arg)
        .stack_read(caller_id, sp0 + 1, CALLEE_ADDRESS)
        .stack_read(caller_id, sp0 + 2, value)
        .stack_read(caller_id, sp0 + 3, 0)
        .stack_read(caller_id, sp0 + 4, 0)
        .stack_read(caller_id, sp0 + 5, 0)
        .stack_read(caller_id, sp0 + 6, 0)
        .stack_write(caller_id, 1023, 1)  # is_success
        .account_read(CALLEE_ADDRESS, AccountFieldTag.CodeHash, callee_hash)
        .tx_access_list_account_write(1, CALLEE_ADDRESS, True, is_warm)
        .call_context_read(callee_call_id, CallContextFieldTag.RwCounterEndOfReversion, 0)
        .call_context_read(callee_call_id, CallContextFieldTag.IsPersistent, 1)
        .account_read(CALLER_ADDRESS, AccountFieldTag.Balance, caller_balance)
        .account_write(CALLER_ADDRESS, AccountFieldTag.Balance, caller_balance, caller_balance)
        .account_write(CALLEE_ADDRESS, AccountFieldTag.Balance, 0, 0)
        .call_context_write(caller_id, CallContextFieldTag.ProgramCounter, pc + 1)
        .call_context_write(caller_id, CallContextFieldTag.StackPointer, 1023)
        .call_context_write(caller_id, CallContextFieldTag.GasLeft, gas_left - gas_cost - callee_gas_left)
        .call_context_write(caller_id, CallContextFieldTag.MemorySize, 0)
        .call_context_write(caller_id, CallContextFieldTag.ReversibleWriteCounter, 1)
        .call_context_read(callee_call_id, CallContextFieldTag.CallerId, caller_id)
        .call_context_read(callee_call_id, CallContextFieldTag.TxId, 1)
        .call_context_read(callee_call_id, CallContextFieldTag.Depth, 2)
        .call_context_read(callee_call_id, CallContextFieldTag.CallerAddress, CALLER_ADDRESS)
        .call_context_read(callee_call_id, CallContextFieldTag.CalleeAddress, CALLEE_ADDRESS)
        .call_context_read(callee_call_id, CallContextFieldTag.CallDataOffset, 0)
        .call_context_read(callee_call_id, CallContextFieldTag.CallDataLength, 0)
        .call_context_read(callee_call_id, CallContextFieldTag.ReturnDataOffset, 0)
        .call_context_read(callee_call_id, CallContextFieldTag.ReturnDataLength, 0)
        .call_context_read(callee_call_id, CallContextFieldTag.Value, value)
        .call_context_read(callee_call_id, CallContextFieldTag.IsSuccess, 1)
        .call_context_read(callee_call_id, CallContextFieldTag.IsStatic, 0)
        .call_context_read(callee_call_id, CallContextFieldTag.LastCalleeId, 0)
        .call_context_read(callee_call_id, CallContextFieldTag.LastCalleeReturnDataOffset, 0)
        .call_context_read(callee_call_id, CallContextFieldTag.LastCalleeReturnDataLength, 0)
        .call_context_read(callee_call_id, CallContextFieldTag.IsRoot, 0)
        .call_context_read(callee_call_id, CallContextFieldTag.IsCreate, 0)
        .call_context_read(callee_call_id, CallContextFieldTag.CodeHash, callee_hash)
    )
    n_rw = rw.rw_counter - 24

    tables = Tables(
        block_table=Block().table_assignments(),
        tx_table=Transaction(id=1).table_assignments(),
        bytecode_table=(
            caller_bytecode.table_assignments() + callee_bytecode.table_assignments()
        ),
        rw_table=rw.rws,
    )

    verify_steps(
        tables=tables,
        steps=[
            StepState(
                execution_state=ExecutionState.CALL_OP, rw_counter=24,
                call_id=caller_id, is_root=True, code_hash=caller_hash,
                program_counter=pc, stack_pointer=sp0, gas_left=gas_left,
            ),
            StepState(
                execution_state=ExecutionState.PUSH, rw_counter=24 + n_rw,
                call_id=callee_call_id, is_root=False, code_hash=callee_hash,
                program_counter=0, stack_pointer=1024,
                gas_left=callee_gas_left, reversible_write_counter=2,
            ),
        ],
    )


@pytest.mark.parametrize("is_return", [True, False])
def test_return_revert_root(is_return):
    return_offset, return_length = 4, 10
    op = Opcode.RETURN if is_return else Opcode.REVERT
    bytecode = Bytecode()
    getattr(bytecode, op.name.lower())(return_offset, return_length)
    h = bytecode.hash()

    rw = (
        RWDictionary(24)
        .call_context_read(1, CallContextFieldTag.IsSuccess, int(is_return))
        .stack_read(1, 1022, return_offset)
        .stack_read(1, 1023, return_length)
        .call_context_read(1, CallContextFieldTag.IsPersistent, int(is_return))
    )
    tables = Tables(
        block_table=Block().table_assignments(),
        tx_table=Transaction().table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
    )
    verify_steps(
        tables=tables,
        steps=[
            StepState(
                execution_state=ExecutionState.RETURN, rw_counter=24, call_id=1,
                is_root=True, is_create=False, code_hash=h, program_counter=66,
                stack_pointer=1022, gas_left=0, reversible_write_counter=2,
                memory_word_size=1,
            ),
            StepState(
                # REVERT skips the reversion-mirror section: delta = 4 rows
                # + reversible_write_counter (2); RETURN: plain 4
                execution_state=ExecutionState.EndTx,
                rw_counter=28 if is_return else 30, call_id=1,
            ),
        ],
    )


@pytest.mark.parametrize("is_return", [True, False])
@pytest.mark.parametrize("offset,length,mws0", [
    (4, 100, 2),     # expansion 64B -> 128B (reference TESTING_DATA row 3/4)
    (0, 0, 0),       # empty return data, no region
    (0x20, 0x40, 1), # expansion from one word
    (31, 1, 0),      # unaligned single byte
    (0, 0x2000, 0),  # deep expansion, quadratic term non-zero
])
def test_return_revert_root_expansion(is_return, offset, length, mws0):
    """Root-frame RETURN/REVERT across memory-expansion shapes (reference
    test_return_revert.py TESTING_DATA_IS_ROOT_NOT_CREATE extended)."""
    op = Opcode.RETURN if is_return else Opcode.REVERT
    bytecode = Bytecode()
    getattr(bytecode, op.name.lower())(offset, length)
    h = bytecode.hash()

    nm = max(mws0, (offset + length + 31) // 32 if length else 0)
    exp_gas = 3 * (nm - mws0) + nm * nm // 512 - mws0 * mws0 // 512

    rw = (
        RWDictionary(24)
        .call_context_read(1, CallContextFieldTag.IsSuccess, int(is_return))
        .stack_read(1, 1022, offset)
        .stack_read(1, 1023, length)
        .call_context_read(1, CallContextFieldTag.IsPersistent, int(is_return))
    )
    tables = Tables(
        block_table=Block().table_assignments(),
        tx_table=Transaction().table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
    )
    verify_steps(
        tables=tables,
        steps=[
            StepState(
                execution_state=ExecutionState.RETURN, rw_counter=24,
                call_id=1, is_root=True, is_create=False, code_hash=h,
                program_counter=66, stack_pointer=1022, gas_left=exp_gas,
                reversible_write_counter=2, memory_word_size=mws0,
            ),
            StepState(
                # root halts settle gas in EndTx: gas_left flows through
                # (reference return_revert.py:123 Transition.to)
                execution_state=ExecutionState.EndTx, gas_left=exp_gas,
                rw_counter=28 if is_return else 30, call_id=1,
            ),
        ],
    )


@pytest.mark.parametrize("is_return", [True, False])
def test_return_revert_root_wrong_rw_delta_rejected(is_return):
    op = Opcode.RETURN if is_return else Opcode.REVERT
    bytecode = Bytecode()
    getattr(bytecode, op.name.lower())(4, 100)
    h = bytecode.hash()
    rw = (
        RWDictionary(24)
        .call_context_read(1, CallContextFieldTag.IsSuccess, int(is_return))
        .stack_read(1, 1022, 4)
        .stack_read(1, 1023, 100)
        .call_context_read(1, CallContextFieldTag.IsPersistent, int(is_return))
    )
    tables = Tables(
        block_table=Block().table_assignments(),
        tx_table=Transaction().table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
    )
    verify_steps(
        tables=tables,
        steps=[
            StepState(
                execution_state=ExecutionState.RETURN, rw_counter=24,
                call_id=1, is_root=True, is_create=False, code_hash=h,
                program_counter=66, stack_pointer=1022, gas_left=6,
                reversible_write_counter=2, memory_word_size=2,
            ),
            StepState(
                # wrong: REVERT must skip the reversion-mirror section
                # (delta 4 + reversible_write_counter), RETURN must not
                execution_state=ExecutionState.EndTx, gas_left=6,
                rw_counter=30 if is_return else 28, call_id=1,
            ),
        ],
        success=False,
    )
