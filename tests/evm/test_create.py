"""CREATE/CREATE2 conformance vectors (mirrors scenarios of reference
tests/evm/test_create.py: empty-initcode success paths and the
insufficient-balance precheck failure)."""
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
from zkevm_specs_tpu.ops.keccak import EMPTY_CODE_HASH, keccak256
from zkevm_specs_tpu.tables.schemas import AccountFieldTag
from zkevm_specs_tpu.utils.param import GAS_COST_CREATE
from zkevm_specs_tpu.witness.rlp import rlp_encode
from common import rand_address


CALLER = 0xFE0000000000000000000000000000000000FE


def _create_address(caller: int, nonce: int) -> int:
    return int.from_bytes(
        keccak256(rlp_encode([caller.to_bytes(20, "big"), nonce]))[-20:], "big")


def _create2_address(caller: int, salt: int, code_hash: int) -> int:
    return int.from_bytes(
        keccak256(b"\xff" + caller.to_bytes(20, "big") + salt.to_bytes(32, "little")
                  + code_hash.to_bytes(32, "little"))[-20:], "big")


@pytest.mark.parametrize("is_create2", [False, True])
def test_create_empty_initcode(is_create2):
    """CREATE/CREATE2 with size == 0: precheck ok, no collision, no new
    context — the contract is created empty in-place."""
    opcode = Opcode.CREATE2 if is_create2 else Opcode.CREATE
    value, offset, size, salt = 0, 0, 0, 0x5A17
    nonce_new = 1  # caller nonce after the write; used for the address
    if is_create2:
        ca = _create2_address(CALLER, salt, EMPTY_CODE_HASH)
        bytecode = Bytecode().create2(value, offset, size, salt).stop()
        sp0 = 1020
    else:
        ca = _create_address(CALLER, nonce_new)
        bytecode = Bytecode().create(value, offset, size).stop()
        sp0 = 1021
    h = bytecode.hash()

    rw = RWDictionary(9)
    rw.stack_read(1, sp0, value).stack_read(1, sp0 + 1, offset).stack_read(1, sp0 + 2, size)
    if is_create2:
        rw.stack_read(1, sp0 + 3, salt)
    rw.stack_write(1, 1023, ca)
    rw.call_context_read(1, CallContextFieldTag.Depth, 1)
    rw.call_context_read(1, CallContextFieldTag.TxId, 1)
    rw.call_context_read(1, CallContextFieldTag.CallerAddress, CALLER)
    rw.account_write(CALLER, AccountFieldTag.Nonce, nonce_new, nonce_new - 1)
    rw.account_read(CALLER, AccountFieldTag.Balance, 100)
    # the CREATE outcome is read from the CALLEE context (create.py deviation
    # note: the reference reads the caller's IsSuccess, incoherent in an
    # integrated witness)
    rw.call_context_read(9, CallContextFieldTag.IsSuccess, 1)
    rw.call_context_read(1, CallContextFieldTag.IsStatic, 0)
    rw.call_context_read(1, CallContextFieldTag.RwCounterEndOfReversion, 0)
    rw.call_context_read(1, CallContextFieldTag.IsPersistent, 1)
    rw.tx_access_list_account_write(1, ca, True, False)
    rw.account_read(ca, AccountFieldTag.CodeHash, 0)
    rw.account_read(ca, AccountFieldTag.Nonce, 0)
    callee_call_id = 9  # == curr rw_counter
    rw.call_context_read(callee_call_id, CallContextFieldTag.RwCounterEndOfReversion, 0)
    rw.call_context_read(callee_call_id, CallContextFieldTag.IsPersistent, 1)
    # transfer of 0 wei
    rw.account_write(CALLER, AccountFieldTag.Balance, 100, 100)
    rw.account_write(ca, AccountFieldTag.Balance, 0, 0)
    rw.account_write(ca, AccountFieldTag.Nonce, 1, 0)
    rw.call_context_write(1, CallContextFieldTag.LastCalleeId, 0)
    rw.call_context_write(1, CallContextFieldTag.LastCalleeReturnDataOffset, 0)
    rw.call_context_write(1, CallContextFieldTag.LastCalleeReturnDataLength, 0)
    n_rw = rw.rw_counter - 9

    gas = GAS_COST_CREATE + 1000
    tables = Tables(
        block_table=Block().table_assignments(),
        tx_table=Transaction().table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
    )
    pc0 = 33 * (4 if is_create2 else 3)
    steps = [
        StepState(execution_state=ExecutionState.CREATE2 if is_create2
                  else ExecutionState.CREATE,
                  rw_counter=9, call_id=1, is_root=True, code_hash=h,
                  program_counter=pc0, stack_pointer=sp0, gas_left=gas),
        StepState(execution_state=ExecutionState.STOP, rw_counter=9 + n_rw,
                  call_id=1, is_root=True, code_hash=h, program_counter=pc0 + 1,
                  stack_pointer=1023, gas_left=gas - GAS_COST_CREATE
                  - (0 if not is_create2 else 0),
                  # access-list write + transfer pair + contract nonce write
                  reversible_write_counter=4),
    ]
    verify_steps(tables=tables, steps=steps)


def test_create_insufficient_balance():
    """Precheck failure: value > balance — CREATE pushes 0 and stays in
    context with is_success == 0."""
    value, offset, size = 200, 0, 0
    bytecode = Bytecode().create(value, offset, size).stop()
    h = bytecode.hash()

    rw = (
        RWDictionary(9)
        .stack_read(1, 1021, value)
        .stack_read(1, 1022, offset)
        .stack_read(1, 1023, size)
        .stack_write(1, 1023, 0)
        .call_context_read(1, CallContextFieldTag.Depth, 1)
        .call_context_read(1, CallContextFieldTag.TxId, 1)
        .call_context_read(1, CallContextFieldTag.CallerAddress, CALLER)
        .account_write(CALLER, AccountFieldTag.Nonce, 1, 0)
        .account_read(CALLER, AccountFieldTag.Balance, 100)
        .call_context_read(9, CallContextFieldTag.IsSuccess, 0)
        .call_context_read(1, CallContextFieldTag.IsStatic, 0)
        .call_context_read(1, CallContextFieldTag.RwCounterEndOfReversion, 0)
        .call_context_read(1, CallContextFieldTag.IsPersistent, 1)
        .call_context_write(1, CallContextFieldTag.LastCalleeId, 0)
        .call_context_write(1, CallContextFieldTag.LastCalleeReturnDataOffset, 0)
        .call_context_write(1, CallContextFieldTag.LastCalleeReturnDataLength, 0)
    )
    n_rw = rw.rw_counter - 9

    gas = GAS_COST_CREATE + 500
    tables = Tables(
        block_table=Block().table_assignments(),
        tx_table=Transaction().table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
    )
    steps = [
        StepState(execution_state=ExecutionState.CREATE, rw_counter=9,
                  call_id=1, is_root=True, code_hash=h, program_counter=99,
                  stack_pointer=1021, gas_left=gas),
        StepState(execution_state=ExecutionState.STOP, rw_counter=9 + n_rw,
                  call_id=1, is_root=True, code_hash=h, program_counter=100,
                  stack_pointer=1023, gas_left=500),
    ]
    verify_steps(tables=tables, steps=steps)
