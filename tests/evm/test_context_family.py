"""Conformance vectors for context/environment gadgets (mirrors the scenarios
of reference tests/evm/test_{caller,callvalue,address,calldatasize,codesize,
returndatasize,origin,gasprice,selfbalance,block_ctx,blockhash,balance,
calldataload}.py)."""
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
from zkevm_specs_tpu.evm.opcode import constant_gas_cost
from zkevm_specs_tpu.witness.typing import Account
from common import rand_address, rand_word


def run_ctx_push(
    state, opcode, rw_builder, pushed_value, tx=None, block=None,
    dynamic_gas=0, rw_delta=None, gas_left=None, success=True, bytecode=None,
):
    """One opcode that (maybe after call-context reads) pushes one word."""
    if bytecode is None:
        bytecode = Bytecode()
        getattr(bytecode, opcode.name.lower())()
        bytecode.stop()
    h = bytecode.hash()
    rw = RWDictionary(9)
    rw_builder(rw)
    rw.stack_write(1, 1023, pushed_value)
    n_rw = rw.rw_counter - 9
    gas = constant_gas_cost(opcode) + dynamic_gas
    if gas_left is None:
        gas_left = gas
    tables = Tables(
        block_table=(block or Block()).table_assignments(),
        tx_table=(tx.table_assignments() if tx else ()),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
    )
    steps = [
        StepState(
            execution_state=state, rw_counter=9, call_id=1, is_root=True,
            code_hash=h, program_counter=0, stack_pointer=1024, gas_left=gas_left,
        ),
        StepState(
            execution_state=ExecutionState.STOP, rw_counter=9 + n_rw, call_id=1,
            is_root=True, code_hash=h, program_counter=1, stack_pointer=1023,
            gas_left=gas_left - gas,
        ),
    ]
    verify_steps(tables=tables, steps=steps, success=success)


def test_caller():
    addr = rand_address()
    run_ctx_push(
        ExecutionState.CALLER, Opcode.CALLER,
        lambda rw: rw.call_context_read(1, CallContextFieldTag.CallerAddress, addr),
        addr,
    )


def test_callvalue():
    v = rand_word()
    run_ctx_push(
        ExecutionState.CALLVALUE, Opcode.CALLVALUE,
        lambda rw: rw.call_context_read(1, CallContextFieldTag.Value, v),
        v,
    )


def test_address():
    addr = rand_address()
    run_ctx_push(
        ExecutionState.ADDRESS, Opcode.ADDRESS,
        lambda rw: rw.call_context_read(1, CallContextFieldTag.CalleeAddress, addr),
        addr,
    )


def test_calldatasize():
    run_ctx_push(
        ExecutionState.CALLDATASIZE, Opcode.CALLDATASIZE,
        lambda rw: rw.call_context_read(1, CallContextFieldTag.CallDataLength, 64),
        64,
    )


def test_returndatasize():
    run_ctx_push(
        ExecutionState.RETURNDATASIZE, Opcode.RETURNDATASIZE,
        lambda rw: rw.call_context_read(
            1, CallContextFieldTag.LastCalleeReturnDataLength, 32
        ),
        32,
    )


def test_codesize():
    bytecode = Bytecode().codesize().stop()
    run_ctx_push(
        ExecutionState.CODESIZE, Opcode.CODESIZE,
        lambda rw: None, len(bytecode.code), bytecode=bytecode,
    )


def test_origin():
    tx = Transaction(id=1, caller_address=0xFE)
    run_ctx_push(
        ExecutionState.ORIGIN, Opcode.ORIGIN,
        lambda rw: rw.call_context_read(1, CallContextFieldTag.TxId, 1),
        0xFE, tx=tx,
    )


def test_gasprice():
    tx = Transaction(id=1, gas_price=123456789)
    run_ctx_push(
        ExecutionState.GASPRICE, Opcode.GASPRICE,
        lambda rw: rw.call_context_read(1, CallContextFieldTag.TxId, 1),
        123456789, tx=tx,
    )


def test_selfbalance():
    addr, bal = 0xCAFE, rand_word()
    from zkevm_specs_tpu.tables.schemas import AccountFieldTag

    run_ctx_push(
        ExecutionState.SELFBALANCE, Opcode.SELFBALANCE,
        lambda rw: (
            rw.call_context_read(1, CallContextFieldTag.CalleeAddress, addr)
            .account_read(addr, AccountFieldTag.Balance, bal)
        ),
        bal,
    )


BLOCK_CTX_CASES = [
    (Opcode.COINBASE, "coinbase", 0x30),
    (Opcode.TIMESTAMP, "timestamp", 1234567),
    (Opcode.NUMBER, "number", 7654),
    (Opcode.GASLIMIT, "gas_limit", 15000000),
    (Opcode.BASEFEE, "base_fee", rand_word()),
    (Opcode.CHAINID, "chainid", 1),
    (Opcode.PREVRANDAO, "prev_randao", rand_word()),
]


@pytest.mark.parametrize("opcode,field,value", BLOCK_CTX_CASES)
def test_blockctx(opcode, field, value):
    block = Block(**{field: value})
    run_ctx_push(
        ExecutionState.BlockCtx, opcode, lambda rw: None, value, block=block
    )


def test_blockctx_bad_value():
    block = Block(timestamp=1000)
    with pytest.raises(AssertionError):
        run_ctx_push(
            ExecutionState.BlockCtx, Opcode.TIMESTAMP, lambda rw: None, 1001,
            block=block,
        )


@pytest.mark.parametrize("block_number,current,expect_hash", [
    (5, 10, True),
    (10, 10, False),     # future/self -> 0
    (0, 300, False),     # too old -> 0
])
def test_blockhash(block_number, current, expect_hash):
    history = [rand_word() for _ in range(min(256, current))]
    block = Block(number=current, history_hashes=history)
    if expect_hash:
        h = history[-(current - block_number)]
    else:
        h = 0
    bytecode = Bytecode().push(block_number, n_bytes=32).blockhash().stop()
    bh = bytecode.hash()
    rw = (
        RWDictionary(9)
        .stack_read(1, 1023, block_number)
        .stack_write(1, 1023, h)
    )
    tables = Tables(
        block_table=block.table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
    )
    gas = constant_gas_cost(Opcode.BLOCKHASH)
    steps = [
        StepState(
            execution_state=ExecutionState.BLOCKHASH, rw_counter=9, call_id=1,
            is_root=True, code_hash=bh, program_counter=33, stack_pointer=1023,
            gas_left=gas,
        ),
        StepState(
            execution_state=ExecutionState.STOP, rw_counter=11, call_id=1,
            is_root=True, code_hash=bh, program_counter=34, stack_pointer=1023,
            gas_left=0,
        ),
    ]
    verify_steps(tables=tables, steps=steps)


@pytest.mark.parametrize("exists,warm", [(1, False), (1, True), (0, False)])
def test_balance(exists, warm):
    from zkevm_specs_tpu.tables.schemas import AccountFieldTag
    from zkevm_specs_tpu.utils.param import EXTRA_GAS_COST_ACCOUNT_COLD_ACCESS
    from zkevm_specs_tpu.witness.typing import Bytecode as BC

    addr = rand_address()
    balance_val = rand_word() if exists else 0
    code_hash = Account(address=addr, balance=balance_val).code_hash() if exists else 0

    bytecode = Bytecode().push(addr, n_bytes=32).balance().stop()
    h = bytecode.hash()
    rw = (
        RWDictionary(9)
        .stack_read(1, 1023, addr)
        .call_context_read(1, CallContextFieldTag.TxId, 1)
        .call_context_read(1, CallContextFieldTag.RwCounterEndOfReversion, 0)
        .call_context_read(1, CallContextFieldTag.IsPersistent, 1)
        .tx_access_list_account_write(1, addr, True, warm)
        .account_read(addr, AccountFieldTag.CodeHash, code_hash)
    )
    if exists:
        rw.account_read(addr, AccountFieldTag.Balance, balance_val)
    rw.stack_write(1, 1023, balance_val)
    n_rw = rw.rw_counter - 9

    dynamic = 0 if warm else EXTRA_GAS_COST_ACCOUNT_COLD_ACCESS
    gas = constant_gas_cost(Opcode.BALANCE) + dynamic
    tables = Tables(
        block_table=Block().table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
    )
    steps = [
        StepState(
            execution_state=ExecutionState.BALANCE, rw_counter=9, call_id=1,
            is_root=True, code_hash=h, program_counter=33, stack_pointer=1023,
            gas_left=gas,
        ),
        StepState(
            execution_state=ExecutionState.STOP, rw_counter=9 + n_rw, call_id=1,
            is_root=True, code_hash=h, program_counter=34, stack_pointer=1023,
            gas_left=0, reversible_write_counter=1,
        ),
    ]
    verify_steps(tables=tables, steps=steps)


@pytest.mark.parametrize("call_data,offset,is_root,cd_offset", [
    (bytes.fromhex("FF" * 32), 0x00, True, 0),
    (bytes.fromhex("FF" * 32), 0x1F, True, 0),
    (bytes.fromhex("a1bacf5488bfafc33bad736db41f06866eaeb35e1c1dd81dfc268357ec98563f"), 0x10, True, 0),
    (bytes.fromhex("a1bacf5488bfafc33bad736db41f06866eaeb35e1c1dd81dfc268357ec98563f"), 0x10, False, 0),
    (bytes.fromhex("a1bacf5488bfafc33bad736db41f06866eaeb35e1c1dd81dfc268357ec98563fab"), 0x10, False, 1),
])
def test_calldataload(call_data, offset, is_root, cd_offset):
    call_data_length = len(call_data)
    # expected: 32 bytes starting at cd_offset+offset, zero-padded, packed LE
    src_addr = offset + cd_offset
    src_end = call_data_length + cd_offset
    expected = 0
    for i in range(32):
        addr = src_addr + i
        b = call_data[addr - cd_offset] if addr < src_end else 0
        expected |= b << (8 * i)

    tx = Transaction(id=1, call_data=call_data if is_root else b"")
    bytecode = Bytecode().push(offset, n_bytes=32).calldataload().stop()
    h = bytecode.hash()
    rw = RWDictionary(9).stack_read(1, 1023, offset)
    if is_root:
        rw.call_context_read(1, CallContextFieldTag.TxId, 1)
        rw.call_context_read(1, CallContextFieldTag.CallDataLength, call_data_length)
    else:
        rw.call_context_read(1, CallContextFieldTag.CallerId, 2)
        rw.call_context_read(1, CallContextFieldTag.CallDataLength, call_data_length)
        rw.call_context_read(1, CallContextFieldTag.CallDataOffset, cd_offset)
        for i in range(32):
            addr = src_addr + i
            if addr < src_end:
                rw.memory_read(2, addr, call_data[addr - cd_offset])
    rw.stack_write(1, 1023, expected)
    n_rw = rw.rw_counter - 9

    gas = constant_gas_cost(Opcode.CALLDATALOAD)
    tables = Tables(
        block_table=Block().table_assignments(),
        tx_table=tx.table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
    )
    steps = [
        StepState(
            execution_state=ExecutionState.CALLDATALOAD, rw_counter=9, call_id=1,
            is_root=is_root, code_hash=h, program_counter=33, stack_pointer=1023,
            gas_left=gas,
        ),
        StepState(
            execution_state=ExecutionState.STOP, rw_counter=9 + n_rw, call_id=1,
            is_root=is_root, code_hash=h, program_counter=34, stack_pointer=1023,
            gas_left=0,
        ),
    ]
    verify_steps(tables=tables, steps=steps)
