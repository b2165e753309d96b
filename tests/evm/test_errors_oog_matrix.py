"""Parametrized OOG-error matrices at reference density.

Mirrors the *dimensions* (not the code) of the reference vector families:
tests/evm/test_error_oog_call.py (opcode x has_value x warm-access),
test_error_oog_sload_store.py (warm x slot-gas-class x EIP-2200 sentry),
test_error_oog_memory_copy.py (opcode x length x warm for EXTCODECOPY),
test_error_gas_uint_overflow.py (opcode x u64-overflowing operand), plus
boundary-gas sweeps for EXP / SHA3 / LOG / account access.  Every family
carries an enough-gas negative that must be rejected.
"""
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
    COLD_SLOAD_COST,
    GAS_COST_ACCOUNT_COLD_ACCESS,
    GAS_COST_CALL_WITH_VALUE,
    GAS_COST_CREATION_TX,
    GAS_COST_EXP_PER_BYTE,
    GAS_COST_FASTEST,
    GAS_COST_LOG,
    GAS_COST_LOGDATA,
    GAS_COST_SHA3,
    GAS_COST_SLOW,
    GAS_COST_SSTORE_SENTRY_EIP2200,
    GAS_COST_WARM_ACCESS,
    SLOAD_GAS,
    SSTORE_RESET_GAS,
    SSTORE_SET_GAS,
    WARM_STORAGE_READ_COST,
)
from common import rand_address


def mem_expansion_gas(offset: int, size: int, curr_words: int = 0) -> int:
    """EIP-150 memory expansion cost from an all-zero memory."""
    if size == 0:
        return 0
    next_words = max(curr_words, (offset + size + 31) // 32)
    return (3 * (next_words - curr_words)
            + (next_words * next_words // 512 - curr_words * curr_words // 512))


def run_error(state, bytecode, rw, pc, sp, gas_left, rwc_delta,
              aux_data=None, success=True):
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
                  stack_pointer=sp, gas_left=gas_left, aux_data=aux_data),
        StepState(execution_state=ExecutionState.EndTx,
                  rw_counter=24 + rwc_delta, call_id=1),
    ]
    verify_steps(tables=tables, steps=steps, success=success)


# --------------------------------------------------------------------------
# ErrorOutOfGasSloadSstore — SLOAD: warm x gas-deficit sweep
# --------------------------------------------------------------------------

def _sload_rw(callee, key, is_warm):
    return (
        RWDictionary(24)
        .stack_read(1, 1023, key)
        .call_context_read(1, CallContextFieldTag.TxId, 1)
        .call_context_read(1, CallContextFieldTag.CalleeAddress, callee)
        .tx_access_list_account_storage_read(1, callee, key, is_warm)
        .call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    )


@pytest.mark.parametrize("is_warm", [True, False])
@pytest.mark.parametrize("deficit", [1, 50])
def test_oog_sload_warm_cold(is_warm, deficit):
    cost = WARM_STORAGE_READ_COST if is_warm else COLD_SLOAD_COST
    callee, key = rand_address(), 7
    bytecode = Bytecode().push(key, n_bytes=32).sload().stop()
    run_error(ExecutionState.ErrorOutOfGasSloadSstore, bytecode,
              _sload_rw(callee, key, is_warm), 33, 1023, cost - deficit, 5)


@pytest.mark.parametrize("is_warm", [True, False])
def test_oog_sload_exact_gas_rejected(is_warm):
    cost = WARM_STORAGE_READ_COST if is_warm else COLD_SLOAD_COST
    callee, key = rand_address(), 7
    bytecode = Bytecode().push(key, n_bytes=32).sload().stop()
    run_error(ExecutionState.ErrorOutOfGasSloadSstore, bytecode,
              _sload_rw(callee, key, is_warm), 33, 1023, cost, 5,
              success=False)


# --------------------------------------------------------------------------
# ErrorOutOfGasSloadSstore — SSTORE: slot-gas-class x warm x sentry
# (reference test_error_oog_sload_store.py gen_testing_data)
# --------------------------------------------------------------------------

def _sstore_slot_gas(original, prev, value):
    if value == prev:
        return SLOAD_GAS
    if prev == original:
        return SSTORE_SET_GAS if original == 0 else SSTORE_RESET_GAS
    return SLOAD_GAS


def _sstore_rw(callee, key, value, prev, original, is_warm):
    return (
        RWDictionary(24)
        .stack_read(1, 1022, key)
        .call_context_read(1, CallContextFieldTag.TxId, 1)
        .call_context_read(1, CallContextFieldTag.CalleeAddress, callee)
        .tx_access_list_account_storage_read(1, callee, key, is_warm)
        .stack_read(1, 1023, value)
        .account_storage_read(callee, key, prev, 1, original)
        .call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    )


SSTORE_CASES = [
    # (original, prev, value, is_warm) — one per slot-gas class, both phases
    (0, 0, 1, True),    # clean set: 20000
    (0, 0, 1, False),   # clean set, cold: 22100
    (5, 5, 6, True),    # reset: 2900
    (5, 5, 6, False),   # reset, cold: 5000
    (5, 5, 0, True),    # reset-to-zero (still 2900 here, refund elsewhere)
    (5, 6, 7, True),    # dirty slot: 100
    (5, 6, 7, False),   # dirty slot, cold: 2200
    (0, 0, 0, True),    # no-op write: 100
]


@pytest.mark.parametrize("original,prev,value,is_warm", SSTORE_CASES)
def test_oog_sstore_insufficient_slot_gas(original, prev, value, is_warm):
    cost = _sstore_slot_gas(original, prev, value)
    if not is_warm:
        cost += COLD_SLOAD_COST
    callee, key = rand_address(), 9
    bytecode = Bytecode().push(value, n_bytes=32).push(key, n_bytes=32).sstore().stop()
    run_error(ExecutionState.ErrorOutOfGasSloadSstore, bytecode,
              _sstore_rw(callee, key, value, prev, original, is_warm),
              66, 1022, cost - 1, 7, aux_data=original)


@pytest.mark.parametrize("gas_left", [GAS_COST_SSTORE_SENTRY_EIP2200,
                                      GAS_COST_SSTORE_SENTRY_EIP2200 - 1])
def test_oog_sstore_sentry(gas_left):
    # EIP-2200 sentry: gas_left <= 2300 errors even when the slot gas (a
    # no-op write, 100) would have been affordable
    callee, key = rand_address(), 9
    bytecode = Bytecode().push(0, n_bytes=32).push(key, n_bytes=32).sstore().stop()
    run_error(ExecutionState.ErrorOutOfGasSloadSstore, bytecode,
              _sstore_rw(callee, key, 0, 0, 0, True),
              66, 1022, gas_left, 7, aux_data=0)


def test_oog_sstore_enough_gas_rejected():
    callee, key = rand_address(), 9
    bytecode = Bytecode().push(1, n_bytes=32).push(key, n_bytes=32).sstore().stop()
    # 25000 > 20000 set cost and > sentry: no error condition holds
    run_error(ExecutionState.ErrorOutOfGasSloadSstore, bytecode,
              _sstore_rw(callee, key, 1, 0, 0, True),
              66, 1022, 25000, 7, aux_data=0, success=False)


# --------------------------------------------------------------------------
# ErrorOutOfGasCall — opcode x has_value x warm-access
# (reference test_error_oog_call.py TESTING_DATA)
# --------------------------------------------------------------------------

CALL_OPS = [
    (Opcode.CALL, True), (Opcode.CALL, False),
    (Opcode.CALLCODE, True), (Opcode.CALLCODE, False),
    (Opcode.DELEGATECALL, False), (Opcode.STATICCALL, False),
]


def _callop_vector(opcode, has_value, is_warm):
    addr = rand_address()
    value = 3 if has_value else 0
    takes_value = opcode in (Opcode.CALL, Opcode.CALLCODE)
    args = ([0, addr, value, 0, 0, 0, 0] if takes_value
            else [0, addr, 0, 0, 0, 0])
    n = len(args)
    bytecode = getattr(Bytecode(), opcode.name.lower())(*args).stop()
    sp = 1024 - n
    rw = RWDictionary(24).call_context_read(1, CallContextFieldTag.TxId, 1)
    for i, v in enumerate(args):
        rw.stack_read(1, sp + i, v)
    rw.stack_write(1, 1023, 0)
    rw.account_read(addr, AccountFieldTag.CodeHash, 0)
    rw.tx_access_list_account_read(1, addr, is_warm)
    rw.call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    cost = (GAS_COST_WARM_ACCESS if is_warm else GAS_COST_ACCOUNT_COLD_ACCESS)
    if has_value:
        cost += GAS_COST_CALL_WITH_VALUE
    return bytecode, rw, 33 * n, sp, cost, n + 5


@pytest.mark.parametrize("opcode,has_value", CALL_OPS)
@pytest.mark.parametrize("is_warm", [True, False])
def test_oog_call_matrix(opcode, has_value, is_warm):
    bytecode, rw, pc, sp, cost, delta = _callop_vector(opcode, has_value, is_warm)
    run_error(ExecutionState.ErrorOutOfGasCall, bytecode, rw, pc, sp,
              cost - 1, delta)


@pytest.mark.parametrize("opcode,has_value", [(Opcode.CALL, True),
                                              (Opcode.STATICCALL, False)])
def test_oog_call_exact_gas_rejected(opcode, has_value):
    bytecode, rw, pc, sp, cost, delta = _callop_vector(opcode, has_value, False)
    run_error(ExecutionState.ErrorOutOfGasCall, bytecode, rw, pc, sp,
              cost, delta, success=False)


# --------------------------------------------------------------------------
# ErrorOutOfGasEXP / ErrorOutOfGasSHA3 — dynamic-gas boundary sweeps
# --------------------------------------------------------------------------

@pytest.mark.parametrize("exponent", [0xFF, 1 << 63, 1 << 127, (1 << 256) - 1])
def test_oog_exp(exponent):
    byte_size = (exponent.bit_length() + 7) // 8
    cost = GAS_COST_SLOW + GAS_COST_EXP_PER_BYTE * byte_size
    bytecode = Bytecode().exp(2, exponent).stop()
    rw = (
        RWDictionary(24)
        .stack_read(1, 1023, exponent)
        .call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    )
    run_error(ExecutionState.ErrorOutOfGasEXP, bytecode, rw, 66, 1022,
              cost - 1, 2)


def test_oog_exp_enough_gas_rejected():
    exponent = 0xFF
    cost = GAS_COST_SLOW + GAS_COST_EXP_PER_BYTE
    bytecode = Bytecode().exp(2, exponent).stop()
    rw = (
        RWDictionary(24)
        .stack_read(1, 1023, exponent)
        .call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    )
    run_error(ExecutionState.ErrorOutOfGasEXP, bytecode, rw, 66, 1022,
              cost, 2, success=False)


@pytest.mark.parametrize("offset,size", [(0, 32), (0, 256), (0, 0x8000),
                                         (0x100, 0x100)])
def test_oog_sha3(offset, size):
    words = (size + 31) // 32
    cost = (GAS_COST_SHA3 + 6 * words + mem_expansion_gas(offset, size))
    bytecode = (Bytecode().push(size, n_bytes=32).push(offset, n_bytes=32)
                .sha3().stop())
    rw = (
        RWDictionary(24)
        .stack_read(1, 1022, offset)
        .stack_read(1, 1023, size)
        .call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    )
    run_error(ExecutionState.ErrorOutOfGasSHA3, bytecode, rw, 66, 1022,
              cost - 1, 3)


def test_oog_sha3_enough_gas_rejected():
    cost = GAS_COST_SHA3 + 6 + mem_expansion_gas(0, 32)
    bytecode = Bytecode().push(32, n_bytes=32).push(0, n_bytes=32).sha3().stop()
    rw = (
        RWDictionary(24)
        .stack_read(1, 1022, 0)
        .stack_read(1, 1023, 32)
        .call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    )
    run_error(ExecutionState.ErrorOutOfGasSHA3, bytecode, rw, 66, 1022,
              cost, 3, success=False)


# --------------------------------------------------------------------------
# ErrorOutOfGasMemoryCopy — opcode x length (x warm for EXTCODECOPY)
# --------------------------------------------------------------------------

@pytest.mark.parametrize("opcode", [Opcode.CALLDATACOPY, Opcode.CODECOPY,
                                    Opcode.RETURNDATACOPY])
@pytest.mark.parametrize("dest,length", [(0, 0x40), (0x20, 0x2000)])
def test_oog_memory_copy_matrix(opcode, dest, length):
    words = (length + 31) // 32
    cost = (GAS_COST_FASTEST + 3 * words + mem_expansion_gas(dest, length))
    bytecode = Bytecode()
    getattr(bytecode, opcode.name.lower())(dest, 0, length)
    bytecode.stop()
    rw = (
        RWDictionary(24)
        .stack_read(1, 1021, dest)
        .stack_read(1, 1023, length)
        .call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    )
    run_error(ExecutionState.ErrorOutOfGasMemoryCopy, bytecode, rw,
              99, 1021, cost - 1, 3)


@pytest.mark.parametrize("is_warm", [True, False])
def test_oog_memory_copy_extcodecopy(is_warm):
    addr, dest, length = rand_address(), 0, 0x40
    words = (length + 31) // 32
    constant = GAS_COST_WARM_ACCESS if is_warm else GAS_COST_ACCOUNT_COLD_ACCESS
    cost = constant + 3 * words + mem_expansion_gas(dest, length)
    bytecode = Bytecode().extcodecopy(addr, dest, 0, length).stop()
    rw = (
        RWDictionary(24)
        .stack_read(1, 1020, addr)
        .stack_read(1, 1021, dest)
        .stack_read(1, 1023, length)
        .call_context_read(1, CallContextFieldTag.TxId, 1)
        .tx_access_list_account_read(1, addr, is_warm)
        .call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    )
    run_error(ExecutionState.ErrorOutOfGasMemoryCopy, bytecode, rw,
              132, 1020, cost - 1, 6)


def test_oog_memory_copy_enough_gas_rejected():
    length = 0x40
    cost = GAS_COST_FASTEST + 3 * 2 + mem_expansion_gas(0, length)
    bytecode = Bytecode().calldatacopy(0, 0, length).stop()
    rw = (
        RWDictionary(24)
        .stack_read(1, 1021, 0)
        .stack_read(1, 1023, length)
        .call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    )
    run_error(ExecutionState.ErrorOutOfGasMemoryCopy, bytecode, rw,
              99, 1021, cost, 3, success=False)


# --------------------------------------------------------------------------
# ErrorOutOfGasLOG — n_topics x boundary gas
# --------------------------------------------------------------------------

@pytest.mark.parametrize("n_topics", [0, 1, 2, 3, 4])
def test_oog_log_all_topics(n_topics):
    mstart, msize = 0, 100
    cost = (GAS_COST_LOG + GAS_COST_LOG * n_topics + GAS_COST_LOGDATA * msize
            + mem_expansion_gas(mstart, msize))
    opcode = Opcode(int(Opcode.LOG0) + n_topics)
    bytecode = Bytecode().push(msize, n_bytes=32).push(mstart, n_bytes=32)
    getattr(bytecode, opcode.name.lower())()
    bytecode.stop()
    rw = (
        RWDictionary(24)
        .stack_read(1, 1022, mstart)
        .stack_read(1, 1023, msize)
        .call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    )
    run_error(ExecutionState.ErrorOutOfGasLOG, bytecode, rw, 66, 1022,
              cost - 1, 3)


def test_oog_log_enough_gas_rejected():
    mstart, msize = 0, 100
    cost = (GAS_COST_LOG * 2 + GAS_COST_LOGDATA * msize
            + mem_expansion_gas(mstart, msize))
    bytecode = (Bytecode().push(msize, n_bytes=32).push(mstart, n_bytes=32)
                .log1().stop())
    rw = (
        RWDictionary(24)
        .stack_read(1, 1022, mstart)
        .stack_read(1, 1023, msize)
        .call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    )
    run_error(ExecutionState.ErrorOutOfGasLOG, bytecode, rw, 66, 1022,
              cost, 3, success=False)


# --------------------------------------------------------------------------
# ErrorOutOfGasAccountAccess — warm variant (cold is in test_errors_oog.py)
# --------------------------------------------------------------------------

@pytest.mark.parametrize("opcode", [Opcode.BALANCE, Opcode.EXTCODESIZE,
                                    Opcode.EXTCODEHASH])
def test_oog_account_access_warm(opcode):
    addr = rand_address()
    bytecode = Bytecode().push(addr, n_bytes=32)
    getattr(bytecode, opcode.name.lower())()
    bytecode.stop()
    rw = (
        RWDictionary(24)
        .stack_read(1, 1023, addr)
        .call_context_read(1, CallContextFieldTag.TxId, 1)
        .tx_access_list_account_read(1, addr, True)
        .call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    )
    run_error(ExecutionState.ErrorOutOfGasAccountAccess, bytecode, rw,
              33, 1023, GAS_COST_WARM_ACCESS - 1, 4)


# --------------------------------------------------------------------------
# ErrorOutOfGasCREATE — CREATE2 root variant
# --------------------------------------------------------------------------

def test_oog_create2_root():
    value, offset, size, salt = 0, 0, 0, 0xDEAD
    bytecode = (
        Bytecode().push(salt, n_bytes=32).push(size, n_bytes=32)
        .push(offset, n_bytes=32).push(value, n_bytes=32).create2().stop()
    )
    rw = (
        RWDictionary(24)
        .stack_read(1, 1021, offset)
        .stack_read(1, 1022, size)
        .call_context_read(1, CallContextFieldTag.IsRoot, 1)
        .call_context_read(1, CallContextFieldTag.TxId, 1)
        .call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    )
    # creation-tx intrinsic gas 53000 > 100 supplied
    assert GAS_COST_CREATION_TX == 53000
    run_error(ExecutionState.ErrorOutOfGasCREATE, bytecode, rw,
              132, 1020, 100, 5)


# --------------------------------------------------------------------------
# ErrorGasUintOverflow — opcode x u64-overflowing memory operand
# --------------------------------------------------------------------------

U64_OVER = 1 << 64


def _overflow_ctx(rw):
    return (rw
            .call_context_read(1, CallContextFieldTag.CallDataLength, 0)
            .call_context_read(1, CallContextFieldTag.TxId, 1)
            .call_context_read(1, CallContextFieldTag.IsRoot, 1))


def test_gas_uint_overflow_mstore():
    offset = U64_OVER
    bytecode = (Bytecode().push(1, n_bytes=32).push(offset, n_bytes=32)
                .mstore().stop())
    rw = _overflow_ctx(RWDictionary(24))
    rw.stack_read(1, 1022, offset).stack_read(1, 1023, 1)
    rw.call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    run_error(ExecutionState.ErrorGasUintOverflow, bytecode, rw,
              66, 1022, 100, 6)


@pytest.mark.parametrize("opcode", [Opcode.SHA3, Opcode.RETURN, Opcode.REVERT,
                                    Opcode.LOG1])
def test_gas_uint_overflow_offset_size_ops(opcode):
    # (offset, size) pairs where offset + size overflows u64 (size != 0)
    offset, size = U64_OVER, 1
    bytecode = Bytecode().push(size, n_bytes=32).push(offset, n_bytes=32)
    getattr(bytecode, opcode.name.lower().rstrip("_")
            + ("_" if opcode == Opcode.RETURN else ""))()
    bytecode.stop()
    rw = _overflow_ctx(RWDictionary(24))
    rw.stack_read(1, 1022, offset).stack_read(1, 1023, size)
    rw.call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    run_error(ExecutionState.ErrorGasUintOverflow, bytecode, rw,
              66, 1022, 100, 6)


def test_gas_uint_overflow_in_range_rejected():
    # a well-in-range MLOAD offset must not satisfy the overflow gadget
    offset = 32
    bytecode = Bytecode().push(offset, n_bytes=32).mload().stop()
    rw = _overflow_ctx(RWDictionary(24))
    rw.stack_read(1, 1023, offset)
    rw.call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    run_error(ExecutionState.ErrorGasUintOverflow, bytecode, rw,
              33, 1023, 100, 5, success=False)


# --------------------------------------------------------------------------
# ErrorGasUintOverflow — the reference's full opcode matrix
# (test_error_gas_uint_overflow.py: every memory-sizing opcode x an
# overflowing offset and/or length operand)
# --------------------------------------------------------------------------

# stack values in POP order; OV in the slot the memory-size calc consumes
_UINT_OVERFLOW_CASES = [
    (Opcode.SHA3, [U64_OVER, 1]), (Opcode.SHA3, [0, U64_OVER]),
    (Opcode.RETURN, [U64_OVER, 1]), (Opcode.RETURN, [0, U64_OVER]),
    (Opcode.REVERT, [U64_OVER, 1]), (Opcode.REVERT, [0, U64_OVER]),
    (Opcode.LOG0, [U64_OVER, 1]), (Opcode.LOG0, [0, U64_OVER]),
    (Opcode.LOG1, [U64_OVER, 1]),
    (Opcode.LOG2, [0, U64_OVER]),
    (Opcode.LOG3, [U64_OVER, 1]),
    (Opcode.LOG4, [0, U64_OVER]),
    (Opcode.CALLDATACOPY, [0, U64_OVER, 1]),
    (Opcode.CALLDATACOPY, [0, 0, U64_OVER]),
    (Opcode.RETURNDATACOPY, [0, U64_OVER, 1]),
    (Opcode.RETURNDATACOPY, [0, 0, U64_OVER]),
    (Opcode.CODECOPY, [0, U64_OVER, 1]),
    (Opcode.CODECOPY, [0, 0, U64_OVER]),
    (Opcode.EXTCODECOPY, [0xAA, 0, U64_OVER, 1]),
    (Opcode.EXTCODECOPY, [0xAA, 0, 0, U64_OVER]),
    (Opcode.MLOAD, [U64_OVER]),
    (Opcode.MSTORE, [U64_OVER, 1]),
    (Opcode.MSTORE8, [U64_OVER, 1]),
    (Opcode.CREATE, [0, U64_OVER, 1]),
    (Opcode.CREATE, [0, 0, U64_OVER]),
    (Opcode.CREATE2, [0, U64_OVER, 1, 0x5A]),
    (Opcode.CALL, [100, 0xAA, 0, U64_OVER, 1, 0, 32]),
    (Opcode.CALL, [100, 0xAA, 0, 0, 32, U64_OVER, 1]),
    (Opcode.CALLCODE, [100, 0xAA, 0, U64_OVER, 1, 0, 32]),
    (Opcode.DELEGATECALL, [100, 0xAA, U64_OVER, 1, 0, 32]),
    (Opcode.DELEGATECALL, [100, 0xAA, 0, 32, U64_OVER, 1]),
    (Opcode.STATICCALL, [100, 0xAA, U64_OVER, 1, 0, 32]),
    (Opcode.STATICCALL, [100, 0xAA, 0, 32, U64_OVER, 1]),
]


@pytest.mark.parametrize(
    "opcode,stack_vals", _UINT_OVERFLOW_CASES,
    ids=[f"{op.name}-{i}" for i, (op, _) in enumerate(_UINT_OVERFLOW_CASES)])
def test_gas_uint_overflow_full_matrix(opcode, stack_vals):
    n = len(stack_vals)
    bytecode = Bytecode()
    for v in reversed(stack_vals):
        bytecode.push(v, n_bytes=32)
    getattr(bytecode, opcode.name.lower().rstrip("_")
            + ("_" if opcode in (Opcode.RETURN, Opcode.REVERT) else ""))()
    bytecode.stop()
    sp = 1024 - n
    rw = _overflow_ctx(RWDictionary(24))
    for i, v in enumerate(stack_vals):
        rw.stack_read(1, sp + i, v)
    rw.call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    run_error(ExecutionState.ErrorGasUintOverflow, bytecode, rw,
              33 * n, sp, 100, n + 4)


# --------------------------------------------------------------------------
# ErrorOutOfGasCall with memory-expansion regions (reference
# test_error_oog_call.py Stack(cd_offset=64, cd_length=320, rd_length=32))
# --------------------------------------------------------------------------

def _callop_vector_regions(opcode, has_value, is_warm, cd, rd):
    addr = rand_address()
    value = 3 if has_value else 0
    takes_value = opcode in (Opcode.CALL, Opcode.CALLCODE)
    cd_off, cd_len = cd
    rd_off, rd_len = rd
    args = ([0, addr, value, cd_off, cd_len, rd_off, rd_len] if takes_value
            else [0, addr, cd_off, cd_len, rd_off, rd_len])
    n = len(args)
    bytecode = getattr(Bytecode(), opcode.name.lower())(*args).stop()
    sp = 1024 - n
    rw = RWDictionary(24).call_context_read(1, CallContextFieldTag.TxId, 1)
    for i, v in enumerate(args):
        rw.stack_read(1, sp + i, v)
    rw.stack_write(1, 1023, 0)
    rw.account_read(addr, AccountFieldTag.CodeHash, 0)
    rw.tx_access_list_account_read(1, addr, is_warm)
    rw.call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    nm = max((cd_off + cd_len + 31) // 32 if cd_len else 0,
             (rd_off + rd_len + 31) // 32 if rd_len else 0)
    mem = 3 * nm + nm * nm // 512
    cost = (GAS_COST_WARM_ACCESS if is_warm else GAS_COST_ACCOUNT_COLD_ACCESS)
    if has_value:
        cost += GAS_COST_CALL_WITH_VALUE
    cost += mem
    return bytecode, rw, 33 * n, sp, cost, n + 5


@pytest.mark.parametrize("opcode,has_value", CALL_OPS)
@pytest.mark.parametrize("is_warm", [True, False])
@pytest.mark.parametrize("cd,rd", [
    ((64, 320), (0, 32)),      # the reference's region shape
    ((0, 32), (64, 320)),      # rd-dominated expansion
    ((0xFF00, 64), (0, 0)),    # deep quadratic expansion, no rd region
])
def test_oog_call_with_expansion(opcode, has_value, is_warm, cd, rd):
    bytecode, rw, pc, sp, cost, delta = _callop_vector_regions(
        opcode, has_value, is_warm, cd, rd)
    run_error(ExecutionState.ErrorOutOfGasCall, bytecode, rw, pc, sp,
              cost - 1, delta)


@pytest.mark.parametrize("opcode,has_value", [(Opcode.CALL, True),
                                              (Opcode.DELEGATECALL, False)])
def test_oog_call_with_expansion_enough_gas_rejected(opcode, has_value):
    bytecode, rw, pc, sp, cost, delta = _callop_vector_regions(
        opcode, has_value, True, (64, 320), (0, 32))
    run_error(ExecutionState.ErrorOutOfGasCall, bytecode, rw, pc, sp,
              cost, delta, success=False)
