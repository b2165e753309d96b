"""Full SSTORE/SLOAD conformance matrix: warm/cold x persistent/reverted x
the EIP-2200/3529 (value, value_prev, original) gas+refund lattice — the
depth of reference tests/evm/test_storage.py (which sweeps these cartesian
products with hand-computed reversion rw counters)."""
import itertools
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
    verify_steps,
)
from zkevm_specs_tpu.utils.param import (
    COLD_SLOAD_COST,
    SLOAD_GAS,
    SSTORE_CLEARS_SCHEDULE,
    SSTORE_RESET_GAS,
    SSTORE_SET_GAS,
    WARM_STORAGE_READ_COST,
)

ADDR, KEY = 0xCAFE, 0x1234_5678
REV_END = 500  # rw_counter_end_of_reversion for reverted frames


def sstore_gas(value, value_prev, original, warm):
    if value == value_prev or value_prev != original:
        gas = SLOAD_GAS
    elif original == 0:
        gas = SSTORE_SET_GAS
    else:
        gas = SSTORE_RESET_GAS
    return gas if warm else gas + COLD_SLOAD_COST


def sstore_refund(value, value_prev, original, refund_prev=10_000):
    refund = refund_prev
    if value != value_prev:
        if original == value_prev:
            if original != 0 and value == 0:
                refund += SSTORE_CLEARS_SCHEDULE
        else:
            if original != 0:
                if value_prev == 0:
                    refund -= SSTORE_CLEARS_SCHEDULE
                if value == 0:
                    refund += SSTORE_CLEARS_SCHEDULE
            if original == value:
                if original == 0:
                    refund += SSTORE_SET_GAS - SLOAD_GAS
                else:
                    refund += SSTORE_RESET_GAS - SLOAD_GAS
    return refund


def run_sstore(value, value_prev, original, warm, persistent, success=True,
               gas_override=None):
    refund_prev = 10_000
    refund = sstore_refund(value, value_prev, original, refund_prev)
    gas = sstore_gas(value, value_prev, original, warm) if gas_override is None else gas_override

    bytecode = (
        Bytecode().push(value, n_bytes=32).push(KEY, n_bytes=32).sstore().stop()
    )
    h = bytecode.hash()
    rev = None if persistent else REV_END
    rw = (
        RWDictionary(9)
        .call_context_read(1, CallContextFieldTag.TxId, 1)
        .call_context_read(1, CallContextFieldTag.IsStatic, 0)
        .call_context_read(1, CallContextFieldTag.RwCounterEndOfReversion,
                           0 if persistent else REV_END)
        .call_context_read(1, CallContextFieldTag.IsPersistent, int(persistent))
        .call_context_read(1, CallContextFieldTag.CalleeAddress, ADDR)
        .stack_read(1, 1022, KEY)
        .stack_read(1, 1023, value)
        # three reversible writes; reversion slots count down from REV_END
        .account_storage_write(ADDR, KEY, value, value_prev, 1, original,
                               rw_counter_of_reversion=None if persistent else rev - 0)
        .tx_access_list_account_storage_write(1, ADDR, KEY, True, warm,
                                              rw_counter_of_reversion=None if persistent else rev - 1)
        .tx_refund_write(1, refund, refund_prev,
                         rw_counter_of_reversion=None if persistent else rev - 2)
    )
    tables = Tables(
        block_table=Block().table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
    )
    steps = [
        StepState(
            execution_state=ExecutionState.SSTORE, rw_counter=9, call_id=1,
            is_root=True, code_hash=h, program_counter=66, stack_pointer=1022,
            gas_left=gas,
        ),
        StepState(
            execution_state=ExecutionState.STOP, rw_counter=19, call_id=1,
            is_root=True, code_hash=h, program_counter=67, stack_pointer=1024,
            gas_left=0, reversible_write_counter=3,
        ),
    ]
    verify_steps(tables=tables, steps=steps, success=success)


# every distinct shape of the (value, value_prev, original) lattice over
# {0, A, B}: fresh set, idempotent, clear, dirty re-set, dirty clear,
# restore-to-original (zero + nonzero), overwrite chains
VALUES = [0, 60, 200]
LATTICE = sorted(set(itertools.product(VALUES, VALUES, VALUES)))


@pytest.mark.parametrize("value,value_prev,original", LATTICE)
@pytest.mark.parametrize("warm", [True, False])
def test_sstore_matrix_persistent(value, value_prev, original, warm):
    run_sstore(value, value_prev, original, warm, persistent=True)


@pytest.mark.parametrize("value,value_prev,original", LATTICE)
@pytest.mark.parametrize("warm", [True, False])
def test_sstore_matrix_reverted(value, value_prev, original, warm):
    # full lattice under reversion (reference test_sstore.py runs every
    # value case x warm x persist; the reverted half exercises the
    # mirrored reversion writes' rw counters)
    run_sstore(value, value_prev, original, warm, persistent=False)


# word-width operands: the reference's TESTING_DATA uses 32-byte keys and
# values (test_sstore.py:26-51 bytes([...])); small ints leave the hi limbs
# of the Word columns untested
WIDE_A = int.from_bytes(bytes(range(0, 32)), "big")
WIDE_B = int.from_bytes(bytes(range(32, 0, -1)), "big")


@pytest.mark.parametrize("value,value_prev,original", [
    (WIDE_A, WIDE_A, WIDE_A),   # idempotent at full width
    (WIDE_A, 0, 0),             # fresh set of a wide word
    (WIDE_B, WIDE_A, WIDE_A),   # reset wide -> wide
    (0, WIDE_A, WIDE_A),        # clear a wide word (refund path)
    (WIDE_A, WIDE_B, WIDE_A),   # restore-to-original at full width
])
@pytest.mark.parametrize("warm,persistent", [(True, True), (False, False)])
def test_sstore_wide_words(value, value_prev, original, warm, persistent):
    run_sstore(value, value_prev, original, warm, persistent=persistent)


def test_sstore_wrong_gas_rejected():
    run_sstore(60, 0, 0, warm=True, persistent=True, success=False,
               gas_override=sstore_gas(60, 0, 0, True) + 1)


def test_sstore_wrong_refund_rejected():
    # refund computed for a clear, but witness claims no clear happened
    value, value_prev, original = 0, 200, 200
    refund_prev = 10_000
    gas = sstore_gas(value, value_prev, original, True)
    bytecode = (
        Bytecode().push(value, n_bytes=32).push(KEY, n_bytes=32).sstore().stop()
    )
    h = bytecode.hash()
    rw = (
        RWDictionary(9)
        .call_context_read(1, CallContextFieldTag.TxId, 1)
        .call_context_read(1, CallContextFieldTag.IsStatic, 0)
        .call_context_read(1, CallContextFieldTag.RwCounterEndOfReversion, 0)
        .call_context_read(1, CallContextFieldTag.IsPersistent, 1)
        .call_context_read(1, CallContextFieldTag.CalleeAddress, ADDR)
        .stack_read(1, 1022, KEY)
        .stack_read(1, 1023, value)
        .account_storage_write(ADDR, KEY, value, value_prev, 1, original)
        .tx_access_list_account_storage_write(1, ADDR, KEY, True, True)
        .tx_refund_write(1, refund_prev, refund_prev)  # wrong: drops refund
    )
    tables = Tables(
        block_table=Block().table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
    )
    steps = [
        StepState(
            execution_state=ExecutionState.SSTORE, rw_counter=9, call_id=1,
            is_root=True, code_hash=h, program_counter=66, stack_pointer=1022,
            gas_left=gas,
        ),
        StepState(
            execution_state=ExecutionState.STOP, rw_counter=19, call_id=1,
            is_root=True, code_hash=h, program_counter=67, stack_pointer=1024,
            gas_left=0, reversible_write_counter=3,
        ),
    ]
    verify_steps(tables=tables, steps=steps, success=False)


@pytest.mark.parametrize("warm,persistent", [
    (True, True), (False, True), (True, False), (False, False),
])
@pytest.mark.parametrize("value", [0xDEAD_BEEF, WIDE_A, 0])
def test_sload_matrix(warm, persistent, value):
    bytecode = Bytecode().push(KEY, n_bytes=32).sload().stop()
    h = bytecode.hash()
    rev = None if persistent else REV_END
    rw = (
        RWDictionary(9)
        .call_context_read(1, CallContextFieldTag.TxId, 1)
        .call_context_read(1, CallContextFieldTag.RwCounterEndOfReversion,
                           0 if persistent else REV_END)
        .call_context_read(1, CallContextFieldTag.IsPersistent, int(persistent))
        .call_context_read(1, CallContextFieldTag.CalleeAddress, ADDR)
        .stack_read(1, 1023, KEY)
        .account_storage_read(ADDR, KEY, value, 1, value)
        .stack_write(1, 1023, value)
        .tx_access_list_account_storage_write(
            1, ADDR, KEY, True, warm,
            rw_counter_of_reversion=None if persistent else rev)
    )
    gas = WARM_STORAGE_READ_COST if warm else COLD_SLOAD_COST
    tables = Tables(
        block_table=Block().table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
    )
    steps = [
        StepState(
            execution_state=ExecutionState.SLOAD, rw_counter=9, call_id=1,
            is_root=True, code_hash=h, program_counter=33, stack_pointer=1023,
            gas_left=gas,
        ),
        StepState(
            execution_state=ExecutionState.STOP, rw_counter=17, call_id=1,
            is_root=True, code_hash=h, program_counter=34, stack_pointer=1023,
            gas_left=0, reversible_write_counter=1,
        ),
    ]
    verify_steps(tables=tables, steps=steps)


def test_sload_wrong_value_rejected():
    value = 0xDEAD_BEEF
    bytecode = Bytecode().push(KEY, n_bytes=32).sload().stop()
    h = bytecode.hash()
    rw = (
        RWDictionary(9)
        .call_context_read(1, CallContextFieldTag.TxId, 1)
        .call_context_read(1, CallContextFieldTag.RwCounterEndOfReversion, 0)
        .call_context_read(1, CallContextFieldTag.IsPersistent, 1)
        .call_context_read(1, CallContextFieldTag.CalleeAddress, ADDR)
        .stack_read(1, 1023, KEY)
        .account_storage_read(ADDR, KEY, value, 1, value)
        .stack_write(1, 1023, value + 1)  # wrong: pushed value differs
        .tx_access_list_account_storage_write(1, ADDR, KEY, True, True)
    )
    tables = Tables(
        block_table=Block().table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
    )
    steps = [
        StepState(
            execution_state=ExecutionState.SLOAD, rw_counter=9, call_id=1,
            is_root=True, code_hash=h, program_counter=33, stack_pointer=1023,
            gas_left=WARM_STORAGE_READ_COST,
        ),
        StepState(
            execution_state=ExecutionState.STOP, rw_counter=17, call_id=1,
            is_root=True, code_hash=h, program_counter=34, stack_pointer=1023,
            gas_left=0, reversible_write_counter=1,
        ),
    ]
    verify_steps(tables=tables, steps=steps, success=False)
