"""BeginTx / EndTx / EndBlock conformance vectors (mirrors the scenarios of
reference tests/evm/test_begin_tx.py, test_end_tx.py, test_end_block.py)."""
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from zkevm_specs_tpu.evm import (
    AccessTuple,
    Account,
    Block,
    Bytecode,
    CallContextFieldTag,
    CopyCircuit,
    CopyDataTypeTag,
    ExecutionState,
    KeccakCircuit,
    RWDictionary,
    StepState,
    Tables,
    Transaction,
    copy_circuit_to_table,
    verify_steps,
)
from zkevm_specs_tpu.tables.schemas import AccountFieldTag, TxReceiptFieldTag
from zkevm_specs_tpu.witness.typing import EMPTY_CODE_HASH
from zkevm_specs_tpu.witness.rlp import rlp_encode
from zkevm_specs_tpu.ops.keccak import keccak256
from common import rand_address, rand_range, rand_word, rand_fq

RETURN_BYTECODE = Bytecode().return_(0, 0)
REVERT_BYTECODE = Bytecode().revert(0, 0)

CALLEE_ADDRESS = 0xFF
CALL_ID = 1


def callee_with(code=None):
    return Account(address=CALLEE_ADDRESS, code=code)


TESTING_DATA = (
    (Transaction(caller_address=0xFE, callee_address=CALLEE_ADDRESS, value=int(1e18)), None, True),
    (Transaction(caller_address=0xFE, callee_address=CALLEE_ADDRESS, value=int(1e18)), RETURN_BYTECODE, True),
    (Transaction(caller_address=0xFE, callee_address=CALLEE_ADDRESS, value=int(1e18)), REVERT_BYTECODE, False),
    (Transaction(caller_address=rand_address(), callee_address=CALLEE_ADDRESS, value=rand_range(1e20)), RETURN_BYTECODE, True),
    (Transaction(caller_address=rand_address(), callee_address=CALLEE_ADDRESS, gas_price=rand_range(42857142857143)), RETURN_BYTECODE, True),
    (Transaction(caller_address=0xFE, callee_address=CALLEE_ADDRESS, gas=21080, call_data=bytes([1, 2, 3, 4, 0, 0, 0, 0])), RETURN_BYTECODE, True),
    # wrong nonce -> invalid tx is skipped
    (Transaction(caller_address=0xFE, callee_address=CALLEE_ADDRESS, value=int(1e18), nonce=100, invalid_tx=1), None, True),
    # insufficient balance -> invalid tx is skipped
    (Transaction(caller_address=0xFE, callee_address=CALLEE_ADDRESS, gas=21080, value=int(1e21), invalid_tx=1), REVERT_BYTECODE, True),
    # sufficient intrinsic gas with access list
    (Transaction(caller_address=0xFE, callee_address=CALLEE_ADDRESS, gas=21080 + 2400 + 1900 * 2, value=int(1e17), invalid_tx=0, access_list=[AccessTuple(address=0xFE, storage_keys=[rand_word(), rand_word()])]), None, True),
    # insufficient intrinsic gas
    (Transaction(caller_address=0xFE, callee_address=CALLEE_ADDRESS, gas=21080, value=int(1e17), invalid_tx=1, access_list=[AccessTuple(address=0xFE, storage_keys=[rand_word(), rand_word()])]), None, True),
    # create tx without initcode
    (Transaction(caller_address=0xFE, callee_address=None, gas=53000), None, True),
    (Transaction(caller_address=0xFE, callee_address=None, gas=53000, value=1), None, True),
)


@pytest.mark.parametrize("tx, callee_code, is_success", TESTING_DATA)
def test_begin_tx(tx: Transaction, callee_code, is_success: bool):
    randomness_keccak = rand_fq()
    block = Block()
    callee = callee_with(callee_code)

    is_tx_valid = 1 - tx.invalid_tx
    is_tx_create = tx.callee_address is None
    rw_counter_end_of_reversion = 24
    caller_nonce_prev = 0
    caller_balance_prev = int(1e20)
    callee_balance_prev = callee.balance
    caller_balance = (
        caller_balance_prev - (tx.value + tx.gas * tx.gas_price)
        if is_tx_valid
        else caller_balance_prev
    )
    callee_balance = callee_balance_prev + tx.value if is_tx_valid else callee_balance_prev

    calldata_hash = int.from_bytes(keccak256(tx.call_data), "big")
    bytecode_hash = calldata_hash if is_tx_create else callee.code_hash()

    contract_address = int.from_bytes(
        keccak256(rlp_encode([tx.caller_address.to_bytes(20, "big"), tx.nonce]))[-20:], "big"
    )
    callee_address = contract_address if is_tx_create else tx.callee_address

    rw = (
        RWDictionary(1)
        .call_context_read(1, CallContextFieldTag.TxId, tx.id)
        .call_context_read(1, CallContextFieldTag.RwCounterEndOfReversion, 0 if is_success else rw_counter_end_of_reversion)
        .call_context_read(1, CallContextFieldTag.IsPersistent, is_success)
        .call_context_read(1, CallContextFieldTag.IsSuccess, is_success)
        .account_write(tx.caller_address, AccountFieldTag.Nonce, caller_nonce_prev + is_tx_valid, caller_nonce_prev)
        .tx_access_list_account_write(tx.id, block.coinbase, True, False)
        .tx_access_list_account_write(tx.id, tx.caller_address, True, False)
        .tx_access_list_account_write(tx.id, callee_address, True, False)
        .account_write(tx.caller_address, AccountFieldTag.Balance, caller_balance, caller_balance_prev, rw_counter_of_reversion=None if is_success else rw_counter_end_of_reversion)
        .account_write(callee_address, AccountFieldTag.Balance, callee_balance, callee_balance_prev, rw_counter_of_reversion=None if is_success else rw_counter_end_of_reversion - 1)
    )

    is_create_tx_with_calldata = is_tx_create and len(tx.call_data) > 0
    is_regular_tx_and_callee_is_contract = (
        not is_tx_create and callee.code_hash() != EMPTY_CODE_HASH
    )

    copy_table = []
    keccak_rows = []
    if not is_tx_create:
        rw.account_read(tx.callee_address, AccountFieldTag.CodeHash, bytecode_hash)
    elif len(tx.call_data) > 0:
        src = {i: tx.call_data[i] for i in range(len(tx.call_data))}
        cc1 = CopyCircuit().copy(
            randomness_keccak, rw, 1, CopyDataTypeTag.TxCalldata, CALL_ID,
            CopyDataTypeTag.RlcAcc, 0, len(tx.call_data), 0, len(tx.call_data), src,
        )
        bc = Bytecode(bytearray(tx.call_data))
        src_bc = {i: (bc.code[i], bc.is_code[i]) for i in range(len(bc.code))}
        cc2 = CopyCircuit().copy(
            randomness_keccak, rw, 1, CopyDataTypeTag.TxCalldata, calldata_hash,
            CopyDataTypeTag.Bytecode, 0, len(tx.call_data), 0, len(tx.call_data), src_bc,
        )
        copy_table = copy_circuit_to_table(cc1) + copy_circuit_to_table(cc2)
        keccak_rows = KeccakCircuit().add(tx.call_data, randomness_keccak).rows

    if (is_create_tx_with_calldata or is_regular_tx_and_callee_is_contract) and is_tx_valid == 1:
        (
            rw.call_context_read(1, CallContextFieldTag.Depth, 1)
            .call_context_read(1, CallContextFieldTag.CallerAddress, tx.caller_address)
            .call_context_read(1, CallContextFieldTag.CalleeAddress, callee_address)
            .call_context_read(1, CallContextFieldTag.CallDataOffset, 0)
            .call_context_read(1, CallContextFieldTag.CallDataLength, len(tx.call_data))
            .call_context_read(1, CallContextFieldTag.Value, tx.value)
            .call_context_read(1, CallContextFieldTag.IsStatic, 0)
            .call_context_read(1, CallContextFieldTag.LastCalleeId, 0)
            .call_context_read(1, CallContextFieldTag.LastCalleeReturnDataOffset, 0)
            .call_context_read(1, CallContextFieldTag.LastCalleeReturnDataLength, 0)
            .call_context_read(1, CallContextFieldTag.IsRoot, 1)
            .call_context_read(1, CallContextFieldTag.IsCreate, int(is_tx_create))
            .call_context_read(1, CallContextFieldTag.CodeHash, bytecode_hash)
        )

    tables = Tables(
        block_table=block.table_assignments(),
        tx_table=tx.table_assignments(),
        bytecode_table=callee.code.table_assignments(),
        rw_table=rw.rws,
        copy_table=copy_table,
        keccak_table=keccak_rows,
    )

    verify_steps(
        tables=tables,
        steps=[
            StepState(execution_state=ExecutionState.BeginTx, rw_counter=1),
            StepState(
                execution_state=ExecutionState.EndTx
                if callee.code_hash() == EMPTY_CODE_HASH or is_tx_valid == 0
                else ExecutionState.PUSH,
                rw_counter=rw.rw_counter,
                call_id=CALL_ID,
                is_root=True,
                is_create=is_tx_create,
                code_hash=bytecode_hash,
                program_counter=0,
                stack_pointer=1024,
                gas_left=0,
                reversible_write_counter=2,
            ),
        ],
        begin_with_first_step=True,
    )


@pytest.mark.parametrize("is_first_tx,is_persistent,refund,gas_left", [
    (True, True, 0, 0),
    (False, True, 100, 10),
    (True, False, 0, 0),
    # capped refund: claimed 38400 > gas_used/5 (reference test_end_tx.py
    # 'Tx with capped refund')
    (False, True, 38400, 3952),
    # non-capped nonzero refund ('Tx with non-capped refund')
    (True, True, 1000, 994),
    # capped refund inside a reverted frame
    (False, False, 38400, 0),
])
def test_end_tx(is_first_tx, is_persistent, refund, gas_left):
    from zkevm_specs_tpu.utils.param import MAX_REFUND_QUOTIENT_OF_GAS_USED

    block = Block()
    tx = Transaction(id=1 if is_first_tx else 2, caller_address=0xFE, callee_address=CALLEE_ADDRESS)

    gas_used = tx.gas - gas_left
    max_refund = gas_used // MAX_REFUND_QUOTIENT_OF_GAS_USED
    effective_refund = min(max_refund, refund)
    caller_balance_prev = int(1e18)
    caller_balance = caller_balance_prev + (gas_left + effective_refund) * tx.gas_price
    coinbase_balance_prev = 0
    effective_tip = tx.gas_price - block.base_fee
    coinbase_balance = coinbase_balance_prev + effective_tip * gas_used

    rw = (
        RWDictionary(17)
        .call_context_read(CALL_ID, CallContextFieldTag.TxId, tx.id)
        .call_context_read(CALL_ID, CallContextFieldTag.IsPersistent, is_persistent)
        .tx_refund_read(tx.id, refund)
        .account_write(tx.caller_address, AccountFieldTag.Balance, caller_balance, caller_balance_prev)
        .account_write(block.coinbase, AccountFieldTag.Balance, coinbase_balance, coinbase_balance_prev)
        .tx_receipt_write(tx.id, TxReceiptFieldTag.PostStateOrStatus, is_persistent)
        .tx_receipt_write(tx.id, TxReceiptFieldTag.LogLength, 0)
    )
    if not is_first_tx:
        rw.tx_receipt_read(tx.id - 1, TxReceiptFieldTag.CumulativeGasUsed, 21000)
        rw.tx_receipt_write(tx.id, TxReceiptFieldTag.CumulativeGasUsed, 21000 + gas_used)
    else:
        rw.tx_receipt_write(tx.id, TxReceiptFieldTag.CumulativeGasUsed, gas_used)

    tables = Tables(
        block_table=block.table_assignments(),
        tx_table=tx.table_assignments(),
        bytecode_table=(),
        rw_table=rw.rws,
    )

    verify_steps(
        tables=tables,
        steps=[
            StepState(
                execution_state=ExecutionState.EndTx, rw_counter=17,
                call_id=CALL_ID, gas_left=gas_left,
            ),
            StepState(
                execution_state=ExecutionState.EndBlock,
                rw_counter=17 + 9 - int(is_first_tx),
                call_id=CALL_ID,
            ),
        ],
    )


MAX_RWS = 32


@pytest.mark.parametrize(
    "is_last_step, empty_block, max_txs, max_withdrawals, cumulative_gas, success",
    [
        (False, False, 2, 5, 0, True),
        (True, False, 2, 5, 0, True),
        (True, False, 1, 2, 0, True),
        (True, True, 1, 5, 0, True),
        (True, False, 1, 5, int(15e6), True),
        (True, False, 1, 2, int(15e6) + 1, False),
    ],
)
def test_end_block(is_last_step, empty_block, max_txs, max_withdrawals, cumulative_gas, success):
    from zkevm_specs_tpu.tables.schemas import Target
    from zkevm_specs_tpu.witness.typing import Withdrawal

    tx = Transaction()
    wd1 = Withdrawal(0, 99, 3, int(1e9))
    wd2 = Withdrawal(1, 999, 4, int(1.4e9))

    def rw_row(rw_counter, rw=0, key0=0, **kw):
        row = {
            "rw_counter": rw_counter, "rw": rw, "key0": key0, "id": 0,
            "address": 0, "field_tag": 0, "storage_key": 0, "value": 0,
            "value_prev": 0, "aux0": 0,
        }
        row.update(kw)
        return row

    rw_rows = []
    rw_counter = 1
    if not empty_block:
        rw_rows += [rw_row(i + 1) for i in range(21)]
        rw_counter += 21
        if is_last_step:
            rw_rows.append(
                rw_row(22, 0, int(Target.CallContext), id=1, address=3,
                       field_tag=int(CallContextFieldTag.TxId), value=tx.id)
            )
            rw_rows.append(
                rw_row(23, 0, int(Target.TxReceipt), id=tx.id,
                       field_tag=int(TxReceiptFieldTag.CumulativeGasUsed),
                       value=cumulative_gas)
            )
        rw_rows.append(
            rw_row(22 + is_last_step * 2, 1, int(Target.Account), address=wd1.address,
                   field_tag=int(AccountFieldTag.Balance),
                   value=int(5e18), value_prev=int(4e18))
        )
        rw_rows.append(
            rw_row(23 + is_last_step * 2, 1, int(Target.Account), address=wd2.address,
                   field_tag=int(AccountFieldTag.Balance),
                   value=int(5.5e18), value_prev=int(4.1e18))
        )

    rw_padding = [
        rw_row(i + 1, 0, int(Target.Start)) for i in range(MAX_RWS - len(rw_rows))
    ]

    num_txs = 0 if empty_block else 1
    tx_table = []
    if not empty_block:
        tx_table += tx.table_assignments()
    for i in range(num_txs, max_txs):
        tx_table += Transaction.padding(id=i + 1).table_fixed()

    num_wds = 0 if empty_block else 2
    wd_table = []
    if not empty_block:
        wd_table += wd1.table_assignments() + wd2.table_assignments()
    for i in range(num_wds, max_withdrawals):
        wd_table += Withdrawal.padding(id=i).table_assignments()

    tables = Tables(
        block_table=Block().table_assignments(),
        tx_table=tx_table,
        withdrawal_table=wd_table,
        rw_table=rw_padding + rw_rows,
    )

    verify_steps(
        tables=tables,
        steps=[
            StepState(execution_state=ExecutionState.EndBlock, rw_counter=rw_counter, call_id=1),
            StepState(execution_state=ExecutionState.EndBlock, rw_counter=rw_counter, call_id=1),
        ],
        end_with_last_step=is_last_step,
        success=success,
    )
