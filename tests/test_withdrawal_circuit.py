"""Withdrawal circuit vectors (mirrors reference tests/test_withdrawal_circuit.py)."""
import pytest

from zkevm_specs_tpu.circuits.withdrawal import (
    Witness,
    verify_circuit,
    withdrawals2witness,
)
from zkevm_specs_tpu.witness.typing import Block, Withdrawal

MAX_WD = 5
R = 0x64

def _block_rows(n_wds: int):
    """Block table whose WithdrawalRoot matches the mock root chain
    (root += 7 per non-padding withdrawal); the circuit constrains the
    final chained root against this PUBLIC row — the witness builder no
    longer injects a matching one."""
    return [
        {"field_tag": r["field_tag"], "value": r["value"]}
        for r in Block(withdrawal_root=7 * n_wds).table_assignments()
    ]


BLOCK_ROWS = _block_rows(2)


def test_withdrawal_ok():
    wds = [Withdrawal(7, 99, 0xCAFE, int(2e9)), Withdrawal(8, 100, 0xBEEF, int(3e9))]
    witness = withdrawals2witness(wds, MAX_WD, R, BLOCK_ROWS)
    verify_circuit(witness, MAX_WD, R)


def test_withdrawal_only_padding():
    witness = withdrawals2witness([], MAX_WD, R, _block_rows(0))
    verify_circuit(witness, MAX_WD, R)


def test_withdrawal_non_monotonic_id_rejected():
    wds = [Withdrawal(7, 99, 0xCAFE, int(2e9)), Withdrawal(9, 100, 0xBEEF, int(3e9))]
    witness = withdrawals2witness(wds, MAX_WD, R, BLOCK_ROWS)
    with pytest.raises(AssertionError):
        verify_circuit(witness, MAX_WD, R)


def test_withdrawal_bad_amount_hash_rejected():
    wds = [Withdrawal(7, 99, 0xCAFE, int(2e9))]
    witness = withdrawals2witness(wds, MAX_WD, R, _block_rows(1))
    rows = list(witness.rows)
    rows[0] = rows[0]._replace(amount=rows[0].amount + 1)
    with pytest.raises(AssertionError):
        verify_circuit(Witness(rows, witness.mpt_table, witness.keccak_table,
                               witness.block_table), MAX_WD, R)


def test_withdrawal_bad_final_root_rejected():
    wds = [Withdrawal(7, 99, 0xCAFE, int(2e9))]
    witness = withdrawals2witness(wds, MAX_WD, R, _block_rows(1))
    rows = list(witness.rows)
    rows[-1] = rows[-1]._replace(root=rows[-1].root + 1)
    with pytest.raises(AssertionError):
        verify_circuit(Witness(rows, witness.mpt_table, witness.keccak_table,
                               witness.block_table), MAX_WD, R)
