"""Withdrawal circuit — EIP-4895 withdrawals with chained MPT root updates
(reference: src/zkevm_specs/withdrawal_circuit.py:1-201)."""
from __future__ import annotations

from typing import List, NamedTuple, Set, Tuple

from ..ops.keccak import keccak256
from ..tables.schemas import BlockContextFieldTag, MPTProofType
from ..witness.rlc import RLC
from ..witness.rlp import rlp_encode


class Row(NamedTuple):
    withdrawal_id: int
    validator_id: int
    address: int
    amount: int
    hash: int   # keccak of the rlp encoding
    root: int   # MPT root after this withdrawal


class KeccakTable:
    def __init__(self):
        self.table: Set[Tuple[int, int, int, int]] = set()
        self.table.add((0, 0, 0, 0))

    def add(self, data: bytes, keccak_randomness: int):
        output = int.from_bytes(keccak256(data), "big")
        self.table.add(
            (1, RLC(bytes(reversed(data)), keccak_randomness, n_bytes=len(data)).expr(),
             len(data), output)
        )

    def lookup(self, is_enabled, input_rlc, input_len, output, assert_msg):
        assert (is_enabled, input_rlc, input_len, output) in self.table, (
            f"{assert_msg}: keccak lookup failed"
        )


class MPTTable:
    def __init__(self, rows: List[dict]):
        self.table = {
            (r["address"], r["proof_type"], r["storage_key"], r["value"],
             r["value_prev"], r["root"], r["root_prev"])
            for r in rows
        }

    def lookup(self, address, proof_type, storage_key, value, value_prev, root,
               root_prev, assert_msg):
        key = (address, proof_type, storage_key, value, value_prev, root, root_prev)
        assert key in self.table, f"{assert_msg}: mpt lookup failed {key}"


class BlockTable:
    def __init__(self, rows: List[dict]):
        self.table = {(r["field_tag"], r["value"]) for r in rows}

    def lookup(self, field_tag, value, assert_msg):
        assert (field_tag, value) in self.table, f"{assert_msg}: block lookup failed"


class Witness(NamedTuple):
    rows: List[Row]
    mpt_table: MPTTable
    keccak_table: KeccakTable
    block_table: BlockTable


def verify_circuit(witness: Witness, MAX_WITHDRAWALS: int, keccak_randomness: int) -> None:
    rows = witness.rows
    root_prev = 0
    for row_index in range(MAX_WITHDRAWALS):
        assert_msg = f"Constraints failed for withdrawal_index = {row_index}"
        row = rows[row_index]

        is_not_padding = 1 if row.amount != 0 else 0

        if row_index != MAX_WITHDRAWALS - 1:
            assert rows[row_index + 1].withdrawal_id == row.withdrawal_id + 1, (
                f"{assert_msg}: withdrawal id not monotonic"
            )

        encoded = rlp_encode(
            [row.withdrawal_id, row.validator_id, row.address, row.amount]
        )
        length = len(encoded)
        witness.keccak_table.lookup(
            is_not_padding,
            is_not_padding
            * RLC(bytes(reversed(encoded)), keccak_randomness, n_bytes=length).expr(),
            is_not_padding * length,
            row.hash if is_not_padding else 0,
            assert_msg,
        )

        witness.mpt_table.lookup(
            row.address,
            int(MPTProofType.WithdrawalMod) if is_not_padding
            else int(MPTProofType.NonExistingAccountProof),
            row.withdrawal_id,
            row.hash,
            0,
            row.root,
            root_prev,
            assert_msg,
        )
        root_prev = row.root

    witness.block_table.lookup(
        int(BlockContextFieldTag.WithdrawalRoot),
        rows[MAX_WITHDRAWALS - 1].root,
        "final root",
    )


# -- witness generation -----------------------------------------------------

def withdrawals2witness(withdrawals, MAX_WITHDRAWALS: int, keccak_randomness: int,
                        block_rows: List[dict]) -> Witness:
    """Build rows + tables from witness Withdrawal objects; padding rows have
    amount == 0 and continue the id sequence."""
    keccak_table = KeccakTable()
    mpt_rows: List[dict] = []
    rows: List[Row] = []
    root_prev = 0
    next_id = withdrawals[0].id if withdrawals else 0
    all_wds = list(withdrawals)
    while len(all_wds) < MAX_WITHDRAWALS:
        from ..witness.typing import Withdrawal as W

        last_id = all_wds[-1].id + 1 if all_wds else 0
        all_wds.append(W(last_id, 0, 0, 0))
    for wd in all_wds:
        encoded = rlp_encode([wd.id, wd.validator_id, wd.address, wd.amount])
        h = int.from_bytes(keccak256(encoded), "big")
        is_padding = wd.amount == 0
        if not is_padding:
            keccak_table.add(encoded, keccak_randomness)
            root = root_prev + 7  # arbitrary mock root chain for the MPT table
        else:
            root = root_prev
        mpt_rows.append(
            {
                "address": wd.address,
                "proof_type": int(MPTProofType.WithdrawalMod) if not is_padding
                else int(MPTProofType.NonExistingAccountProof),
                "storage_key": wd.id,
                "value": h,
                "value_prev": 0,
                "root": root,
                "root_prev": root_prev,
            }
        )
        rows.append(Row(wd.id, wd.validator_id, wd.address, wd.amount, h, root))
        root_prev = root

    final_root = rows[-1].root
    block = list(block_rows) + [
        {"field_tag": int(BlockContextFieldTag.WithdrawalRoot), "value": final_root}
    ]
    return Witness(rows, MPTTable(mpt_rows), keccak_table, BlockTable(block))
