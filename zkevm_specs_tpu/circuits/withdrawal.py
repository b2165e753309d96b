"""Withdrawal circuit — EIP-4895 withdrawals with chained MPT root updates
(reference: src/zkevm_specs/withdrawal_circuit.py:1-201).

TPU-native re-design: all MAX_WITHDRAWALS rows are checked in ONE batched
constraint body — monotonic ids as a shifted compare, the RLP keccak link
as a columnar keccak-table lookup over host-encoded bytes (RLC recomputed
in-kernel with a Horner scan), and the chained MPT roots as a shifted
``root_prev`` column — runnable eagerly (spec mode) and compiled
(production, via runtime/kernels).
"""
from __future__ import annotations

from typing import List, NamedTuple

import numpy as np

from ..dsl.cs import ConstraintSystem
from ..utils.typing import is_circuit_code
from ..dsl.value import Ctx, F, Word
from ..ops.keccak import keccak256
from ..tables.engine import Table
from ..tables.schemas import (
    BLOCK_SCHEMA,
    KECCAK_SCHEMA,
    MPT_SCHEMA,
    BlockContextFieldTag,
    MPTProofType,
)
from ..witness.rlc import RLC
from ..witness.rlp import rlp_encode


class Row(NamedTuple):
    withdrawal_id: int
    validator_id: int
    address: int
    amount: int
    hash: int   # keccak of the rlp encoding
    root: int   # MPT root after this withdrawal


class Witness(NamedTuple):
    rows: List[Row]
    mpt_rows: List[dict]
    keccak_rows: List[dict]
    block_rows: List[dict]

    # round-1 attribute names, kept for callers that pass tables through
    @property
    def mpt_table(self):
        return self.mpt_rows

    @property
    def keccak_table(self):
        return self.keccak_rows

    @property
    def block_table(self):
        return self.block_rows


_BITS = {"withdrawal_id": 64, "validator_id": 64, "address": 160, "amount": 64}


def _withdrawal_inputs(witness: Witness, MAX_WITHDRAWALS: int, ctx: Ctx):
    rows = witness.rows
    assert len(rows) == MAX_WITHDRAWALS
    cols = {name: F.from_ints(ctx, [getattr(r, name) for r in rows], bits)
            for name, bits in _BITS.items()}
    cols["hash"] = Word.from_ints(ctx, [r.hash for r in rows])
    cols["root"] = Word.from_ints(ctx, [r.root for r in rows])

    # host-side RLP encodings feed the in-kernel RLC recomputation
    encs = [rlp_encode([r.withdrawal_id, r.validator_id, r.address, r.amount])
            for r in rows]
    max_len = max(len(e) for e in encs)
    byte_cols = np.zeros((max_len, len(rows)), dtype=np.uint8)
    len_arr = np.array([len(e) for e in encs], dtype=np.int32)
    for i, e in enumerate(encs):
        byte_cols[: len(e), i] = np.frombuffer(e, dtype=np.uint8)
    active_cols = np.arange(max_len, dtype=np.int32)[:, None] < len_arr[None, :]
    extra = {"byte_cols": byte_cols, "active_cols": active_cols,
             "len_arr": len_arr}
    return cols, extra


@is_circuit_code
def check_withdrawal(ctx: Ctx, cs: ConstraintSystem, cols, tables, static, extra):
    """The withdrawal-circuit constraint body
    (reference withdrawal_circuit.py:128-201)."""
    from .keccak import _horner_rlc

    xp = ctx.xp
    n = ctx.batch
    idx1 = (xp.arange(n) + 1) % n
    not_last = xp.arange(n) != (n - 1)
    is_first = xp.arange(n) == 0
    is_not_padding = ~cols["amount"].is_zero_mask()

    # 1. monotonic withdrawal ids
    next_id = cols["withdrawal_id"].gather(idx1)
    cs.check(next_id.eq_mask(cols["withdrawal_id"] + 1) | ~not_last,
             lambda: "withdrawal id not monotonic")

    # 2. keccak(rlp(withdrawal)) == hash via the keccak table (non-padding)
    rlc = F(ctx, _horner_rlc(ctx, xp.asarray(extra["byte_cols"]),
                             xp.asarray(extra["active_cols"]), static["r"]), 254)
    length = F(ctx, xp.asarray(extra["len_arr"]).astype(xp.uint32)[:, None], 16)
    tables["keccak"].lookup(
        cs,
        {
            "state_tag": F.const(ctx, 2),
            "input_rlc": rlc,
            "input_len": length,
            "output": cols["hash"],
        },
        enabled=is_not_padding,
    )

    # 3. chained MPT root update per row (root_prev = previous row's root,
    # 0 for the first row)
    prev_root = cols["root"].gather((xp.arange(n) - 1) % n)
    zero = Word.const(ctx, 0)
    prev_root = zero.select(is_first, prev_root)
    pad_f = F.from_bool(ctx, is_not_padding)
    proof_type = (pad_f * int(MPTProofType.WithdrawalMod)
                  + (1 - pad_f) * int(MPTProofType.NonExistingAccountProof))
    tables["mpt"].lookup(
        cs,
        {
            "address": cols["address"],
            "proof_type": proof_type,
            "storage_key": Word.from_lo(cols["withdrawal_id"].broadcast()),
            "value": cols["hash"],
            "value_prev": zero,
            "root": cols["root"],
            "root_prev": prev_root,
        },
    )

    # 4. final root matches the block table's WithdrawalRoot
    tables["block"].lookup(
        cs,
        {
            "field_tag": F.const(ctx, int(BlockContextFieldTag.WithdrawalRoot)),
            "block_number_or_zero": None,
            "value": cols["root"],
        },
        enabled=~xp.asarray(not_last),
    )


_LOOKUP_SUBSETS = {
    "keccak": tuple(KECCAK_SCHEMA.columns),
    "mpt": tuple(MPT_SCHEMA.columns),
    "block": ("field_tag", "value"),
}


def _withdrawal_tables(witness: Witness, ctx: Ctx, build_indexes: bool = False):
    tv = {
        "keccak": Table.from_rows(ctx, KECCAK_SCHEMA, witness.keccak_rows),
        "mpt": Table.from_rows(ctx, MPT_SCHEMA, witness.mpt_rows),
        "block": Table.from_rows(ctx, BLOCK_SCHEMA, witness.block_rows),
    }
    if build_indexes:
        for name, t in tv.items():
            t.index_for(_LOOKUP_SUBSETS[name])
    return tv


def verify_circuit(witness: Witness, MAX_WITHDRAWALS: int,
                   keccak_randomness: int, success: bool = True) -> None:
    """Spec-mode (eager) driver with reference verdict semantics."""
    from ..runtime.kernels import run_spec

    ctx = Ctx(np, MAX_WITHDRAWALS, "eager")
    cols, extra = _withdrawal_inputs(witness, MAX_WITHDRAWALS, ctx)
    run_spec("withdrawal", check_withdrawal, cols,
             _withdrawal_tables(witness, ctx), {"r": keccak_randomness},
             extra, success=success)


def withdrawal_kernel(witness: Witness, MAX_WITHDRAWALS: int,
                      keccak_randomness: int):
    """Production path: the same constraint body compiled to one XLA kernel."""
    from ..runtime.kernels import CircuitKernel

    ctx = Ctx(np, MAX_WITHDRAWALS, "eager")
    cols, extra = _withdrawal_inputs(witness, MAX_WITHDRAWALS, ctx)
    return CircuitKernel("withdrawal", check_withdrawal, cols,
                         _withdrawal_tables(witness, ctx, build_indexes=True),
                         {"r": keccak_randomness}, extra)


# -- witness generation -----------------------------------------------------

def withdrawals2witness(withdrawals, MAX_WITHDRAWALS: int, keccak_randomness: int,
                        block_rows: List[dict]) -> Witness:
    """Build rows + tables from witness Withdrawal objects; padding rows have
    amount == 0 and continue the id sequence."""
    keccak_rows: List[dict] = [{"state_tag": 0, "input_rlc": 0, "input_len": 0,
                                "output": 0}]
    mpt_rows: List[dict] = []
    rows: List[Row] = []
    root_prev = 0
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
            keccak_rows.append({
                "state_tag": 2,
                "input_rlc": RLC(bytes(reversed(encoded)), keccak_randomness,
                                 n_bytes=len(encoded)).expr(),
                "input_len": len(encoded),
                "output": h,
            })
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

    # the block table is the PUBLIC side: the final chained root must match
    # the block's own WithdrawalRoot row (injecting a matching row here
    # would make the reference's final-root constraint vacuous,
    # withdrawal_circuit.py:195-201)
    return Witness(rows, mpt_rows, keccak_rows, list(block_rows))
