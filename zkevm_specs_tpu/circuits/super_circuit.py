"""Super circuit — one entry point that verifies a whole block witness
across every sub-circuit with shared tables
(architecture per reference specs/super_circuit.md:1-41; the reference has
no executable super circuit — SURVEY.md §7 step 9).

Sub-circuits communicate only through the shared tables: the EVM circuit
*consumes* the rw/bytecode/tx/copy/exp/keccak tables via lookups, and each
producer circuit proves its table:

  rw_table        <- state circuit (sorted-adjacency + MPT)
  bytecode_table  <- bytecode circuit (+ keccak table)
  keccak_table    <- keccak circuit (keccak-f permutation kernel)
  copy/exp tables <- copy / exp circuits
  tx_table        <- tx circuit (ECDSA)  [when signed txs are supplied]
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from ..evm.main import verify_steps
from ..tables.container import Tables
from ..tables.schemas import Target, TxLogFieldTag
from ..witness.tracer import BlockWitness
from .bytecode import assign_bytecode_circuit, assign_keccak_table, unroll, verify_bytecode_circuit
from .copy import verify_copy_table
from .exp import verify_exp_circuit
from .keccak import verify_keccak_circuit
from .state import (
    AccountOp,
    CallContextOp,
    MemoryOp,
    Operation,
    StackOp,
    StartOp,
    StorageOp,
    Tag,
    TxAccessListAccountOp,
    TxAccessListAccountStorageOp,
    TxLogOp,
    TxReceiptOp,
    TxRefundOp,
    assign_state_circuit,
    mpt_table_from_ops,
    verify_state_rows,
)

_TARGET_TO_TAG = {
    Target.Start: Tag.Start,
    Target.Memory: Tag.Memory,
    Target.Stack: Tag.Stack,
    Target.AccountStorage: Tag.Storage,
    Target.CallContext: Tag.CallContext,
    Target.Account: Tag.Account,
    Target.TxRefund: Tag.TxRefund,
    Target.TxAccessListAccount: Tag.TxAccessListAccount,
    Target.TxAccessListAccountStorage: Tag.TxAccessListAccountStorage,
    Target.TxLog: Tag.TxLog,
    Target.TxReceipt: Tag.TxReceipt,
}


def rw_rows_to_state_ops(rw_rows: List[dict]) -> List[Operation]:
    """Convert the EVM circuit's rw rows into sorted state-circuit operations
    (the Target->Tag numbering differs; CallContext packs field_tag in
    `address`, TxLog packs log_id/field_tag/index)."""
    ops: List[Operation] = []
    initial_values: Dict[tuple, int] = {}
    for row in rw_rows:
        target = Target(row["key0"])
        tag = _TARGET_TO_TAG[target]
        rwc, rw = row["rw_counter"], row["rw"]
        if target == Target.Start:
            op = StartOp(rwc, rw)
        elif target == Target.Memory:
            op = MemoryOp(rwc, rw, row["id"], row["address"], row["value"])
        elif target == Target.Stack:
            op = StackOp(rwc, rw, row["id"], row["address"], row["value"])
        elif target == Target.CallContext:
            op = CallContextOp(rwc, rw, row["id"], row["address"], row["value"])
        elif target == Target.Account:
            key = (tag, row["address"], row["field_tag"])
            committed = initial_values.setdefault(key, row["value_prev"])
            op = AccountOp(rwc, rw, row["address"], row["field_tag"],
                           row["value"], committed)
        elif target == Target.AccountStorage:
            key = (tag, row["address"], row["storage_key"])
            committed = initial_values.setdefault(key, row["value_prev"])
            op = StorageOp(rwc, rw, row["id"], row["address"],
                           row["storage_key"], row["value"], committed)
        elif target == Target.TxRefund:
            op = TxRefundOp(rwc, rw, row["id"], row["value"])
        elif target == Target.TxAccessListAccount:
            op = TxAccessListAccountOp(rwc, rw, row["id"], row["address"], row["value"])
        elif target == Target.TxAccessListAccountStorage:
            op = TxAccessListAccountStorageOp(rwc, rw, row["id"], row["address"],
                                              row["storage_key"], row["value"])
        elif target == Target.TxLog:
            addr = row["address"]
            index = addr & 0xFFFFFFFF
            field_tag = (addr >> 32) & 0xFFFF
            log_id = addr >> 48
            op = TxLogOp(rwc, rw, row["id"], log_id, TxLogFieldTag(field_tag),
                         index, row["value"])
        elif target == Target.TxReceipt:
            op = TxReceiptOp(rwc, rw, row["id"], row["field_tag"], row["value"])
        else:
            raise ValueError(target)
        ops.append(op)

    def sort_key(op: Operation):
        return (int(op.tag), int(op.id), int(op.address), int(op.field_tag),
                int(op.storage_key), int(op.rw_counter))

    ops.sort(key=sort_key)
    # the first Start row must have the lexicographic selector disabled
    if ops and ops[0].tag == Tag.Start:
        ops[0].lexicographic_ordering_selector = 0
    return ops


def verify_super_circuit(
    witness: BlockWitness,
    keccak_randomness: int = 0x64,
    copy_circuit=None,
    exp_circuit=None,
    signed_txs=None,
    tx_circuit_params: Optional[Tuple[int, int, int]] = None,
    k_bytecode: int = 10,
) -> None:
    """Verify every sub-circuit of a block witness against shared tables."""
    # shared keccak table covers all bytecode hashes
    codes = [bytes(bc.code) for bc in witness.bytecodes]
    keccak_rows = assign_keccak_table(codes, keccak_randomness)

    kwargs = witness.tables_kwargs()
    if copy_circuit is not None:
        from ..witness.typing import copy_circuit_to_table

        kwargs["copy_table"] = copy_circuit_to_table(copy_circuit)
    if exp_circuit is not None:
        from ..witness.typing import exp_circuit_to_table

        kwargs["exp_table"] = exp_circuit_to_table(exp_circuit)
    kwargs["keccak_table"] = keccak_rows
    tables = Tables(**kwargs)

    # 1. EVM circuit over all steps.  begin_with_first_step is off because
    # the block witness carries a call-context setup prologue in the rw
    # table (see witness/tracer.py), so BeginTx starts past rw_counter 1.
    verify_steps(tables, list(witness.steps), end_with_last_step=True)

    # 2. state circuit proves the rw table
    ops = rw_rows_to_state_ops(witness.rw.rws)
    rows = assign_state_circuit(ops)
    verify_state_rows(rows, mpt_table_from_ops(ops))

    # 3. bytecode circuit proves the bytecode table
    unrolled = [unroll(c) for c in codes]
    bc_rows = assign_bytecode_circuit(k_bytecode, unrolled, keccak_randomness)
    verify_bytecode_circuit(bc_rows, keccak_rows, keccak_randomness)

    # 4. keccak circuit proves the keccak table
    verify_keccak_circuit(codes, keccak_rows, keccak_randomness)

    # 5. copy / exp circuits prove their tables
    if copy_circuit is not None:
        verify_copy_table(copy_circuit, tables, keccak_randomness)
    if exp_circuit is not None:
        verify_exp_circuit(exp_circuit)

    # 6. tx circuit proves signatures when signed txs are supplied
    if signed_txs is not None:
        from .tx import txs2witness, verify_circuit as verify_tx_circuit

        max_txs, max_calldata, chain_id = tx_circuit_params
        tx_witness = txs2witness(signed_txs, chain_id, max_txs, max_calldata,
                                 keccak_randomness)
        verify_tx_circuit(tx_witness, max_txs, max_calldata, keccak_randomness)
