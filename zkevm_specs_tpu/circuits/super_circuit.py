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


def public_data_from_witness(witness: BlockWitness, MAX_WITHDRAWALS: int):
    """Build the pi-circuit PublicData view of a block witness: the same
    Block/Transaction data the EVM tables carry, plus the (mocked, as in the
    reference) header fields the EVM circuit never consumes."""
    from .pi import Block as PiBlock, PublicData
    from .pi import Transaction as PiTransaction, Withdrawal as PiWithdrawal

    b = witness.block
    hashes = ([0] * (256 - len(b.history_hashes)) + list(b.history_hashes))
    pi_block = PiBlock(
        hash=0, parent_hash=hashes[-1] if hashes else 0, uncle_hash=0,
        coinbase=b.coinbase, state_root=0, tx_hash=0, receipt_hash=0,
        bloom=bytes(256), prev_randao=b.prev_randao, number=b.number,
        gas_limit=b.gas_limit, gas_used=0, time=b.timestamp, extra=b"",
        mix_digest=0, nonce=0, base_fee=b.base_fee,
        withdrawals_root=b.withdrawal_root,
    )
    pi_txs = [
        PiTransaction(nonce=tx.nonce, gas_price=tx.gas_price, gas=tx.gas,
                      from_addr=tx.caller_address, to_addr=tx.callee_address,
                      value=tx.value, data=bytes(tx.call_data),
                      tx_sign_hash=1234)  # mock, as in reference typing.py:265
        for tx in witness.txs
    ]
    pi_wds = [PiWithdrawal(wd.id, wd.validator_id, wd.address, wd.amount)
              for wd in witness.withdrawals]
    while len(pi_wds) < MAX_WITHDRAWALS:
        pi_wds.append(PiWithdrawal(0, 0, 0, 0))
    return PublicData(chain_id=witness.block.chainid, block=pi_block,
                      state_root_prev=0, block_hashes=hashes, txs=pi_txs,
                      withdrawals=pi_wds)


def sig_witness_from_txs(signed_txs, chain_id: int, keccak_randomness: int):
    """Sig-circuit rows for a block's signed txs (the sig table the
    ecRecover precompile consumes; reference sig_circuit.py)."""
    from ..ops.keccak import keccak256
    from ..witness.rlp import rlp_encode
    from ..ops.ecc import secp256k1
    from .sig import KeccakTable as SigKeccakTable, SigRow
    from .sig import Witness as SigWitness

    kt = SigKeccakTable()
    rows = []
    for tx in signed_txs:
        sign_data = rlp_encode([tx.nonce, tx.gas_price, tx.gas, tx.encode_to(),
                                tx.value, tx.data, chain_id, 0, 0])
        h = keccak256(sign_data)
        parity = tx.sig_v - 35 - chain_id * 2
        pk = secp256k1.recover(int.from_bytes(h, "big"), parity, tx.sig_r, tx.sig_s)
        kt.add(secp256k1.pubkey_bytes(pk), keccak_randomness)
        rows.append(SigRow.assign((parity, tx.sig_r, tx.sig_s), pk, h))
    return SigWitness(rows, kt)


def verify_super_circuit(
    witness: BlockWitness,
    keccak_randomness: Optional[int] = None,
    copy_circuit=None,
    exp_circuit=None,
    signed_txs=None,
    tx_circuit_params: Optional[Tuple[int, int, int]] = None,
    k_bytecode: Optional[int] = None,
    config=None,
) -> None:
    """Verify every sub-circuit of a block witness against shared tables.

    Capacity/randomness knobs default from a CircuitConfig (config.py) —
    the typed replacement for the reference's loose MAX_* parameters."""
    from ..config import DEFAULT_CONFIG

    config = config or DEFAULT_CONFIG
    keccak_randomness = (config.keccak_randomness if keccak_randomness is None
                         else keccak_randomness)
    k_bytecode = config.bytecode_k if k_bytecode is None else k_bytecode
    if signed_txs is not None and tx_circuit_params is None:
        tx_circuit_params = config.tx_circuit_params()
    # shared keccak table covers all bytecode hashes
    codes = [bytes(bc.code) for bc in witness.bytecodes]
    # the shared keccak table covers bytecode hashes plus any SHA3 preimages
    # hashed during execution (witness/tracer.py op_sha3)
    keccak_data = codes + list(getattr(witness, "sha3_preimages", []))
    keccak_rows = assign_keccak_table(keccak_data, keccak_randomness)

    copy_circuit = copy_circuit if copy_circuit is not None else witness.copy_circuit
    exp_circuit = exp_circuit if exp_circuit is not None else witness.exp_circuit
    signed_txs = signed_txs if signed_txs is not None else witness.signed_txs

    kwargs = witness.tables_kwargs()
    if copy_circuit is not None:
        from ..witness.typing import copy_circuit_to_table

        kwargs["copy_table"] = copy_circuit_to_table(copy_circuit)
    if exp_circuit is not None:
        from ..witness.typing import exp_circuit_to_table

        kwargs["exp_table"] = exp_circuit_to_table(exp_circuit)
    if witness.ecc_circuit is not None:
        from .ecc import ecc_table_rows

        kwargs["ecc_table"] = ecc_table_rows(witness.ecc_circuit, keccak_randomness)
    if getattr(witness, "sig_rows", None):
        # sig rows emitted by traced ecRecover precompile calls
        kwargs["sig_table"] = [r.table_row() for r in witness.sig_rows]
    kwargs["keccak_table"] = keccak_rows
    tables = Tables(**kwargs)

    # 1. EVM circuit over all steps.  begin_with_first_step is off because
    # the block witness carries a call-context setup prologue in the rw
    # table (see witness/tracer.py), so BeginTx starts past rw_counter 1;
    # the prologue itself is constrained by verify_prologue below.
    verify_steps(tables, list(witness.steps), end_with_last_step=True)
    verify_prologue(witness)

    # 2. state circuit proves the rw table
    ops = rw_rows_to_state_ops(witness.rw.rws)
    rows = assign_state_circuit(ops)
    verify_state_rows(rows, mpt_table_from_ops(ops))

    # 3. bytecode circuit proves the bytecode table
    unrolled = [unroll(c) for c in codes]
    bc_rows = assign_bytecode_circuit(k_bytecode, unrolled, keccak_randomness)
    verify_bytecode_circuit(bc_rows, keccak_rows, keccak_randomness)

    # 4. keccak circuit proves the keccak table
    verify_keccak_circuit(keccak_data, keccak_rows, keccak_randomness)

    # 5. copy / exp circuits prove their tables
    if copy_circuit is not None:
        verify_copy_table(copy_circuit, tables, keccak_randomness)
    if exp_circuit is not None:
        verify_exp_circuit(exp_circuit)

    # 6. tx + sig circuits prove signatures when signed txs are supplied
    if signed_txs is not None:
        from .tx import txs2witness, verify_circuit as verify_tx_circuit
        from .sig import verify_circuit as verify_sig_circuit

        max_txs, max_calldata, chain_id = tx_circuit_params
        tx_witness = txs2witness(signed_txs, chain_id, max_txs, max_calldata,
                                 keccak_randomness)
        verify_tx_circuit(tx_witness, max_txs, max_calldata, keccak_randomness)
        verify_sig_circuit(sig_witness_from_txs(signed_txs, chain_id,
                                                keccak_randomness),
                           keccak_randomness)

    # 7. ecc circuit proves the ecc table
    if witness.ecc_circuit is not None:
        from .ecc import verify_circuit as verify_ecc_circuit

        verify_ecc_circuit(witness.ecc_circuit, keccak_randomness)

    # 7b. sig circuit proves the traced ecRecover rows
    if getattr(witness, "sig_rows", None):
        from ..ops.ecc import secp256k1
        from .sig import KeccakTable as SigKeccakTable
        from .sig import Witness as SigWitness
        from .sig import verify_circuit as verify_sig_circuit

        kt = SigKeccakTable()
        for r in witness.sig_rows:
            kt.add(secp256k1.pubkey_bytes(r.pub_key), keccak_randomness)
        verify_sig_circuit(SigWitness(list(witness.sig_rows), kt),
                           keccak_randomness)

    # 8. pi + withdrawal circuits commit the public data (the reference pi
    # layout requires every withdrawal slot filled — pi_circuit.py:318-321 —
    # so these run when the block carries withdrawals)
    if witness.withdrawals:
        from .pi import public_data2witness, verify_circuit as verify_pi_circuit
        from .withdrawal import verify_circuit as verify_wd_circuit
        from .withdrawal import withdrawals2witness

        n_wd = len(witness.withdrawals)
        wd_witness = withdrawals2witness(witness.withdrawals, n_wd,
                                         keccak_randomness,
                                         kwargs["block_table"])
        verify_wd_circuit(wd_witness, n_wd, keccak_randomness)

        max_txs = len(witness.txs)
        max_calldata = max(1, sum(len(tx.call_data) for tx in witness.txs))
        pd = public_data_from_witness(witness, n_wd)
        pi_witness = public_data2witness(pd, max_txs, max_calldata, n_wd)
        verify_pi_circuit(pi_witness, max_txs, max_calldata, n_wd)


def verify_prologue(witness: BlockWitness) -> None:
    """Constrain the call-context setup prologue the tracer prepends
    (witness/tracer.py trace_block): rw counters 1..10*n_txs must be exactly
    the canonical per-tx setup writes.  Together with the EVM circuit's
    first-step rule this pins the whole rw-counter space (the integrated-
    witness extension of reference evm_circuit/main.py:48-53)."""
    from ..tables.schemas import CallContextFieldTag as CC
    from ..witness.tracer import _N_SETUP_ROWS

    rws = sorted(witness.rw.rws, key=lambda r: r["rw_counter"])
    rws = [r for r in rws if r["key0"] != int(Target.Start)]
    expected_tags = (
        CC.TxId, CC.RwCounterEndOfReversion, CC.IsPersistent, CC.IsSuccess,
        CC.Depth, CC.CallerAddress, CC.CalleeAddress, CC.CallDataLength,
        CC.Value, CC.IsRoot, CC.CodeHash,
    )
    for i, tx in enumerate(witness.txs):
        code_hash = witness.tx_code_hashes[i]
        success = int(witness.tx_success[i])
        expected_values = (
            tx.id, witness.tx_rwceor[i], success, success, 1,
            tx.caller_address, tx.callee_address,
            len(tx.call_data), tx.value, 1, code_hash,
        )
        for k, (tag, value) in enumerate(zip(expected_tags, expected_values)):
            row = rws[i * _N_SETUP_ROWS + k]
            assert row["rw_counter"] == 1 + i * _N_SETUP_ROWS + k, (
                f"prologue row {k} of tx {tx.id}: bad rw_counter")
            assert (row["key0"], row["rw"]) == (int(Target.CallContext), 1), (
                f"prologue row {k} of tx {tx.id}: not a call-context write")
            # call-context rows pack the field tag in the address column
            assert row["address"] == int(tag), (
                f"prologue row {k} of tx {tx.id}: tag {row['address']} != {int(tag)}")
            assert row["value"] == value, (
                f"prologue row {k} of tx {tx.id}: value mismatch for {tag!r}")

    # subcall context-setup region: one write per callee context key, in
    # rw-counter order right after the root region (witness/tracer.py)
    base = len(witness.txs) * _N_SETUP_ROWS
    idx = base
    for setup in getattr(witness, "subcall_setups", []):
        for callee_id, tag, value in setup:
            row = rws[idx]
            assert row["rw_counter"] == 1 + idx, "subcall prologue: bad rw_counter"
            assert (row["key0"], row["rw"]) == (int(Target.CallContext), 1), (
                "subcall prologue: not a call-context write")
            assert row["id"] == callee_id and row["address"] == int(tag), (
                "subcall prologue: wrong key")
            assert row["value"] == value, (
                f"subcall prologue: value mismatch for {tag!r}")
            idx += 1

    # precompile-output preload region: one memory write per output byte so
    # the callop output/return copies' reads are not first accesses
    for callee_id, addr, byte in getattr(witness, "memory_setups", []):
        row = rws[idx]
        assert row["rw_counter"] == 1 + idx, "memory prologue: bad rw_counter"
        assert (row["key0"], row["rw"]) == (int(Target.Memory), 1), (
            "memory prologue: not a memory write")
        assert row["id"] == callee_id and row["address"] == addr, (
            "memory prologue: wrong key")
        assert row["value"] == byte, "memory prologue: value mismatch"
        idx += 1
