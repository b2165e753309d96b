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
        # padding continues the id chain with zero amounts, matching the
        # withdrawal circuit's padding convention (circuits/withdrawal.py)
        next_id = pi_wds[-1].id + 1 if pi_wds else 0
        pi_wds.append(PiWithdrawal(next_id, 0, 0, 0))
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
    if k_bytecode is None:
        # grow k to fit the block's unrolled bytecodes (config.bytecode_k is
        # the floor; the circuit needs 2^k > total rows incl. trailing Header)
        n_rows = sum(len(bc.code) + 1 for bc in witness.bytecodes) + 1
        k_bytecode = max(config.bytecode_k, n_rows.bit_length())
    if signed_txs is None:
        signed_txs = witness.signed_txs
    if signed_txs is not None and tx_circuit_params is None:
        # default params scale to the block (config values are floors)
        max_txs, max_cd, chain_id = config.tx_circuit_params()
        tx_circuit_params = (max(max_txs, len(signed_txs)),
                             max(max_cd, sum(len(t.data) for t in signed_txs)),
                             chain_id)
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
    # the prologue itself is constrained IN-CIRCUIT below (check_prologue).
    verify_steps(tables, list(witness.steps), end_with_last_step=True)
    from ..runtime.kernels import run_spec

    from ..tables.schemas import BytecodeFieldTag as _BFT

    p_cols, p_tables, p_extra = build_prologue_inputs(witness, tables)
    run_spec("prologue", check_prologue, p_cols, p_tables,
             {"header_tag": int(_BFT.Header)}, p_extra)

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
        verify_tx_circuit(tx_witness, max_txs, max_calldata, keccak_randomness,
                          evm_callers=[tx.caller_address for tx in witness.txs])
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

    # 8. pi + withdrawal circuits commit the public data for EVERY block
    # (the reference commits all public data unconditionally,
    # pi_circuit.py:338; withdrawal-free blocks get one padding slot so
    # every pi withdrawal row is filled — pi_circuit.py:318-321)
    from .pi import public_data2witness, verify_circuit as verify_pi_circuit
    from .withdrawal import verify_circuit as verify_wd_circuit
    from .withdrawal import withdrawals2witness

    n_wd = max(1, len(witness.withdrawals))
    wd_witness = withdrawals2witness(witness.withdrawals, n_wd,
                                     keccak_randomness,
                                     kwargs["block_table"])
    verify_wd_circuit(wd_witness, n_wd, keccak_randomness)

    max_txs = len(witness.txs)
    max_calldata = max(1, sum(len(tx.call_data) for tx in witness.txs))
    pd = public_data_from_witness(witness, n_wd)
    pi_witness = public_data2witness(pd, max_txs, max_calldata, n_wd)
    verify_pi_circuit(pi_witness, max_txs, max_calldata, n_wd)


def build_prologue_inputs(witness: BlockWitness, tables: Tables):
    """Columns + expectation arrays for the IN-CIRCUIT prologue check: the
    first K rw counters must be exactly the canonical call-context /
    memory setup writes, with the root-frame values bound to the TX table
    and the code hash bound to the bytecode table.  Together with the
    state circuit's first-access/consistency rules this pins the whole
    rw-counter space in-circuit (the integrated-witness replacement of
    reference evm_circuit/main.py:48-53's first-step rule; supersedes the
    host-assert verify_prologue of rounds 1-2)."""
    import numpy as np

    from ..dsl.value import Ctx, F, Word
    from ..tables.schemas import BytecodeFieldTag
    from ..tables.schemas import CallContextFieldTag as CC
    from ..tables.schemas import TxContextFieldTag as TT
    from ..witness.tracer import _N_SETUP_ROWS

    rws = sorted(witness.rw.rws, key=lambda r: r["rw_counter"])
    rws = [r for r in rws if r["key0"] != int(Target.Start)]
    n_setup = (sum(len(s) for s in witness.subcall_setups)
               + len(witness.memory_setups))
    K = _N_SETUP_ROWS * len(witness.txs) + n_setup
    rows = rws[:K]
    assert len(rows) == K, "prologue: rw table shorter than the setup region"

    exp_key0 = np.full(K, int(Target.CallContext), dtype=np.int64)
    exp_addr = np.zeros(K, dtype=np.int64)
    exp_id = np.zeros(K, dtype=np.int64)
    const_mask = np.zeros(K, dtype=bool)
    const_val = np.zeros(K, dtype=np.int64)
    tx_mask = np.zeros(K, dtype=bool)
    tx_tag = np.zeros(K, dtype=np.int64)
    tx_id = np.zeros(K, dtype=np.int64)
    pair_mask = np.zeros(K, dtype=bool)
    pair_idx = np.zeros(K, dtype=np.int64)
    hash_mask = np.zeros(K, dtype=bool)

    tags = (CC.TxId, CC.RwCounterEndOfReversion, CC.IsPersistent, CC.IsSuccess,
            CC.Depth, CC.CallerAddress, CC.CalleeAddress, CC.CallDataLength,
            CC.Value, CC.IsRoot, CC.CodeHash)
    assert len(tags) == _N_SETUP_ROWS
    for i, tx in enumerate(witness.txs):
        b = i * _N_SETUP_ROWS
        for j, tag in enumerate(tags):
            exp_addr[b + j] = int(tag)
        # the call id is the row's own id column; pin all 11 to one value by
        # pairing each row's id with the first row's (cross-checked by the
        # state circuit against BeginTx's reads at call_id == rw_counter)
        const_mask[b + 0] = True
        const_val[b + 0] = tx.id          # TxId value
        pair_mask[b + 2] = True           # IsPersistent == IsSuccess
        pair_idx[b + 2] = b + 3
        const_mask[b + 4] = True
        const_val[b + 4] = 1              # Depth
        for j, tt in ((5, TT.CallerAddress), (6, TT.CalleeAddress),
                      (7, TT.CallDataLength), (8, TT.Value)):
            tx_mask[b + j] = True
            tx_tag[b + j] = int(tt)
            tx_id[b + j] = tx.id
        const_mask[b + 9] = True
        const_val[b + 9] = 1              # IsRoot
        hash_mask[b + 10] = True          # CodeHash in bytecode table
    base = _N_SETUP_ROWS * len(witness.txs)
    k = base
    for setup in witness.subcall_setups:
        for callee_id, tag, _value in setup:
            exp_addr[k] = int(tag)
            exp_id[k] = callee_id
            k += 1
    for callee_id, addr, _byte in witness.memory_setups:
        exp_key0[k] = int(Target.Memory)
        exp_addr[k] = addr
        exp_id[k] = callee_id
        k += 1
    # root-region ids: all 11 rows of tx i share the id of their own rows
    for i in range(len(witness.txs)):
        b = i * _N_SETUP_ROWS
        exp_id[b:b + _N_SETUP_ROWS] = rows[b]["id"]

    ctx = Ctx(np, K, "eager")
    cols = {
        "rw_counter": F.from_ints(ctx, [r["rw_counter"] for r in rows], 32),
        "key0": F.from_ints(ctx, [r["key0"] for r in rows], 8),
        "rw": F.from_ints(ctx, [r["rw"] for r in rows], 1),
        "id": F.from_ints(ctx, [r["id"] for r in rows], 32),
        "address": F.from_ints(ctx, [r["address"] for r in rows], 160),
        "value": Word.from_ints(ctx, [r["value"] for r in rows]),
    }
    extra = {
        "exp_key0": exp_key0, "exp_addr": exp_addr, "exp_id": exp_id,
        "const_mask": const_mask, "const_val": const_val,
        "tx_mask": tx_mask, "tx_tag": tx_tag, "tx_id": tx_id,
        "pair_mask": pair_mask, "pair_idx": pair_idx,
        "hash_mask": hash_mask,
    }
    # tables re-bound to the prologue batch ctx (engine.lookup broadcasts
    # query fingerprints to the TABLE's ctx batch)
    ktables = {"tx": tables.tx.to_backend(ctx),
               "bytecode": tables.bytecode.to_backend(ctx)}
    return cols, ktables, extra


def _canon_u32(ctx, xp, arr, bits):
    """Canonical 16-bit-limb F column from u32 host values (a single-limb
    view breaks as soon as a value exceeds 2^16 — call ids / rw counters do
    in 100k-step blocks)."""
    from ..dsl.value import F

    a = xp.asarray(arr).astype(xp.uint32)
    return F(ctx, xp.stack([a & 0xFFFF, (a >> 16) & 0xFFFF], axis=-1), bits)


def check_prologue(ctx, cs, c, tables, static, extra):
    """Constraint body of the prologue region (spec + jit alike)."""
    from ..dsl.value import F, Word

    xp = ctx.xp
    n = ctx.batch
    arange = _canon_u32(ctx, xp, xp.arange(1, n + 1, dtype=xp.uint32), 32)
    cs.constrain_equal(c["rw_counter"], arange, name="prologue rw_counter")
    cs.constrain_equal(c["rw"], F.const(ctx, 1), name="prologue not a write")

    key0 = F(ctx, xp.asarray(extra["exp_key0"]).astype(xp.uint32)[:, None], 8)
    cs.constrain_equal(c["key0"], key0, name="prologue target")
    addr = _canon_u32(ctx, xp, extra["exp_addr"], 160)
    cs.constrain_equal(c["address"], addr, name="prologue key")
    cid = _canon_u32(ctx, xp, extra["exp_id"], 32)
    cs.constrain_equal(c["id"], cid, name="prologue call id")

    m_const = xp.asarray(extra["const_mask"])
    cv = _canon_u32(ctx, xp, extra["const_val"], 64)
    cs.check(~m_const | (c["value"].lo.eq_mask(cv) & c["value"].hi.is_zero_mask()),
             lambda: "prologue const value mismatch")

    m_pair = xp.asarray(extra["pair_mask"])
    partner = c["value"].lo.gather(xp.asarray(extra["pair_idx"]))
    cs.check(~m_pair | c["value"].lo.eq_mask(partner),
             lambda: "prologue IsPersistent != IsSuccess")
    cs.check(~m_pair | (c["value"].lo.is_zero_mask()
                        | c["value"].lo.eq_mask(F.const(ctx, 1))),
             lambda: "prologue IsPersistent not boolean")

    m_tx = xp.asarray(extra["tx_mask"])
    row = tables["tx"].lookup(cs, {
        "tx_id": _canon_u32(ctx, xp, extra["tx_id"], 32),
        "field_tag": F(ctx, xp.asarray(extra["tx_tag"]).astype(xp.uint32)[:, None], 8),
        "call_data_index_or_zero": F.const(ctx, 0),
    }, enabled=m_tx)
    cs.check(~m_tx | (c["value"].lo.eq_mask(row.value.lo)
                      & c["value"].hi.eq_mask(row.value.hi)),
             lambda: "prologue value != tx table")

    m_hash = xp.asarray(extra["hash_mask"])
    tables["bytecode"].lookup(cs, {
        "bytecode_hash": c["value"],
        "field_tag": F.const(ctx, int(static["header_tag"])),
        "index": F.const(ctx, 0),
    }, enabled=m_hash)


def prologue_kernel(witness: BlockWitness, tables: Tables):
    """Compiled in-circuit prologue check for CompiledBlockVerifier."""
    from ..runtime.kernels import CircuitKernel

    from ..tables.schemas import BytecodeFieldTag

    cols, ktables, extra = build_prologue_inputs(witness, tables)
    return CircuitKernel("prologue", check_prologue, cols, ktables,
                         {"header_tag": int(BytecodeFieldTag.Header)}, extra)


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
