"""Mini EVM tracer: builds a *coherent* full-block witness (steps + rw rows
+ copy/exp/keccak events + all tables) for the super circuit.

The reference has no tracer — its tests hand-assemble witnesses per gadget
(SURVEY.md §4).  This module automates that assembly (the bus-mapping role):
it interprets each transaction's bytecode and emits, per executed opcode,
exactly the rw rows / copy events / exp events the corresponding constraint
gadget looks up, with the reference's rw_counter / gas / stack_pointer
bookkeeping (cross-checked by tests/evm/*'s hand-built vectors).

Covered: PUSH*/POP/DUP*/SWAP*, the full ALU family (ADD..SAR incl.
ADDMOD/MULMOD/EXP/SIGNEXTEND/BYTE/shifts), MLOAD/MSTORE/MSTORE8/MSIZE,
SLOAD/SSTORE (EIP-2929 warm/cold + EIP-3529 refunds), JUMP/JUMPI/JUMPDEST/
PC/GAS, context+env queries (ADDRESS/CALLER/CALLVALUE/CALLDATASIZE/
CALLDATALOAD/CODESIZE/GASPRICE/ORIGIN/SELFBALANCE/RETURNDATASIZE/BALANCE/
EXTCODESIZE/EXTCODEHASH/BLOCKHASH + block-context opcodes), the copy family
(CALLDATACOPY/CODECOPY/SHA3), LOG0-4, and RETURN/REVERT in the root frame.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from ..evm.execution_state import ExecutionState
from ..evm.opcode import (
    Opcode,
    constant_gas_cost,
    get_push_size,
    is_push_with_data,
    max_stack_pointer,
    min_stack_pointer,
)
from ..evm.step import StepState
from ..ops.keccak import keccak256
from ..tables.schemas import (
    AccountFieldTag,
    CallContextFieldTag,
    CopyDataTypeTag,
    Target,
    TxLogFieldTag,
    TxReceiptFieldTag,
)
from ..utils.param import (
    COLD_SLOAD_COST,
    EXTRA_GAS_COST_ACCOUNT_COLD_ACCESS,
    GAS_COST_ACCOUNT_COLD_ACCESS,
    GAS_COST_CODE_DEPOSIT,
    GAS_COST_COPY,
    GAS_COST_COPY_SHA3,
    GAS_COST_EXP_PER_BYTE,
    GAS_COST_FASTEST,
    GAS_COST_LOG,
    GAS_COST_LOGDATA,
    GAS_COST_SHA3,
    GAS_COST_SLOW,
    GAS_COST_SSTORE_SENTRY_EIP2200,
    GAS_COST_TX,
    GAS_COST_WARM_ACCESS,
    INVALID_FIRST_BYTE_CONTRACT_CODE,
    MAX_CODE_SIZE,
    MAX_REFUND_QUOTIENT_OF_GAS_USED,
    SLOAD_GAS,
    SSTORE_CLEARS_SCHEDULE,
    SSTORE_RESET_GAS,
    SSTORE_SET_GAS,
    WARM_STORAGE_READ_COST,
)
from .typing import (
    Account,
    Block,
    Bytecode,
    CopyCircuit,
    ExpCircuit,
    RWDictionary,
    Transaction,
)

U256M = (1 << 256) - 1
_ADDR_MASK = (1 << 160) - 1  # geth truncates address operands to 160 bits
U255 = 1 << 255

_STATE_BY_OPCODE = {
    Opcode.STOP: ExecutionState.STOP,
    Opcode.ADD: ExecutionState.ADD,
    Opcode.SUB: ExecutionState.ADD,
    Opcode.MUL: ExecutionState.MUL,
    Opcode.DIV: ExecutionState.MUL,
    Opcode.MOD: ExecutionState.MUL,
    Opcode.SDIV: ExecutionState.SDIV_SMOD,
    Opcode.SMOD: ExecutionState.SDIV_SMOD,
    Opcode.ADDMOD: ExecutionState.ADDMOD,
    Opcode.MULMOD: ExecutionState.MULMOD,
    Opcode.EXP: ExecutionState.EXP,
    Opcode.SIGNEXTEND: ExecutionState.SIGNEXTEND,
    Opcode.LT: ExecutionState.CMP,
    Opcode.GT: ExecutionState.CMP,
    Opcode.EQ: ExecutionState.CMP,
    Opcode.SLT: ExecutionState.SCMP,
    Opcode.SGT: ExecutionState.SCMP,
    Opcode.ISZERO: ExecutionState.ISZERO,
    Opcode.AND: ExecutionState.BITWISE,
    Opcode.OR: ExecutionState.BITWISE,
    Opcode.XOR: ExecutionState.BITWISE,
    Opcode.NOT: ExecutionState.NOT,
    Opcode.BYTE: ExecutionState.BYTE,
    Opcode.SHL: ExecutionState.SHL_SHR,
    Opcode.SHR: ExecutionState.SHL_SHR,
    Opcode.SAR: ExecutionState.SAR,
    Opcode.SHA3: ExecutionState.SHA3,
    Opcode.ADDRESS: ExecutionState.ADDRESS,
    Opcode.BALANCE: ExecutionState.BALANCE,
    Opcode.ORIGIN: ExecutionState.ORIGIN,
    Opcode.CALLER: ExecutionState.CALLER,
    Opcode.CALLVALUE: ExecutionState.CALLVALUE,
    Opcode.CALLDATALOAD: ExecutionState.CALLDATALOAD,
    Opcode.CALLDATASIZE: ExecutionState.CALLDATASIZE,
    Opcode.CALLDATACOPY: ExecutionState.CALLDATACOPY,
    Opcode.CODESIZE: ExecutionState.CODESIZE,
    Opcode.CODECOPY: ExecutionState.CODECOPY,
    Opcode.GASPRICE: ExecutionState.GASPRICE,
    Opcode.EXTCODESIZE: ExecutionState.EXTCODESIZE,
    Opcode.EXTCODECOPY: ExecutionState.EXTCODECOPY,
    Opcode.EXTCODEHASH: ExecutionState.EXTCODEHASH,
    Opcode.RETURNDATASIZE: ExecutionState.RETURNDATASIZE,
    Opcode.BLOCKHASH: ExecutionState.BLOCKHASH,
    Opcode.COINBASE: ExecutionState.BlockCtx,
    Opcode.TIMESTAMP: ExecutionState.BlockCtx,
    Opcode.NUMBER: ExecutionState.BlockCtx,
    Opcode.GASLIMIT: ExecutionState.BlockCtx,
    Opcode.PREVRANDAO: ExecutionState.BlockCtx,
    Opcode.BASEFEE: ExecutionState.BlockCtx,
    Opcode.CHAINID: ExecutionState.BlockCtx,
    Opcode.SELFBALANCE: ExecutionState.SELFBALANCE,
    Opcode.POP: ExecutionState.POP,
    Opcode.MLOAD: ExecutionState.MEMORY,
    Opcode.MSTORE: ExecutionState.MEMORY,
    Opcode.MSTORE8: ExecutionState.MEMORY,
    Opcode.SLOAD: ExecutionState.SLOAD,
    Opcode.SSTORE: ExecutionState.SSTORE,
    Opcode.JUMP: ExecutionState.JUMP,
    Opcode.JUMPI: ExecutionState.JUMPI,
    Opcode.PC: ExecutionState.PC,
    Opcode.MSIZE: ExecutionState.MSIZE,
    Opcode.GAS: ExecutionState.GAS,
    Opcode.JUMPDEST: ExecutionState.JUMPDEST,
    Opcode.LOG0: ExecutionState.LOG,
    Opcode.LOG1: ExecutionState.LOG,
    Opcode.LOG2: ExecutionState.LOG,
    Opcode.LOG3: ExecutionState.LOG,
    Opcode.LOG4: ExecutionState.LOG,
    Opcode.RETURN: ExecutionState.RETURN,
    # REVERT shares the RETURN state/gadget (the reference registers only
    # ExecutionState.RETURN, execution/__init__.py:92)
    Opcode.REVERT: ExecutionState.RETURN,
    Opcode.RETURNDATACOPY: ExecutionState.RETURNDATACOPY,
    Opcode.CREATE: ExecutionState.CREATE,
    Opcode.CREATE2: ExecutionState.CREATE2,
    Opcode.CALL: ExecutionState.CALL_OP,
    Opcode.CALLCODE: ExecutionState.CALL_OP,
    Opcode.DELEGATECALL: ExecutionState.CALL_OP,
    Opcode.STATICCALL: ExecutionState.CALL_OP,
}
for _i in range(1, 17):
    _STATE_BY_OPCODE[Opcode[f"DUP{_i}"]] = ExecutionState.DUP
    _STATE_BY_OPCODE[Opcode[f"SWAP{_i}"]] = ExecutionState.SWAP


class BlockWitness:
    def __init__(self):
        self.steps: List[StepState] = []
        self.rw = RWDictionary(1)
        self.block = Block()
        self.txs: List[Transaction] = []
        self.bytecodes: List[Bytecode] = []
        # optional sub-circuit witnesses populated by the tracer / caller:
        self.withdrawals: List = []        # EIP-4895 withdrawals (pi + wd circuits)
        self.copy_circuit = None           # CopyCircuit accumulator
        self.exp_circuit = None            # ExpCircuit accumulator
        self.ecc_circuit = None            # EccCircuit ops
        self.signed_txs = None             # signed tx list (tx + sig circuits)
        self.sig_rows: List = []           # sig-table rows (ecRecover calls)
        self.sha3_preimages: List[bytes] = []  # extra keccak-circuit preimages
        self.tx_code_hashes: List[int] = []    # per-tx root code hash
        self.subcall_setups: List[List[Tuple[int, object, int]]] = []
        self.memory_setups: List[Tuple[int, int, int]] = []  # (call_id, addr, byte)
        self.tx_success: List[bool] = []   # per-tx root-frame outcome
        self.tx_rwceor: List[int] = []     # per-tx root RwCounterEndOfReversion
        self.chain_id = 0x01

    def tables_kwargs(self) -> dict:
        tx_rows = []
        for tx in self.txs:
            tx_rows += tx.table_assignments()
        bc_rows = []
        for bc in self.bytecodes:
            bc_rows += bc.table_assignments()
        return dict(
            block_table=self.block.table_assignments(),
            tx_table=tx_rows,
            bytecode_table=bc_rows,
            rw_table=self.rw.rws,
        )


_N_SETUP_ROWS = 11  # incl. RwCounterEndOfReversion (non-zero for reverted txs)


def _resolve_anchor(a: dict) -> int:
    """RwCounterEndOfReversion of a frame (reference reversion chaining,
    tests/evm/test_callop.py:202-208): a frame that fails owns its mirror
    section; one reverted by an ancestor sits inside the ancestor's section
    at parent - (caller_rev_at_call + 1); a persistent frame has none."""
    if a["failed"]:
        assert a["own"] is not None, "reversion anchor unresolved"
        return a["own"]
    if a["persistent"] or a["parent"] is None:
        return 0
    p = _resolve_anchor(a["parent"])
    return 0 if p == 0 else p - a["poffset"]


def _precompile_required_gas(target: int, cd_length: int) -> int:
    """Precompile gas as computed by errors.error_oog_precompile
    (reference error_oog_precompile.py: base cost, plus per-word for
    identity and per-pair for bn254 pairing)."""
    from ..evm.precompile import Precompile
    from ..utils.param import Bn254PairingPerPointGas, IdentityPerWordGas

    p = Precompile(target)
    gas = p.base_gas_cost()
    if p == Precompile.BN254PAIRING:
        gas += Bn254PairingPerPointGas * (cd_length // 192)
    elif p == Precompile.DATACOPY:
        gas += IdentityPerWordGas * ((cd_length + 31) // 32)
    return gas


def _signed(v: int) -> int:
    return v - (1 << 256) if v >= U255 else v


def _byte_size(v: int) -> int:
    return (v.bit_length() + 7) // 8


class _Tracer:
    """Single-block interpreter emitting gadget-exact witness rows."""

    def __init__(self, block: Block, caller_balance: int, start_counter: int,
                 accounts: Optional[Dict[int, Account]] = None,
                 outcomes: Optional[List[bool]] = None):
        self.w = BlockWitness()
        self.w.block = block
        self.w.rw = RWDictionary(start_counter)
        self.w.copy_circuit = CopyCircuit()
        self.w.exp_circuit = ExpCircuit()
        self.rw = self.w.rw
        self.block = block
        self.copy_r = 0x64  # randomness for copy RLC events (shared default)
        # randomness shared with the super circuit's keccak/sig/ecc tables
        # (config.py CircuitConfig.keccak_randomness)
        from ..config import DEFAULT_CONFIG
        self.keccak_r = DEFAULT_CONFIG.keccak_randomness
        self.cumulative_gas = 0
        self.call_ids: List[int] = []
        self._code_hashes: Dict[int, Bytecode] = {}

        # frame-outcome oracle: pass 1 (outcomes=None) executes the block to
        # discover which frames halt in failure; pass 2 replays with the
        # oracle so persistence-dependent witness values (IsPersistent,
        # IsSuccess, TxLog gating) are right at emission time
        self.outcomes = outcomes
        self.discovered: List[bool] = []
        self.fseq = 0
        # deferred RwCounterEndOfReversion reads: (row_dict, anchor)
        self.fixups: List[Tuple[dict, dict]] = []
        self.root_anchors: List[dict] = []

        # world state
        self.balances: Dict[int, int] = {}
        self.nonces: Dict[int, int] = {}
        self.codes: Dict[int, Bytecode] = {}   # address -> deployed code
        self.storage: Dict[Tuple[int, int], int] = {}
        for addr, acct in (accounts or {}).items():
            self.balances[addr] = acct.balance
            self.nonces[addr] = acct.nonce
            if acct.code is not None and len(acct.code.code):
                self.codes[addr] = acct.code
                self._register_code(acct.code)
            for k, v in getattr(acct, "storage", {}).items():
                self.storage[(addr, k)] = v

    # -- helpers ------------------------------------------------------------

    def _register_code(self, bytecode: Bytecode) -> int:
        h = bytecode.hash()
        if h not in self._code_hashes:
            self._code_hashes[h] = bytecode
            self.w.bytecodes.append(bytecode)
        return h

    def _account_code_hash(self, addr: int) -> int:
        """CodeHash account-table value: 0 when the account does not exist."""
        if addr in self.codes:
            return self.codes[addr].hash()
        if self.balances.get(addr, 0) or self.nonces.get(addr, 0):
            from .typing import EMPTY_CODE_HASH

            return EMPTY_CODE_HASH
        return 0

    # -- frame outcome / reversion machinery --------------------------------

    def _frame_outcome(self) -> Tuple[int, bool]:
        idx = self.fseq
        self.fseq += 1
        if self.outcomes is None:
            self.discovered.append(True)  # optimistic; patched at a failing halt
            return idx, True
        return idx, self.outcomes[idx]

    def _mark_failed(self):
        if self.outcomes is None:
            self.discovered[self.frame_idx] = False

    def _mirror_last(self, pending: Optional[List[dict]] = None):
        """Record the reversion mirror of the rw row just emitted (value and
        value_prev swapped, reference typing.py _state_write); materialized
        at the owning frame's failing halt, or dropped if it never fails."""
        base = self.rw.rws[-1]
        m = dict(base)
        m["value"], m["value_prev"] = base["value_prev"], base["value"]
        (self.pending if pending is None else pending).append(m)

    def _materialize_reversion(self):
        """Place this frame's mirror section in the rw counters the halting
        gadget skipped: write with offset c lands at RwCounterEndOfReversion
        - c (LIFO), reference instruction.py:111-112."""
        R = len(self.pending)
        end = self.rw.rw_counter
        rwceor = end + R - 1
        for c, row in enumerate(self.pending):
            row["rw_counter"] = rwceor - c
            self.rw.rws.append(row)
        self.rw.rw_counter = end + R
        self.anchor["own"] = rwceor
        self.anchor["failed"] = True
        self.pending = []
        return rwceor

    def _snapshot(self) -> dict:
        return dict(
            balances=dict(self.balances), nonces=dict(self.nonces),
            codes=dict(self.codes), storage=dict(self.storage),
            warm_addr=set(self.warm_addr), warm_slot=set(self.warm_slot),
            refund=self.refund, log_count=self.log_count,
        )

    def _rollback(self, s: dict):
        self.balances = dict(s["balances"])
        self.nonces = dict(s["nonces"])
        self.codes = dict(s["codes"])
        self.storage = dict(s["storage"])
        self.warm_addr = set(s["warm_addr"])
        self.warm_slot = set(s["warm_slot"])
        self.refund = s["refund"]
        self.log_count = s["log_count"]

    def _fix_rwceor(self, anchor: dict):
        """Defer the value of the RwCounterEndOfReversion row just emitted."""
        self.fixups.append((self.rw.rws[-1], anchor))

    # -- per-tx execution ---------------------------------------------------

    def run_tx(self, tx: Transaction, bytecode: Bytecode) -> int:
        rw, block = self.rw, self.block
        tx_id = tx.id
        self.w.txs.append(tx)
        code_hash = self._register_code(bytecode)
        self.w.tx_code_hashes.append(code_hash)
        self.codes.setdefault(tx.callee_address, bytecode)
        call_id = rw.rw_counter
        self.call_ids.append(call_id)

        # per-tx context
        self.tx = tx
        self.tx_id = tx_id
        self.call_id = call_id
        self.code_hash = code_hash
        self.code = bytecode
        # precompile addresses are always warm (EIP-2929)
        self.warm_addr = set(range(1, 10))
        self.warm_slot = set()
        self.committed: Dict[Tuple[int, int], int] = {}
        self.refund = 0
        self.log_count = 0
        self.rev = 0          # reversible_write_counter
        self.stack: List[int] = []
        self.memory: Dict[int, int] = {}
        self.mws = 0          # memory_word_size
        self.pc = 0
        self.stopped = False
        # call-frame context (root values; subcalls push/pop via _FRAME_FIELDS)
        self.is_root = True
        self.callee_address = tx.callee_address
        self.caller_address = tx.caller_address
        self.value = tx.value
        self.is_static = 0
        self.depth = 1
        self.calldata = bytes(tx.call_data)
        self.cd_offset_abs = 0        # calldata region offset in caller memory
        self.caller_frame_id = 0
        self.rd_offset_abs = 0        # caller-requested return region
        self.rd_length = 0
        self.last_callee = (0, 0, 0)  # (id, return_data_offset, length)
        self.frames: List[dict] = []
        self.memories: Dict[int, Dict[int, int]] = {}  # finished frames' memory

        # root-frame reversion machinery
        idx, success = self._frame_outcome()
        self.frame_idx = idx
        self.persistent = success  # root frame: persistent == own success
        self.pending: List[dict] = []
        self.anchor = {"own": None, "parent": None, "poffset": 0,
                       "persistent": success, "failed": not success}
        self.is_create_frame = False
        self.snapshot: dict = {}
        self.root_anchors.append(self.anchor)
        self.w.tx_success.append(success)

        # --- BeginTx (gadget rw order, begin_tx.py) ---
        begin_rwc = rw.rw_counter
        rw.call_context_read(call_id, CallContextFieldTag.TxId, tx_id)
        rw.call_context_read(call_id, CallContextFieldTag.RwCounterEndOfReversion, 0)
        self._fix_rwceor(self.anchor)
        rw.call_context_read(call_id, CallContextFieldTag.IsPersistent, int(success))
        rw.call_context_read(call_id, CallContextFieldTag.IsSuccess, int(success))
        # invalid (skipped) txs and empty-code callees take the begin_tx
        # gadget's direct BeginTx->EndTx branch (reference begin_tx.py's
        # is_tx_invalid / empty-code-hash paths): no context setup reads,
        # no execution steps, masked transfer for the invalid case
        is_invalid = bool(tx.invalid_tx)
        skip_execution = is_invalid or len(bytecode.code) == 0
        # the nonce write's prev value is the ACCOUNT nonce (seeded from
        # `accounts`, defaulting to the declared tx nonce); the gadget
        # derives is_nonce_valid = (tx_nonce == nonce_prev) and constrains
        # nonce == nonce_prev + 1 - is_invalid (begin_tx.py)
        nonce_prev = self.nonces.get(tx.caller_address, tx.nonce)
        rw.account_write(tx.caller_address, AccountFieldTag.Nonce,
                         nonce_prev + 1 - int(is_invalid), nonce_prev)
        self.nonces[tx.caller_address] = nonce_prev + 1 - int(is_invalid)
        for addr in (block.coinbase, tx.caller_address, tx.callee_address):
            rw.tx_access_list_account_write(tx_id, addr, True, addr in self.warm_addr)
            self.warm_addr.add(addr)
        # the transfer pair is reversible, bound to the root frame
        # (begin_tx passes reversion_info to transfer_with_gas_fee)
        self.snapshot = self._snapshot()
        # begin_tx masks the transfer amounts to zero for invalid txs
        # (zero_word.select(invalid_mask, ...)); the two write rows still
        # exist, with unchanged values
        tx_value = 0 if is_invalid else tx.value
        gas_fee = 0 if is_invalid else tx.gas * tx.gas_price
        caller_bal_prev = self.balances.get(tx.caller_address, 0)
        caller_bal = caller_bal_prev - tx_value - gas_fee
        rw.account_write(tx.caller_address, AccountFieldTag.Balance,
                         caller_bal, caller_bal_prev)
        self._mirror_last()
        self.balances[tx.caller_address] = caller_bal
        callee_bal_prev = self.balances.get(tx.callee_address, 0)
        rw.account_write(tx.callee_address, AccountFieldTag.Balance,
                         callee_bal_prev + tx_value, callee_bal_prev)
        self._mirror_last()
        self.balances[tx.callee_address] = callee_bal_prev + tx_value
        rw.account_read(tx.callee_address, AccountFieldTag.CodeHash, code_hash)
        for tag, value in () if skip_execution else (
            (CallContextFieldTag.Depth, 1),
            (CallContextFieldTag.CallerAddress, tx.caller_address),
            (CallContextFieldTag.CalleeAddress, tx.callee_address),
            (CallContextFieldTag.CallDataOffset, 0),
            (CallContextFieldTag.CallDataLength, len(tx.call_data)),
            (CallContextFieldTag.Value, tx.value),
            (CallContextFieldTag.IsStatic, 0),
            (CallContextFieldTag.LastCalleeId, 0),
            (CallContextFieldTag.LastCalleeReturnDataOffset, 0),
            (CallContextFieldTag.LastCalleeReturnDataLength, 0),
            (CallContextFieldTag.IsRoot, 1),
            (CallContextFieldTag.IsCreate, 0),
            (CallContextFieldTag.CodeHash, code_hash),
        ):
            rw.call_context_read(call_id, tag, value)

        # intrinsic gas includes the EIP-2930 access-list charge, read from
        # the tx table's AccessListGasCost row (begin_tx.py; the reference
        # charges it but does NOT warm the entries — mirrored)
        self.gas_left = (0 if is_invalid else
                         tx.gas - GAS_COST_TX - tx.call_data_gas_cost()
                         - tx.access_list_gas_cost())
        # in the skip branches the gadget leaves gas_left unconstrained
        # between BeginTx and EndTx; make the witness carry the remaining
        # gas (empty code: intrinsic charged, rest refunded at EndTx;
        # invalid: zero, so no refund is paid for a fee never collected)
        self.w.steps.append(StepState(
            ExecutionState.BeginTx, begin_rwc,
            gas_left=self.gas_left if skip_execution else 0))
        self.rev = 2  # the two transfer balance writes are reversible

        # --- interpret the bytecode ---
        while not skip_execution and not self.stopped:
            self.step_op()

        # --- EndTx (gadget rw order, end_tx.py) ---
        end_rwc = rw.rw_counter
        gas_used = tx.gas - self.gas_left
        effective_refund = min(self.refund, gas_used // MAX_REFUND_QUOTIENT_OF_GAS_USED)
        success = self.w.tx_success[-1]
        rw.call_context_read(call_id, CallContextFieldTag.TxId, tx_id)
        rw.call_context_read(call_id, CallContextFieldTag.IsPersistent, int(success))
        rw.tx_refund_read(tx_id, self.refund)
        refund_value = (self.gas_left + effective_refund) * tx.gas_price
        bal_prev = self.balances.get(tx.caller_address, 0)
        rw.account_write(tx.caller_address, AccountFieldTag.Balance,
                         bal_prev + refund_value, bal_prev)
        self.balances[tx.caller_address] = bal_prev + refund_value
        effective_tip = tx.gas_price - block.base_fee
        cb_prev = self.balances.get(block.coinbase, 0)
        reward = effective_tip * gas_used
        rw.account_write(block.coinbase, AccountFieldTag.Balance,
                         cb_prev + reward, cb_prev)
        self.balances[block.coinbase] = cb_prev + reward
        # end_tx.py: status == (1 - is_tx_invalid) * is_persistent
        rw.tx_receipt_write(tx_id, TxReceiptFieldTag.PostStateOrStatus,
                            int(success) * (1 - int(is_invalid)))
        rw.tx_receipt_write(tx_id, TxReceiptFieldTag.LogLength, self.log_count)
        if tx_id > 1:
            rw.tx_receipt_read(tx_id - 1, TxReceiptFieldTag.CumulativeGasUsed,
                               self.cumulative_gas)
        self.cumulative_gas += gas_used
        rw.tx_receipt_write(tx_id, TxReceiptFieldTag.CumulativeGasUsed,
                            self.cumulative_gas)
        if self.has_next_tx:
            # EndTx additionally reads the NEXT BeginTx's TxId row
            # (end_tx.py:73-78): one extra rw row bound to the next call id
            next_call_id = rw.rw_counter + 1
            rw.call_context_read(next_call_id, CallContextFieldTag.TxId, tx_id + 1)
        self.w.steps.append(
            StepState(ExecutionState.EndTx, end_rwc, call_id=call_id,
                      gas_left=self.gas_left, log_id=self.log_count)
        )
        return call_id

    # -- opcode dispatch ----------------------------------------------------

    def _expansion_gas(self, offset: int, length: int) -> int:
        """Memory-expansion gas without mutating the model."""
        if length == 0:
            return 0
        size = (offset + length + 31) // 32
        new = max(self.mws, size)
        return 3 * (new - self.mws) + new * new // 512 - self.mws * self.mws // 512

    _WRITE_PROTECTED = frozenset(
        [Opcode.SSTORE, Opcode.CREATE, Opcode.CREATE2, Opcode.SELFDESTRUCT,
         Opcode.LOG0, Opcode.LOG1, Opcode.LOG2, Opcode.LOG3, Opcode.LOG4])

    def _detect_error(self, raw: int) -> Optional[ExecutionState]:
        """Pre-dispatch error classification (geth order: invalid opcode,
        stack validation, write protection, constant gas, then the
        per-opcode dynamic-gas / runtime checks).

        Hot path: one table lookup per check (256-entry arrays built at
        import) and an immediate exit for the opcode majority that has no
        dynamic check — the tracer runs this for EVERY step."""
        E = ExecutionState
        op = _OP_BY_RAW[raw]
        if op is None:
            return E.ErrorInvalidOpcode
        sp = 1024 - len(self.stack)
        if sp < _MIN_SP[raw] or sp > _MAX_SP[raw]:
            return E.ErrorStack
        if self.is_static and (
                op in self._WRITE_PROTECTED
                or (op is Opcode.CALL and self.stack[-3] != 0)):
            return E.ErrorWriteProtection
        gas = self.gas_left
        if gas < _CONST_GAS[raw]:
            return E.ErrorOutOfGasConstant
        if not _HAS_DYNAMIC_CHECK[raw]:
            return None
        st = self.stack  # top is st[-1]
        if op in (Opcode.JUMP, Opcode.JUMPI):
            jumps = op == Opcode.JUMP or st[-2] != 0
            if jumps and not self._valid_jumpdest(st[-1]):
                return E.ErrorInvalidJump
        elif op in (Opcode.BALANCE, Opcode.EXTCODESIZE, Opcode.EXTCODEHASH):
            warm = (st[-1] & _ADDR_MASK) in self.warm_addr
            need = GAS_COST_WARM_ACCESS if warm else GAS_COST_ACCOUNT_COLD_ACCESS
            if gas < need:
                return E.ErrorOutOfGasAccountAccess
        elif op in (Opcode.MLOAD, Opcode.MSTORE, Opcode.MSTORE8):
            size = 1 if op == Opcode.MSTORE8 else 32
            if st[-1] + size > (1 << 64) - 1:
                # memory size overflows u64 (geth calcMemSize64WithUint)
                return E.ErrorGasUintOverflow
            if gas < GAS_COST_FASTEST + self._expansion_gas(st[-1], size):
                return E.ErrorOutOfGasStaticMemoryExpansion
        elif op in (Opcode.RETURN, Opcode.REVERT):
            offset, length = st[-1], st[-2]
            exp_gas = self._expansion_gas(offset if length else 0, length)
            if gas < exp_gas:
                return E.ErrorOutOfGasDynamicMemoryExpansion
            if op == Opcode.RETURN and self.is_create_frame:
                if (length and self.memory.get(offset, 0)
                        == INVALID_FIRST_BYTE_CONTRACT_CODE):
                    return E.ErrorInvalidCreationCode
                if length > MAX_CODE_SIZE:
                    return E.ErrorMaxCodeSizeExceeded
                if gas - exp_gas < length * GAS_COST_CODE_DEPOSIT:
                    return E.ErrorOutOfGasCodeStore
        elif op in (Opcode.CALLDATACOPY, Opcode.CODECOPY, Opcode.EXTCODECOPY,
                    Opcode.RETURNDATACOPY):
            base = -2 if op == Opcode.EXTCODECOPY else -1
            mem_off, length = st[base], st[base - 2]
            if op == Opcode.EXTCODECOPY:
                warm = (st[-1] & _ADDR_MASK) in self.warm_addr
                const = GAS_COST_WARM_ACCESS if warm else GAS_COST_ACCOUNT_COLD_ACCESS
            else:
                const = GAS_COST_FASTEST
            dyn = (GAS_COST_COPY * ((length + 31) // 32)
                   + self._expansion_gas(mem_off if length else 0, length))
            if gas < const + dyn:
                return E.ErrorOutOfGasMemoryCopy
            if op == Opcode.RETURNDATACOPY:
                data_off, length = st[-2], st[-3]
                if data_off + length > self.last_callee[2]:
                    return E.ErrorReturnDataOutOfBound
        elif op in (Opcode.SLOAD, Opcode.SSTORE):
            if op == Opcode.SSTORE and gas <= GAS_COST_SSTORE_SENTRY_EIP2200:
                return E.ErrorOutOfGasSloadSstore
            skey = (self.callee_address, st[-1])
            warm = skey in self.warm_slot
            if op == Opcode.SLOAD:
                need = WARM_STORAGE_READ_COST if warm else COLD_SLOAD_COST
            else:
                value, value_prev = st[-2], self.storage.get(skey, 0)
                original = self.committed.get(skey, value_prev)
                if value == value_prev or value_prev != original:
                    slot = SLOAD_GAS
                elif original == 0:
                    slot = SSTORE_SET_GAS
                else:
                    slot = SSTORE_RESET_GAS
                need = slot if warm else slot + COLD_SLOAD_COST
            if gas < need:
                return E.ErrorOutOfGasSloadSstore
        elif op in (Opcode.LOG0, Opcode.LOG1, Opcode.LOG2, Opcode.LOG3,
                    Opcode.LOG4):
            n = int(op) - int(Opcode.LOG0)
            mstart, msize = st[-1], st[-2]
            need = (GAS_COST_LOG * (1 + n) + GAS_COST_LOGDATA * msize
                    + self._expansion_gas(mstart, msize))
            if gas < need:
                return E.ErrorOutOfGasLOG
        elif op == Opcode.EXP:
            if gas < GAS_COST_SLOW + GAS_COST_EXP_PER_BYTE * _byte_size(st[-2]):
                return E.ErrorOutOfGasEXP
        elif op == Opcode.SHA3:
            off, size = st[-1], st[-2]
            need = (GAS_COST_SHA3 + GAS_COST_COPY_SHA3 * ((size + 31) // 32)
                    + self._expansion_gas(off if size else 0, size))
            if gas < need:
                return E.ErrorOutOfGasSHA3
        elif op in (Opcode.CREATE, Opcode.CREATE2) and not self.is_root:
            from ..utils.param import GAS_COST_CREATE, GAS_COST_INITCODE_WORD

            offset, size = st[-2], st[-3]
            words = (size + 31) // 32
            need = (GAS_COST_CREATE
                    + self._expansion_gas(offset if size else 0, size)
                    + words * GAS_COST_INITCODE_WORD
                    + (GAS_COST_COPY_SHA3 * words
                       if op == Opcode.CREATE2 else 0))
            if gas < need:
                # (the gadget's root branch recomputes calldata gas from the
                # tx table; the tracer only reaches this state in subframes)
                return E.ErrorOutOfGasCREATE
        elif op in (Opcode.CALL, Opcode.CALLCODE, Opcode.DELEGATECALL,
                    Opcode.STATICCALL):
            has_val = op in (Opcode.CALL, Opcode.CALLCODE)
            target = st[-2]
            value = st[-3] if has_val else 0
            cdo, cdl = (st[-4], st[-5]) if has_val else (st[-3], st[-4])
            rdo, rdl = (st[-6], st[-7]) if has_val else (st[-5], st[-6])
            from ..utils.param import (
                GAS_COST_CALL_WITH_VALUE,
                GAS_COST_NEW_ACCOUNT,
            )

            warm = target in self.warm_addr
            mem = 0
            sizes = [self.mws]
            if cdl:
                sizes.append((cdo + cdl + 31) // 32)
            if rdl:
                sizes.append((rdo + rdl + 31) // 32)
            nm = max(sizes)
            mem = 3 * (nm - self.mws) + nm * nm // 512 - self.mws * self.mws // 512
            callee_missing = self._account_code_hash(target) == 0
            need = ((GAS_COST_WARM_ACCESS if warm else GAS_COST_ACCOUNT_COLD_ACCESS)
                    + (GAS_COST_CALL_WITH_VALUE
                       + (GAS_COST_NEW_ACCOUNT if op == Opcode.CALL and callee_missing else 0)
                       if value != 0 else 0)
                    + mem)
            if gas < need:
                return E.ErrorOutOfGasCall
        return None

    def _valid_jumpdest(self, dest: int) -> bool:
        code = self.code.code
        return (dest < len(code) and code[dest] == int(Opcode.JUMPDEST)
                and self.code.is_code[dest])

    def step_op(self):
        code = self.code.code
        raw = code[self.pc] if self.pc < len(code) else 0  # STOP
        err = self._detect_error(raw)
        if err is not None:
            state = err
        else:
            state = _FAST_STATE[raw]
            if state is None:  # unmapped valid opcode — same KeyError as before
                state = _STATE_BY_OPCODE[Opcode(raw)]
        sp = 1024 - len(self.stack)
        self.w.steps.append(
            StepState(state, self.rw.rw_counter, call_id=self.call_id,
                      is_root=self.is_root, is_create=self.is_create_frame,
                      code_hash=self.code_hash,
                      program_counter=self.pc, stack_pointer=sp,
                      gas_left=self.gas_left, memory_word_size=self.mws,
                      reversible_write_counter=self.rev,
                      log_id=self.log_count)
        )
        if err is not None:
            self._halt_error(err, raw)
            return
        self.gas_left -= _CONST_GAS[raw]
        handler = _FAST_HANDLER[raw]
        if handler is None:
            raise NotImplementedError(
                f"tracer: no handler for {Opcode(raw)!r}")
        handler(self, _OP_BY_RAW[raw])

    def _halt_error(self, state: ExecutionState, raw: int):
        """Emit an error-halt's rows and unwind the frame: gadget-specific
        rows (per evm/execution/errors.py), IsSuccess == 0
        (constrain_error_state), caller-context restore for subcalls, then
        the mirror section the error delta skips (errors.py _finish)."""
        self._mark_failed()
        rw = self.rw
        E = ExecutionState
        sp = 1024 - len(self.stack)
        st = self.stack

        def sread(offset):  # stack_lookup(RW.Read, offset) — no pop
            rw.stack_read(self.call_id, sp + offset, st[-1 - offset])

        if state == E.ErrorInvalidJump:
            dest = self.spop()
            if Opcode(raw) == Opcode.JUMPI:
                self.spop()
        elif state == E.ErrorWriteProtection:
            self.cc_read(CallContextFieldTag.IsStatic, 1)
            if Opcode(raw) == Opcode.CALL:
                sread(2)
        elif state == E.ErrorOutOfGasAccountAccess:
            # geth truncates address operands to 160 bits before keying the
            # access list (ADVICE r4: a dirty-high-bit stack word must not
            # diverge the warm-set key)
            addr = self.spop() & _ADDR_MASK
            self.cc_read(CallContextFieldTag.TxId, self.tx_id)
            rw.tx_access_list_account_read(self.tx_id, addr,
                                           addr in self.warm_addr)
        elif state == E.ErrorOutOfGasStaticMemoryExpansion:
            self.spop()
        elif state in (E.ErrorOutOfGasDynamicMemoryExpansion, E.ErrorOutOfGasSHA3):
            self.spop()
            self.spop()
        elif state == E.ErrorOutOfGasMemoryCopy:
            off = 0
            if Opcode(raw) == Opcode.EXTCODECOPY:
                sread(0)
                off = 1
            sread(off)
            sread(off + 2)
            if Opcode(raw) == Opcode.EXTCODECOPY:
                self.cc_read(CallContextFieldTag.TxId, self.tx_id)
                ext = st[-1] & _ADDR_MASK  # geth address truncation
                rw.tx_access_list_account_read(self.tx_id, ext,
                                               ext in self.warm_addr)
        elif state == E.ErrorReturnDataOutOfBound:
            sread(1)
            sread(2)
            self.cc_read(CallContextFieldTag.LastCalleeReturnDataLength,
                         self.last_callee[2])
        elif state == E.ErrorOutOfGasSloadSstore:
            key = self.spop()
            self.cc_read(CallContextFieldTag.TxId, self.tx_id)
            self.cc_read(CallContextFieldTag.CalleeAddress, self.callee_address)
            skey = (self.callee_address, key)
            rw.tx_access_list_account_storage_read(
                self.tx_id, self.callee_address, key, skey in self.warm_slot)
            if Opcode(raw) == Opcode.SSTORE:
                self.spop()
                value_prev = self.storage.get(skey, 0)
                committed = self.committed.get(skey, value_prev)
                rw.account_storage_read(self.callee_address, key, value_prev,
                                        self.tx_id, committed)
                # the gadget's original-value hint rides the step aux
                self.w.steps[-1].aux_data = committed
        elif state == E.ErrorGasUintOverflow:
            # gadget order (errors.py error_gas_uint_overflow): CallDataLength,
            # TxId, IsRoot reads, then memory_size's stack pops; the tracer
            # reaches this state via MLOAD/MSTORE/MSTORE8 with a u64-
            # overflowing offset (non-root frames skip the calldata section)
            assert not self.is_root, (
                "tracer: root-frame gas-uint-overflow needs calldata lookups")
            self.cc_read(CallContextFieldTag.CallDataLength, len(self.calldata))
            self.cc_read(CallContextFieldTag.TxId, self.tx_id)
            self.cc_read(CallContextFieldTag.IsRoot, 0)
            self.spop()              # offset
            if Opcode(raw) in (Opcode.MSTORE, Opcode.MSTORE8):
                self.spop()          # value
        elif state == E.ErrorOutOfGasCREATE:
            sread(1)
            sread(2)
            self.cc_read(CallContextFieldTag.IsRoot, 0)
        elif state in (E.ErrorOutOfGasCodeStore, E.ErrorMaxCodeSizeExceeded):
            sread(1)
            self.cc_read(CallContextFieldTag.IsStatic, 0)
        elif state == E.ErrorInvalidCreationCode:
            offset = self.spop()
            rw.memory_read(self.call_id, offset, self.memory.get(offset, 0))
        elif state == E.ErrorOutOfGasLOG:
            self.spop()
            self.spop()
        elif state == E.ErrorOutOfGasEXP:
            sread(1)
        elif state == E.ErrorOutOfGasCall:
            op = Opcode(raw)
            self.cc_read(CallContextFieldTag.TxId, self.tx_id)
            has_val = op in (Opcode.CALL, Opcode.CALLCODE)
            self.spop()            # gas
            target = self.spop()   # address
            if has_val:
                self.spop()        # value
            for _ in range(4):     # cd_offset, cd_length, rd_offset, rd_length
                self.spop()
            self.spush(0)          # is_success == 0 (CallGadget pins it)
            rw.account_read(target, AccountFieldTag.CodeHash,
                            self._account_code_hash(target))
            rw.tx_access_list_account_read(self.tx_id, target,
                                           target in self.warm_addr)
        rw.call_context_read(self.call_id, CallContextFieldTag.IsSuccess, 0)
        self.gas_left = 0  # exception consumes all remaining gas
        if self.is_root:
            self._materialize_reversion()
            self._rollback(self.snapshot)
            self.stopped = True
            return
        saved = self.frames[-1]
        last_callee = (self.call_id, 0, 0)
        self._restore_context_rows(saved, last_callee)
        self._materialize_reversion()
        self._rollback(self.snapshot)
        self._pop_frame(last_callee, success=False)

    # stack rw helpers (emit the row AND mutate the model stack)
    def spush(self, v: int):
        self.stack.append(v)
        self.rw.stack_write(self.call_id, 1024 - len(self.stack), v)

    def spop(self) -> int:
        v = self.stack.pop()
        self.rw.stack_read(self.call_id, 1023 - len(self.stack), v)
        return v

    def cc_read(self, tag, value):
        self.rw.call_context_read(self.call_id, tag, value)
        return value

    def reversion_reads(self):
        self.cc_read(CallContextFieldTag.RwCounterEndOfReversion, 0)
        self._fix_rwceor(self.anchor)
        self.cc_read(CallContextFieldTag.IsPersistent, int(self.persistent))

    def _expand_dyn(self, offset: int, length: int) -> int:
        """Dynamic-length memory expansion; deducts gas, returns new size."""
        if length == 0:
            return 0
        size = (offset + length + 31) // 32
        new = max(self.mws, size)
        gas = 3 * (new - self.mws) + new * new // 512 - self.mws * self.mws // 512
        self.gas_left -= gas
        self.mws = new
        return gas

    def _copier_gas(self, length: int, per_word: int = GAS_COST_COPY):
        self.gas_left -= per_word * ((length + 31) // 32)

    def _mem_bytes(self, offset: int, length: int) -> bytes:
        return bytes(self.memory.get(offset + i, 0) for i in range(length))

    # -- call frames ---------------------------------------------------------

    _FRAME_FIELDS = (
        "call_id", "code_hash", "code", "stack", "memory", "mws", "pc",
        "gas_left", "rev", "is_root", "callee_address", "caller_address",
        "value", "is_static", "depth", "calldata", "cd_offset_abs",
        "caller_frame_id", "rd_offset_abs", "rd_length", "last_callee",
        "frame_idx", "persistent", "pending", "anchor", "snapshot",
        "is_create_frame",
    )

    def _push_frame(self) -> dict:
        saved = {f: getattr(self, f) for f in self._FRAME_FIELDS}
        self.frames.append(saved)
        return saved

    def _pop_frame(self, last_callee, success: bool = True):
        self.memories[self.call_id] = self.memory
        callee_gas = self.gas_left
        callee_rev = self.rev
        callee_pending = self.pending
        saved = self.frames.pop()
        for f in self._FRAME_FIELDS:
            setattr(self, f, saved[f])
        self.pc = saved["resume_pc"]
        self.gas_left = saved["resume_gas"] + callee_gas
        self.mws = saved["resume_mws"]
        if success:
            # halt in success: the callee's reversible writes accumulate to
            # the caller (restored-context accumulation) and its pending
            # mirrors splice into the caller's section at the offsets the
            # reversion chaining reserved (poffset onward)
            self.rev = saved["resume_rev"] + callee_rev
            self.pending = self.pending + callee_pending
        else:
            self.rev = saved["resume_rev"]
        self.last_callee = last_callee

    def _restore_context_rows(self, saved: dict, last_callee,
                              read_caller_id: bool = True):
        """The 12 restore rows of step_state_transition_to_restored_context
        (evm/instruction.py:481-538); gadgets that pass caller_id explicitly
        (dataCopy) skip the CallerId read."""
        caller_id = saved["call_id"]
        if read_caller_id:
            self.rw.call_context_read(self.call_id, CallContextFieldTag.CallerId,
                                      caller_id)
        for tag, value in (
            (CallContextFieldTag.IsRoot, int(saved["is_root"])),
            (CallContextFieldTag.IsCreate, 0),
            (CallContextFieldTag.CodeHash, saved["code_hash"]),
            (CallContextFieldTag.ProgramCounter, saved["resume_pc"]),
            (CallContextFieldTag.StackPointer, 1024 - len(saved["stack"])),
            (CallContextFieldTag.GasLeft, saved["resume_gas"]),
            (CallContextFieldTag.MemorySize, saved["resume_mws"]),
            (CallContextFieldTag.ReversibleWriteCounter, saved["resume_rev"]),
        ):
            self.rw.call_context_read(caller_id, tag, value)
        for tag, value in (
            (CallContextFieldTag.LastCalleeId, last_callee[0]),
            (CallContextFieldTag.LastCalleeReturnDataOffset, last_callee[1]),
            (CallContextFieldTag.LastCalleeReturnDataLength, last_callee[2]),
        ):
            self.rw.call_context_write(caller_id, tag, value)

    def op_callop(self, op):
        """CALL/CALLCODE/DELEGATECALL/STATICCALL — success, failing-callee,
        precheck-fail and precompile paths
        (evm/execution/callop.py; row order per tests/evm/test_callop_return.py
        and reference tests/evm/test_callop.py:116-345)."""
        from ..ops.keccak import EMPTY_CODE_HASH
        from ..utils.param import (
            GAS_COST_ACCOUNT_COLD_ACCESS,
            GAS_COST_CALL_WITH_VALUE,
            GAS_COST_NEW_ACCOUNT,
            GAS_COST_WARM_ACCESS,
            GAS_STIPEND_CALL_WITH_VALUE,
        )

        is_call = op == Opcode.CALL
        is_callcode = op == Opcode.CALLCODE
        is_delegatecall = op == Opcode.DELEGATECALL
        is_staticcall = op == Opcode.STATICCALL
        rw = self.rw
        callee_call_id = self.w.steps[-1].rw_counter
        # the callop gadget charges the warm/cold access cost dynamically and
        # never adds a constant cost — undo step_op's generic deduction
        self.gas_left += constant_gas_cost(op)

        self.cc_read(CallContextFieldTag.TxId, self.tx_id)
        self.reversion_reads()
        self.cc_read(CallContextFieldTag.CalleeAddress, self.callee_address)
        self.cc_read(CallContextFieldTag.IsStatic, self.is_static)
        self.cc_read(CallContextFieldTag.Depth, self.depth)
        if is_delegatecall:
            self.cc_read(CallContextFieldTag.CallerAddress, self.caller_address)
            self.cc_read(CallContextFieldTag.Value, self.value)

        gas_arg = self.spop()
        target = self.spop()
        value = self.spop() if (is_call or is_callcode) else 0
        cd_offset_w = self.spop()
        cd_length = self.spop()
        rd_offset_w = self.spop()
        rd_length = self.spop()
        cd_offset = cd_offset_w if cd_length else 0
        rd_offset = rd_offset_w if rd_length else 0

        # precheck (callop.py:77-89) and outcome resolution
        is_precompile = 1 <= target <= 9
        callee_code = self.codes.get(target)
        code_hash = self._account_code_hash(target)
        callee_not_exists = int(code_hash == 0)
        no_code = code_hash in (0, int(EMPTY_CODE_HASH)) or callee_code is None
        balance_ok = (not (is_call or is_callcode)
                      or self.balances.get(self.callee_address, 0) >= value)
        precheck_ok = self.depth < 1025 and balance_ok
        enters_callee = precheck_ok and not no_code and not is_precompile

        # predict whether a precompile call runs out of gas BEFORE the result
        # push (pure math mirror of the gas computation below; the error
        # gadget is errors.error_oog_precompile)
        prec_oog = False
        if is_precompile and precheck_ok:
            _has_value = (int(value != 0)
                          if not (is_delegatecall or is_staticcall) else 0)
            _sizes = [self.mws]
            if cd_length:
                _sizes.append((cd_offset + cd_length + 31) // 32)
            if rd_length:
                _sizes.append((rd_offset + rd_length + 31) // 32)
            _next_mws = max(_sizes)
            _mem_gas = (3 * (_next_mws - self.mws)
                        + _next_mws * _next_mws // 512
                        - self.mws * self.mws // 512)
            _warm = target in self.warm_addr
            _gas_cost = (
                (GAS_COST_WARM_ACCESS if _warm else GAS_COST_ACCOUNT_COLD_ACCESS)
                + _has_value * (GAS_COST_CALL_WITH_VALUE
                                + (GAS_COST_NEW_ACCOUNT
                                   if is_call and callee_not_exists else 0))
                + _mem_gas)
            _avail = self.gas_left - _gas_cost
            _ab64 = _avail - _avail // 64
            _cg = min(_ab64, gas_arg) if gas_arg < (1 << 64) else _ab64
            prec_oog = _cg < _precompile_required_gas(target, cd_length)

        if enters_callee:
            cidx, csucc = self._frame_outcome()
        else:
            # no-code/precompile calls succeed unless the precompile OOGs
            cidx, csucc = None, bool(precheck_ok) and not prec_oog
        self.spush(int(csucc))

        # memory expansion across the cd and rd regions (CallGadget)
        sizes = [self.mws]
        if cd_length:
            sizes.append((cd_offset + cd_length + 31) // 32)
        if rd_length:
            sizes.append((rd_offset + rd_length + 31) // 32)
        next_mws = max(sizes)
        mem_gas = (3 * (next_mws - self.mws)
                   + next_mws * next_mws // 512 - self.mws * self.mws // 512)

        rw.account_read(target, AccountFieldTag.CodeHash, code_hash)
        warm = target in self.warm_addr
        rw.tx_access_list_account_write(self.tx_id, target, True, warm)
        al_row = rw.rws[-1]
        self._mirror_last()
        self.rev += 1
        self.warm_addr.add(target)

        callee_persistent = self.persistent and csucc
        callee_anchor = {"own": None, "parent": self.anchor,
                         "poffset": self.rev, "persistent": callee_persistent,
                         "failed": enters_callee and not csucc}
        rw.call_context_read(callee_call_id,
                             CallContextFieldTag.RwCounterEndOfReversion, 0)
        self._fix_rwceor(callee_anchor)
        rw.call_context_read(callee_call_id, CallContextFieldTag.IsPersistent,
                             int(callee_persistent))
        # the state circuit needs the first access of every callee context
        # key to be a write; record the setup for the block prologue
        # (RwCounterEndOfReversion resolves after the trace)
        setup = [(callee_call_id, CallContextFieldTag.RwCounterEndOfReversion,
                  callee_anchor),
                 (callee_call_id, CallContextFieldTag.IsPersistent,
                  int(callee_persistent))]
        self.w.subcall_setups.append(setup)

        has_value = int(value != 0) if not (is_delegatecall or is_staticcall) else 0
        # context address resolution (callop.py:48-55)
        ctx_callee = (self.callee_address if (is_callcode or is_delegatecall)
                      else target)
        ctx_caller = (self.caller_address if is_delegatecall
                      else self.callee_address)
        ctx_value = self.value if is_delegatecall else value

        if is_call or is_callcode:
            rw.account_read(ctx_caller if is_callcode else self.callee_address,
                            AccountFieldTag.Balance,
                            self.balances.get(self.callee_address, 0))
        snapshot = self._snapshot()  # callee rolls back to pre-transfer state
        callee_pending: List[dict] = []
        if is_call and precheck_ok:
            # transfer value (reversible, bound to the callee frame)
            src, dst = self.callee_address, target
            src_prev = self.balances.get(src, 0)
            rw.account_write(src, AccountFieldTag.Balance, src_prev - value,
                             src_prev)
            self._mirror_last(callee_pending)
            self.balances[src] = src_prev - value
            dst_prev = self.balances.get(dst, 0)
            rw.account_write(dst, AccountFieldTag.Balance, dst_prev + value,
                             dst_prev)
            self._mirror_last(callee_pending)
            self.balances[dst] = dst_prev + value
        # the gadget pins the callee's reversible_write_counter to 2 even
        # when no transfer rows exist (callop.py:300 Transition.to(2), also
        # the delta-3 caller branch) — fill the phantom offsets with no-op
        # re-writes of the access-list row so the skipped rw range has no
        # gaps (EndBlock's totality argument counts every counter)
        while len(callee_pending) < 2:
            pad = dict(al_row)
            pad["value"] = pad["value_prev"] = 1
            callee_pending.append(pad)

        gas_cost = (
            (GAS_COST_WARM_ACCESS if warm else GAS_COST_ACCOUNT_COLD_ACCESS)
            + has_value * (GAS_COST_CALL_WITH_VALUE
                           + (GAS_COST_NEW_ACCOUNT if is_call and callee_not_exists else 0))
            + mem_gas
        )
        gas_available = self.gas_left - gas_cost
        all_but_64th = gas_available - gas_available // 64
        callee_gas = min(all_but_64th, gas_arg) if gas_arg < (1 << 64) else all_but_64th

        if is_precompile and precheck_ok:
            if prec_oog:
                self._enter_precompile_oog(
                    op, target, callee_call_id, callee_anchor, callee_pending,
                    cd_offset, cd_length, rd_offset, rd_length,
                    gas_cost, callee_gas, next_mws)
            else:
                self._enter_precompile(
                    op, target, callee_call_id, callee_anchor, snapshot,
                    cd_offset, cd_length, rd_offset, rd_length, value,
                    has_value, gas_cost, callee_gas, next_mws)
            return

        if not precheck_ok or no_code:
            # stays in the caller's frame (callop.py:120-142); the gadget's
            # reversible delta is 3 either way, so a precheck-failed call
            # pads the two never-emitted transfer mirror slots with no-op
            # re-writes of the access-list row
            for tag, v in ((CallContextFieldTag.LastCalleeId, 0),
                           (CallContextFieldTag.LastCalleeReturnDataOffset, 0),
                           (CallContextFieldTag.LastCalleeReturnDataLength, 0)):
                rw.call_context_write(self.call_id, tag, v)
            self.pending += callee_pending
            self.rev += 2
            self.last_callee = (0, 0, 0)
            # the gadget refunds the stipend in this branch even on a failed
            # precheck (callop.py:135; reference expected() mirrors this)
            self.gas_left += has_value * GAS_STIPEND_CALL_WITH_VALUE - gas_cost
            self.mws = next_mws
            self.pc += 1
            return

        # save the caller context (5 writes)
        resume_gas = self.gas_left - gas_cost - callee_gas
        for tag, v in (
            (CallContextFieldTag.ProgramCounter, self.pc + 1),
            (CallContextFieldTag.StackPointer, 1024 - len(self.stack)),
            (CallContextFieldTag.GasLeft, resume_gas),
            (CallContextFieldTag.MemorySize, next_mws),
            (CallContextFieldTag.ReversibleWriteCounter, self.rev),
        ):
            rw.call_context_write(self.call_id, tag, v)

        # callee is static if the caller is, or this is a STATICCALL
        # (callop.py IsStatic deviation note)
        callee_static = 1 if (self.is_static or is_staticcall) else 0
        for tag, v in (
            (CallContextFieldTag.CallerId, self.call_id),
            (CallContextFieldTag.TxId, self.tx_id),
            (CallContextFieldTag.Depth, self.depth + 1),
            (CallContextFieldTag.CallerAddress, ctx_caller),
            (CallContextFieldTag.CalleeAddress, ctx_callee),
            (CallContextFieldTag.CallDataOffset, cd_offset),
            (CallContextFieldTag.CallDataLength, cd_length),
            (CallContextFieldTag.ReturnDataOffset, rd_offset),
            (CallContextFieldTag.ReturnDataLength, rd_length),
            (CallContextFieldTag.Value, ctx_value),
            (CallContextFieldTag.IsSuccess, int(csucc)),
            (CallContextFieldTag.IsStatic, int(callee_static)),
            (CallContextFieldTag.LastCalleeId, 0),
            (CallContextFieldTag.LastCalleeReturnDataOffset, 0),
            (CallContextFieldTag.LastCalleeReturnDataLength, 0),
            (CallContextFieldTag.IsRoot, 0),
            (CallContextFieldTag.IsCreate, 0),
            (CallContextFieldTag.CodeHash, code_hash),
        ):
            rw.call_context_read(callee_call_id, tag, v)
            setup.append((callee_call_id, tag, v))

        # enter the callee frame
        calldata = bytes(self.memory.get(cd_offset + i, 0)
                         for i in range(cd_length))
        saved = self._push_frame()
        saved["resume_pc"] = self.pc + 1
        saved["resume_gas"] = resume_gas
        saved["resume_mws"] = next_mws
        saved["resume_rev"] = self.rev
        self.call_id = callee_call_id
        self.code = callee_code
        self.code_hash = callee_code.hash()
        self.stack = []
        self.memory = {}
        self.mws = 0
        self.pc = 0
        self.gas_left = callee_gas + has_value * GAS_STIPEND_CALL_WITH_VALUE
        self.rev = 2
        self.is_root = False
        self.callee_address = ctx_callee
        self.caller_address = ctx_caller
        self.value = ctx_value
        self.is_static = int(callee_static)
        self.depth = self.depth + 1
        self.calldata = calldata
        self.cd_offset_abs = cd_offset
        self.caller_frame_id = saved["call_id"]
        self.rd_offset_abs = rd_offset
        self.rd_length = rd_length
        self.last_callee = (0, 0, 0)
        self.frame_idx = cidx
        self.persistent = callee_persistent
        self.pending = callee_pending
        self.anchor = callee_anchor
        self.snapshot = snapshot
        self.is_create_frame = False

    def op_create(self, op):
        """CREATE/CREATE2 (evm/execution/create.py; row order per
        tests/evm/test_create.py).  Reference quirks mirrored: the deployer
        is the frame's CallerAddress (create.py:41-47), the CREATE address
        uses the post-increment nonce (create.py:108), and CREATE2 packs
        salt/code-hash little-endian (instruction.py generate_CREAET2)."""
        from ..ops.keccak import EMPTY_CODE_HASH
        from ..utils.param import (
            GAS_COST_COPY_SHA3,
            GAS_COST_CREATE,
            GAS_COST_INITCODE_WORD,
        )
        from .rlp import rlp_encode
        from .typing import init_is_code

        is_create2 = op == Opcode.CREATE2
        rw = self.rw
        callee_call_id = self.w.steps[-1].rw_counter
        # the gadget charges GAS_COST_CREATE inside its dynamic formula
        self.gas_left += constant_gas_cost(op)

        value = self.spop()
        offset = self.spop()
        size = self.spop()
        salt = self.spop() if is_create2 else 0

        initcode_bytes = bytearray(self._mem_bytes(offset, size))
        initcode = Bytecode(initcode_bytes)
        init_hash = initcode.hash() if size else int(EMPTY_CODE_HASH)
        if size:
            # the gadget's code-hash hint rides the step aux (create.py:94)
            self.w.steps[-1].aux_data = init_hash

        deployer = self.caller_address
        nonce_prev = self.nonces.get(deployer, 0)
        nonce = nonce_prev + 1
        if is_create2:
            contract = int.from_bytes(
                keccak256(b"\xff" + deployer.to_bytes(20, "big")
                          + salt.to_bytes(32, "little")
                          + init_hash.to_bytes(32, "little"))[-20:], "big")
        else:
            contract = int.from_bytes(
                keccak256(rlp_encode([deployer.to_bytes(20, "big"), nonce]))[-20:],
                "big")

        # prechecks (create.py:80-88)
        depth_ok = self.depth < 1025
        balance_ok = self.balances.get(deployer, 0) >= value
        nonce_ok = nonce_prev < (1 << 64) - 1
        precheck_ok = depth_ok and balance_ok and nonce_ok
        collision = precheck_ok and (
            self.nonces.get(contract, 0) != 0
            or self._account_code_hash(contract) not in (0, int(EMPTY_CODE_HASH))
        )
        enters = precheck_ok and not collision and size > 0
        if enters:
            cidx, csucc = self._frame_outcome()
        else:
            cidx, csucc = None, bool(precheck_ok and not collision)
        self.spush(contract if csucc else 0)

        self.cc_read(CallContextFieldTag.Depth, self.depth)
        self.cc_read(CallContextFieldTag.TxId, self.tx_id)
        self.cc_read(CallContextFieldTag.CallerAddress, deployer)
        rw.account_write(deployer, AccountFieldTag.Nonce, nonce, nonce_prev)
        self.nonces[deployer] = nonce
        rw.account_read(deployer, AccountFieldTag.Balance,
                        self.balances.get(deployer, 0))
        # CREATE outcome from the callee context (create.py deviation note)
        rw.call_context_read(callee_call_id, CallContextFieldTag.IsSuccess,
                             int(csucc))
        self.cc_read(CallContextFieldTag.IsStatic, self.is_static)
        self.reversion_reads()

        # memory expansion + initcode word gas (create.py:60-78)
        next_mws = max(self.mws, (offset + size + 31) // 32) if size else self.mws
        mem_gas = (3 * (next_mws - self.mws)
                   + next_mws * next_mws // 512 - self.mws * self.mws // 512)
        word_len = (size + 31) // 32
        gas_cost = GAS_COST_CREATE + mem_gas + word_len * GAS_COST_INITCODE_WORD
        if is_create2:
            gas_cost += GAS_COST_COPY_SHA3 * word_len
        gas_available = self.gas_left - gas_cost
        callee_gas = gas_available - gas_available // 64

        callee_persistent = self.persistent and csucc
        callee_anchor = {"own": None, "parent": self.anchor,
                         "poffset": self.rev + 1, "persistent": callee_persistent,
                         "failed": enters and not csucc}
        callee_pending: List[dict] = []
        setup = [(callee_call_id, CallContextFieldTag.IsSuccess, int(csucc))]
        snapshot = None

        if precheck_ok:
            warm = contract in self.warm_addr
            rw.tx_access_list_account_write(self.tx_id, contract, True, warm)
            self._mirror_last()
            self.rev += 1
            self.warm_addr.add(contract)
            rw.account_read(contract, AccountFieldTag.CodeHash,
                            self._account_code_hash(contract))
            rw.account_read(contract, AccountFieldTag.Nonce,
                            self.nonces.get(contract, 0))
            if not collision:
                rw.call_context_read(
                    callee_call_id, CallContextFieldTag.RwCounterEndOfReversion, 0)
                self._fix_rwceor(callee_anchor)
                rw.call_context_read(callee_call_id,
                                     CallContextFieldTag.IsPersistent,
                                     int(callee_persistent))
                setup.append((callee_call_id,
                              CallContextFieldTag.RwCounterEndOfReversion,
                              callee_anchor))
                setup.append((callee_call_id, CallContextFieldTag.IsPersistent,
                              int(callee_persistent)))
                # transfer + contract nonce write, bound to the callee frame
                snapshot = self._snapshot()
                src_prev = self.balances.get(deployer, 0)
                rw.account_write(deployer, AccountFieldTag.Balance,
                                 src_prev - value, src_prev)
                self._mirror_last(callee_pending)
                self.balances[deployer] = src_prev - value
                dst_prev = self.balances.get(contract, 0)
                rw.account_write(contract, AccountFieldTag.Balance,
                                 dst_prev + value, dst_prev)
                self._mirror_last(callee_pending)
                self.balances[contract] = dst_prev + value
                rw.account_write(contract, AccountFieldTag.Nonce, 1, 0)
                self._mirror_last(callee_pending)
                self.nonces[contract] = 1
        self.w.subcall_setups.append(setup)

        if not enters:
            # stays in the caller's frame (create.py:196-222)
            for tag, v in ((CallContextFieldTag.LastCalleeId, 0),
                           (CallContextFieldTag.LastCalleeReturnDataOffset, 0),
                           (CallContextFieldTag.LastCalleeReturnDataLength, 0)):
                rw.call_context_write(self.call_id, tag, v)
            # empty-initcode deploys in place: splice the callee mirrors
            self.pending += callee_pending
            self.rev += len(callee_pending)
            if csucc and size == 0:
                self.codes[contract] = Bytecode(bytearray())
                self._register_code(Bytecode(bytearray()))
            self.gas_left -= gas_cost
            self.mws = next_mws
            self.pc += 1
            return

        # copy the initcode from caller memory into the bytecode table
        self._register_code(initcode)
        is_code = init_is_code(initcode_bytes)
        src_data = {offset + i: (initcode_bytes[i], int(is_code[i]))
                    for i in range(size)}
        self.w.copy_circuit.copy(
            self.copy_r, rw, self.call_id, CopyDataTypeTag.Memory,
            init_hash, CopyDataTypeTag.Bytecode, offset, offset + size,
            0, size, src_data,
        )

        # save the caller context (5 writes)
        resume_gas = self.gas_left - gas_cost - callee_gas
        for tag, v in (
            (CallContextFieldTag.ProgramCounter, self.pc + 1),
            (CallContextFieldTag.StackPointer, 1024 - len(self.stack)),
            (CallContextFieldTag.GasLeft, resume_gas),
            (CallContextFieldTag.MemorySize, next_mws),
            (CallContextFieldTag.ReversibleWriteCounter, self.rev),
        ):
            rw.call_context_write(self.call_id, tag, v)

        # callee context reads (create.py:163-183)
        for tag, v in (
            (CallContextFieldTag.CallerId, self.call_id),
            (CallContextFieldTag.TxId, self.tx_id),
            (CallContextFieldTag.Depth, self.depth + 1),
            (CallContextFieldTag.CallerAddress, deployer),
            (CallContextFieldTag.CalleeAddress, contract),
            (CallContextFieldTag.IsSuccess, int(csucc)),
            (CallContextFieldTag.IsStatic, 0),
            (CallContextFieldTag.IsRoot, 0),
            (CallContextFieldTag.IsCreate, 1),
            (CallContextFieldTag.CodeHash, init_hash),
        ):
            rw.call_context_read(callee_call_id, tag, v)
            if tag != CallContextFieldTag.IsSuccess:
                setup.append((callee_call_id, tag, v))

        # enter the initcode frame
        saved = self._push_frame()
        saved["resume_pc"] = self.pc + 1
        saved["resume_gas"] = resume_gas
        saved["resume_mws"] = next_mws
        saved["resume_rev"] = self.rev
        self.call_id = callee_call_id
        self.code = initcode
        self.code_hash = init_hash
        self.stack = []
        self.memory = {}
        self.mws = 0
        self.pc = 0
        self.gas_left = callee_gas
        self.rev = 3
        self.is_root = False
        self.callee_address = contract
        self.caller_address = deployer
        self.value = value
        self.is_static = 0
        self.depth = self.depth + 1
        self.calldata = b""
        self.cd_offset_abs = 0
        self.caller_frame_id = saved["call_id"]
        self.rd_offset_abs = 0
        self.rd_length = 0
        self.last_callee = (0, 0, 0)
        self.frame_idx = cidx
        self.persistent = callee_persistent
        self.pending = callee_pending
        self.anchor = callee_anchor
        self.snapshot = snapshot
        self.is_create_frame = True

    # -- precompile calls ----------------------------------------------------

    def _enter_precompile(self, op, target, callee_call_id, callee_anchor,
                          snapshot, cd_offset, cd_length, rd_offset, rd_length,
                          value, has_value, gas_cost, callee_gas, next_mws):
        """CALL to addresses 0x01/0x04/0x06/0x07/0x08: the callop gadget's
        precompile branch (callop.py:143-249) followed immediately by the
        precompile execution state's own step.  Tracer restrictions
        (documented deviations keep the reversion bookkeeping coherent):
        value == 0 and the calling frame is persistent."""
        from ..ops.ecc import bn254, secp256k1
        from ..ops.keccak import EMPTY_CODE_HASH
        from ..utils.param import (
            Bn254AddGas,
            Bn254PairingBaseGas,
            Bn254PairingPerPointGas,
            Bn254ScalarMulGas,
            EcrecoverGas,
            IdentityBaseGas,
            IdentityPerWordGas,
        )
        from ..witness.rlc import RLC

        assert value == 0, "tracer: precompile calls must carry no value"
        assert self.persistent, (
            "tracer: precompile calls inside reverting frames unsupported "
            "(the transfer mirrors would need reference-incoherent offsets)")
        rw = self.rw
        inp = bytes(self.memory.get(cd_offset + i, 0) for i in range(cd_length))

        # execute the precompile on the host
        aux = None
        if target == 1:  # ECRECOVER
            assert cd_length == 128, "tracer: ecrecover needs 128-byte calldata"
            msg_hash = int.from_bytes(inp[0:32], "big")
            v = int.from_bytes(inp[32:64], "big")
            r = int.from_bytes(inp[64:96], "big")
            s = int.from_bytes(inp[96:128], "big")
            pub = secp256k1.recover(msg_hash, v - 27, r, s)
            addr = (int.from_bytes(
                keccak256(secp256k1.pubkey_bytes(pub))[-20:], "big")
                if pub is not None else 0)
            output = addr.to_bytes(32, "big") if addr else b""
            ret_len = 32 if addr else 0
            prec_gas = EcrecoverGas
            state = ExecutionState.ECRECOVER
            ib = b"".join(int(x).to_bytes(32, "little")
                          for x in (msg_hash, v, r, s))
            input_rlc = RLC(bytes(reversed(ib)), self.keccak_r, n_bytes=128).expr()
            output_rlc = RLC(bytes(reversed(addr.to_bytes(32, "little"))),
                             self.keccak_r, n_bytes=32).expr()
            from ..evm.execution.precompiles import PrecompileAuxData

            aux = (PrecompileAuxData(msg_hash=msg_hash, sig_v=v, sig_r=r,
                                     sig_s=s, recovered_addr=addr,
                                     input_rlc=input_rlc, output_rlc=output_rlc),
                   self.keccak_r)
            if pub is not None:
                from ..circuits.sig import SigRow

                self.w.sig_rows.append(
                    SigRow.assign((v - 27, r, s), pub, inp[0:32]))
        elif target == 4:  # DATACOPY (identity)
            assert rd_offset == 0 and rd_length == cd_length, (
                "tracer: identity calls need rd_offset == 0 and "
                "rd_length == cd_length (dataCopy.py length-expression quirk)")
            assert cd_offset == 0 or cd_offset >= cd_length, (
                "tracer: identity calldata region must equal or be disjoint "
                "from the return region — the dataCopy gadget's copy events "
                "(dataCopy.py:38-62) re-read the input AFTER the callop "
                "return-region write, so a partial overlap cannot form a "
                "read-consistent integrated witness")
            output = inp
            ret_len = cd_length
            prec_gas = IdentityBaseGas + IdentityPerWordGas * ((cd_length + 31) // 32)
            state = ExecutionState.DATACOPY
        elif target == 6:  # BN254 ADD
            assert cd_length == 128
            px, py, qx, qy = (int.from_bytes(inp[i:i + 32], "big")
                              for i in range(0, 128, 32))
            out = bn254.g1_add(None if px == py == 0 else (px, py),
                               None if qx == qy == 0 else (qx, qy))
            ox, oy = (0, 0) if out is None else out
            output = ox.to_bytes(32, "big") + oy.to_bytes(32, "big")
            ret_len = 64
            prec_gas = Bn254AddGas
            state = ExecutionState.BN254_ADD
            aux = (px, py, qx, qy, ox, oy)
            from ..circuits.ecc import EcAdd

            self._ecc_circuit().append_add(EcAdd(p=(px, py), q=(qx, qy),
                                                 out=(ox, oy)))
        elif target == 7:  # BN254 SCALAR MUL
            assert cd_length == 96
            px = int.from_bytes(inp[0:32], "big")
            py = int.from_bytes(inp[32:64], "big")
            s_ = int.from_bytes(inp[64:96], "big")
            out = bn254.g1_mul(None if px == py == 0 else (px, py), s_)
            ox, oy = (0, 0) if out is None else out
            output = ox.to_bytes(32, "big") + oy.to_bytes(32, "big")
            ret_len = 64
            prec_gas = Bn254ScalarMulGas
            state = ExecutionState.BN254_SCALAR_MUL
            aux = (px, py, s_, ox, oy)
            from ..circuits.ecc import EcMul

            self._ecc_circuit().append_mul(EcMul(p=(px, py), s=s_, out=(ox, oy)))
        elif target == 8:  # BN254 PAIRING
            assert cd_length % 192 == 0
            n_pairs = cd_length // 192
            pts, g1s, g2s = [], [], []
            for k in range(n_pairs):
                c = inp[k * 192:(k + 1) * 192]
                p_x, p_y, q_x2, q_x1, q_y2, q_y1 = (
                    int.from_bytes(c[i:i + 32], "big") for i in range(0, 192, 32))
                pts.append((p_x, p_y, q_x2, q_x1, q_y2, q_y1))
                g1s.append((p_x, p_y))
                g2s.append((q_x2, q_x1, q_y2, q_y1))
            ok = bn254.pairing_check(list(zip(
                [None if x == y == 0 else (x, y) for x, y in g1s],
                [None if all(v == 0 for v in g2) else
                 (bn254.FQ2([g2[1], g2[0]]), bn254.FQ2([g2[3], g2[2]]))
                 for g2 in g2s],
            )))
            output = int(ok).to_bytes(32, "big")
            ret_len = 32
            prec_gas = Bn254PairingBaseGas + n_pairs * Bn254PairingPerPointGas
            state = ExecutionState.BN254_PAIRING
            ib = bytearray()
            for (p_x, p_y, q_x2, q_x1, q_y2, q_y1) in pts:
                for vv in (p_x, p_y, q_x1, q_x2, q_y1, q_y2):
                    ib.extend(vv.to_bytes(32, "little"))
            input_rlc = RLC(bytes(reversed(ib)), self.keccak_r,
                            n_bytes=n_pairs * 192).expr()
            aux = (input_rlc, n_pairs, 1, int(ok))
            from ..circuits.ecc import EcPairing

            self._ecc_circuit().append_pairing(
                EcPairing(g1_pts=g1s, g2_pts=g2s, out=int(ok)))
        else:
            raise NotImplementedError(f"tracer: precompile 0x{target:02x}")

        # the CALL_OP step's aux carries (input_len, return_len) for the
        # callop gadget's hints (callop.py:144-152)
        self.w.steps[-1].aux_data = (cd_length, ret_len)
        min_rd = min(ret_len, rd_length)

        # callee context writes (7, callop.py:157-169)
        for tag, v in (
            (CallContextFieldTag.IsSuccess, 1),
            (CallContextFieldTag.CalleeAddress, target),
            (CallContextFieldTag.CallerId, self.call_id),
            (CallContextFieldTag.CallDataOffset, cd_offset),
            (CallContextFieldTag.CallDataLength, cd_length),
            (CallContextFieldTag.ReturnDataOffset, rd_offset),
            (CallContextFieldTag.ReturnDataLength, rd_length),
        ):
            rw.call_context_write(callee_call_id, tag, v)
        # caller context saves (8, callop.py:171-184)
        resume_gas = self.gas_left - gas_cost - callee_gas
        for tag, v in (
            (CallContextFieldTag.ProgramCounter, self.pc + 1),
            (CallContextFieldTag.StackPointer, 1024 - len(self.stack)),
            (CallContextFieldTag.GasLeft, resume_gas),
            (CallContextFieldTag.MemorySize, next_mws),
            (CallContextFieldTag.ReversibleWriteCounter, self.rev),
            (CallContextFieldTag.LastCalleeId, callee_call_id),
            (CallContextFieldTag.LastCalleeReturnDataOffset, 0),
            (CallContextFieldTag.LastCalleeReturnDataLength, ret_len),
        ):
            rw.call_context_write(self.call_id, tag, v)

        # copy events (callop.py:187-226): input -> RlcAcc; output -> RlcAcc;
        # output -> caller's return region.  The callee's output bytes are
        # preloaded by prologue memory writes so their first rw access is a
        # write (state-circuit rule); see trace_block.
        callee_mem = {i: output[i] for i in range(ret_len)}
        for i in range(ret_len):
            self.w.memory_setups.append((callee_call_id, i, output[i]))
        if cd_length:
            src_data = {cd_offset + i: inp[i] for i in range(cd_length)}
            self.w.copy_circuit.copy(
                self.copy_r, rw, self.call_id, CopyDataTypeTag.Memory,
                callee_call_id, CopyDataTypeTag.RlcAcc, cd_offset,
                cd_offset + cd_length, 0, cd_length, src_data,
            )
        if ret_len:
            self.w.copy_circuit.copy(
                self.copy_r, rw, callee_call_id, CopyDataTypeTag.Memory,
                callee_call_id, CopyDataTypeTag.RlcAcc, 0, ret_len,
                0, ret_len, dict(callee_mem),
            )
            self.w.copy_circuit.copy(
                self.copy_r, rw, callee_call_id, CopyDataTypeTag.Memory,
                self.call_id, CopyDataTypeTag.Memory, 0, min_rd,
                rd_offset, min_rd, dict(callee_mem),
            )
            for i in range(min_rd):
                self.memory[rd_offset + i] = output[i]

        # the precompile execution step: pc advances by 1 and the stack
        # pointer carries over unchanged (callop.py:242-243 Transition
        # delta(1)/same) — reference precompile steps are witness-odd this way
        call_step = self.w.steps[-1]
        prec_mws = (min_rd + 31) // 32
        self.w.steps.append(StepState(
            state, rw.rw_counter, call_id=callee_call_id, is_root=False,
            code_hash=int(EMPTY_CODE_HASH),
            program_counter=call_step.program_counter + 1,
            stack_pointer=call_step.stack_pointer, gas_left=callee_gas,
            memory_word_size=prec_mws, reversible_write_counter=2,
            log_id=self.log_count, aux_data=aux,
        ))

        # the precompile gadget's own rows + caller restore
        saved = {
            "call_id": self.call_id, "is_root": self.is_root,
            "code_hash": self.code_hash, "resume_pc": self.pc + 1,
            "stack": self.stack, "resume_gas": resume_gas,
            "resume_mws": next_mws, "resume_rev": self.rev,
        }
        prev_call_id, self.call_id = self.call_id, callee_call_id
        if target == 4:
            self.cc_read(CallContextFieldTag.CalleeAddress, target)
            self.cc_read(CallContextFieldTag.CallerId, prev_call_id)
            self.cc_read(CallContextFieldTag.CallDataOffset, cd_offset)
            self.cc_read(CallContextFieldTag.CallDataLength, cd_length)
            self.cc_read(CallContextFieldTag.ReturnDataOffset, rd_offset)
            self.cc_read(CallContextFieldTag.ReturnDataLength, rd_length)
            # dataCopy's two copy events (dataCopy.py:38-62)
            src_data = {cd_offset + i: inp[i] for i in range(cd_length)}
            self.w.copy_circuit.copy(
                self.copy_r, rw, prev_call_id, CopyDataTypeTag.Memory,
                prev_call_id, CopyDataTypeTag.Memory, cd_offset,
                cd_offset + cd_length, rd_offset, cd_length, src_data,
            )
            self.w.copy_circuit.copy(
                self.copy_r, rw, prev_call_id, CopyDataTypeTag.Memory,
                callee_call_id, CopyDataTypeTag.Memory, cd_offset,
                cd_offset + cd_length, 0, cd_length, dict(src_data),
            )
            restore_reads_caller_id = False
        else:
            self.cc_read(CallContextFieldTag.IsSuccess, 1)
            if target == 8:  # ecPairing also reads CallDataLength
                self.cc_read(CallContextFieldTag.CallDataLength, cd_length)
            self.cc_read(CallContextFieldTag.CalleeAddress, target)
            restore_reads_caller_id = True
        self._restore_context_rows(saved, (callee_call_id, 0, ret_len),
                                   read_caller_id=restore_reads_caller_id)
        self.call_id = prev_call_id
        self.gas_left = resume_gas + (callee_gas - prec_gas)
        self.mws = next_mws
        self.last_callee = (callee_call_id, 0, ret_len)
        self.pc += 1

    def _enter_precompile_oog(self, op, target, callee_call_id, callee_anchor,
                              callee_pending, cd_offset, cd_length, rd_offset,
                              rd_length, gas_cost, callee_gas, next_mws):
        """Precompile call with insufficient gas: the callop gadget's
        precompile branch (IsSuccess=0, no output copies) followed by an
        ErrorOutOfGasPrecompile step in the callee frame that restores the
        caller's context and burns all callee gas
        (reference execution/error_oog_precompile.py; the reference leaves
        this state unreachable from callop — see the documented deviation in
        evm/execution/callop.py)."""
        from ..ops.keccak import EMPTY_CODE_HASH

        assert self.persistent, (
            "tracer: OOG precompile calls inside reverting frames unsupported")
        if target == 4:
            # PrecompileGadget pins identity's return length to its calldata
            # length, which a failed call (return 0 bytes) can only satisfy
            # with empty calldata (reference precompile_gadget.py:24)
            assert cd_length == 0, (
                "tracer: OOG identity calls need empty calldata")
        rw = self.rw
        self.w.steps[-1].aux_data = (cd_length, 0)

        # callee context writes (7, callop.py:157-169), failed call
        for tag, v in (
            (CallContextFieldTag.IsSuccess, 0),
            (CallContextFieldTag.CalleeAddress, target),
            (CallContextFieldTag.CallerId, self.call_id),
            (CallContextFieldTag.CallDataOffset, cd_offset),
            (CallContextFieldTag.CallDataLength, cd_length),
            (CallContextFieldTag.ReturnDataOffset, rd_offset),
            (CallContextFieldTag.ReturnDataLength, rd_length),
        ):
            rw.call_context_write(callee_call_id, tag, v)
        # caller context saves (8, callop.py:171-184); no return data
        resume_gas = self.gas_left - gas_cost - callee_gas
        for tag, v in (
            (CallContextFieldTag.ProgramCounter, self.pc + 1),
            (CallContextFieldTag.StackPointer, 1024 - len(self.stack)),
            (CallContextFieldTag.GasLeft, resume_gas),
            (CallContextFieldTag.MemorySize, next_mws),
            (CallContextFieldTag.ReversibleWriteCounter, self.rev),
            (CallContextFieldTag.LastCalleeId, callee_call_id),
            (CallContextFieldTag.LastCalleeReturnDataOffset, 0),
            (CallContextFieldTag.LastCalleeReturnDataLength, 0),
        ):
            rw.call_context_write(self.call_id, tag, v)
        # input copy event (callop.py:187-199); no output/return copies
        if cd_length:
            inp = bytes(self.memory.get(cd_offset + i, 0)
                        for i in range(cd_length))
            src_data = {cd_offset + i: inp[i] for i in range(cd_length)}
            self.w.copy_circuit.copy(
                self.copy_r, rw, self.call_id, CopyDataTypeTag.Memory,
                callee_call_id, CopyDataTypeTag.RlcAcc, cd_offset,
                cd_offset + cd_length, 0, cd_length, src_data,
            )

        # the ErrorOutOfGasPrecompile step in the callee frame
        call_step = self.w.steps[-1]
        self.w.steps.append(StepState(
            ExecutionState.ErrorOutOfGasPrecompile, rw.rw_counter,
            call_id=callee_call_id, is_root=False,
            code_hash=int(EMPTY_CODE_HASH),
            program_counter=call_step.program_counter + 1,
            stack_pointer=call_step.stack_pointer, gas_left=callee_gas,
            memory_word_size=0, reversible_write_counter=2,
            log_id=self.log_count,
        ))

        saved = {
            "call_id": self.call_id, "is_root": self.is_root,
            "code_hash": self.code_hash, "resume_pc": self.pc + 1,
            "stack": self.stack, "resume_gas": resume_gas,
            "resume_mws": next_mws, "resume_rev": self.rev,
        }
        prev_call_id, self.call_id = self.call_id, callee_call_id
        # gadget rows: CalleeAddress + CallDataLength reads, then
        # constrain_error_state's IsSuccess read and the caller restore
        self.cc_read(CallContextFieldTag.CalleeAddress, target)
        self.cc_read(CallContextFieldTag.CallDataLength, cd_length)
        self.cc_read(CallContextFieldTag.IsSuccess, 0)
        self._restore_context_rows(saved, (callee_call_id, 0, 0))
        # the callee frame failed: its two reversible-write slots revert in
        # the counters the error gadget skipped
        caller_pending, caller_anchor = self.pending, self.anchor
        self.pending, self.anchor = list(callee_pending), callee_anchor
        self._materialize_reversion()
        self.pending, self.anchor = caller_pending, caller_anchor

        self.call_id = prev_call_id
        self.gas_left = resume_gas  # all callee gas is consumed
        self.mws = next_mws
        self.last_callee = (callee_call_id, 0, 0)
        self.pc += 1

    def _ecc_circuit(self):
        if self.w.ecc_circuit is None:
            from ..circuits.ecc import EccCircuit

            self.w.ecc_circuit = EccCircuit(8, 8, 4)
        return self.w.ecc_circuit

    def op_returndatacopy(self, op):
        memory_offset = self.spop()
        data_offset = self.spop()
        size = self.spop()
        last_id, rdo, rdl = self.last_callee
        self.cc_read(CallContextFieldTag.LastCalleeId, last_id)
        self.cc_read(CallContextFieldTag.LastCalleeReturnDataLength, rdl)
        self.cc_read(CallContextFieldTag.LastCalleeReturnDataOffset, rdo)
        self._expand_dyn(memory_offset if size else 0, size)
        self._copier_gas(size)
        if size:
            src_mem = self.memories[last_id]
            src_base = rdo + data_offset
            src_data = {src_base + i: src_mem.get(src_base + i, 0)
                        for i in range(size)}
            self.w.copy_circuit.copy(
                self.copy_r, self.rw, last_id, CopyDataTypeTag.Memory,
                self.call_id, CopyDataTypeTag.Memory, src_base, rdo + size,
                memory_offset, size, src_data,
            )
            for i in range(size):
                self.memory[memory_offset + i] = src_mem.get(src_base + i, 0)
        self.pc += 1

    # -- handlers -----------------------------------------------------------

    def op_stop(self, op):
        self.cc_read(CallContextFieldTag.IsSuccess, 1)
        if self.is_root:
            self.stopped = True
            return
        saved = self.frames[-1]
        last_callee = (self.call_id, 0, 0)
        self._restore_context_rows(saved, last_callee)
        self._pop_frame(last_callee)

    def op_push(self, op):
        n = get_push_size(op)
        v = int.from_bytes(self.code.code[self.pc + 1: self.pc + 1 + n], "big")
        self.spush(v)
        self.pc += 1 + n

    def op_dup(self, op):
        x = int(op) - int(Opcode.DUP1) + 1
        sp = 1024 - len(self.stack)
        v = self.stack[-x]
        self.rw.stack_read(self.call_id, sp + x - 1, v)
        self.spush(v)
        self.pc += 1

    def op_swap(self, op):
        n = int(op) - int(Opcode.SWAP1) + 1
        sp = 1024 - len(self.stack)
        top, deep = self.stack[-1], self.stack[-1 - n]
        self.rw.stack_read(self.call_id, sp, top)
        self.rw.stack_read(self.call_id, sp + n, deep)
        self.rw.stack_write(self.call_id, sp, deep)
        self.rw.stack_write(self.call_id, sp + n, top)
        self.stack[-1], self.stack[-1 - n] = deep, top
        self.pc += 1

    def op_pop(self, op):
        self.spop()
        self.pc += 1

    def op_alu(self, op):
        a = self.spop()
        if op in (Opcode.NOT, Opcode.ISZERO):
            out = (a ^ U256M) if op == Opcode.NOT else int(a == 0)
        else:
            b = self.spop()
            out = _ALU_BINARY[op](a, b)
        self.spush(out)
        self.pc += 1

    def op_mod3(self, op):
        a, b, n = self.spop(), self.spop(), self.spop()
        if n == 0:
            out = 0
        elif op == Opcode.ADDMOD:
            out = (a + b) % n
        else:
            out = (a * b) % n
        self.spush(out)
        self.pc += 1

    def op_exp(self, op):
        base, exponent = self.spop(), self.spop()
        out = pow(base, exponent, 1 << 256)
        self.spush(out)
        if exponent > 1:
            identifier = self.w.steps[-1].rw_counter + 3
            self.w.exp_circuit.add_event(base, exponent, identifier)
        self.gas_left -= GAS_COST_EXP_PER_BYTE * _byte_size(exponent)
        self.pc += 1

    def op_signextend(self, op):
        i, x = self.spop(), self.spop()
        if i < 31:
            bit = 8 * i + 7
            if (x >> bit) & 1:
                out = x | (U256M - ((1 << (bit + 1)) - 1))
            else:
                out = x & ((1 << (bit + 1)) - 1)
        else:
            out = x
        self.spush(out)
        self.pc += 1

    def op_memory(self, op):
        rw, call_id = self.rw, self.call_id
        if op == Opcode.MLOAD:
            offset = self.spop()
            value = int.from_bytes(self._mem_bytes(offset, 32), "big")
            self.spush(value)
            for i in range(32):
                rw.memory_read(call_id, offset + i, self.memory.get(offset + i, 0))
            address = offset + 32
        else:
            offset = self.spop()
            value = self.spop()
            if op == Opcode.MSTORE8:
                self.memory[offset] = value & 0xFF
                rw.memory_write(call_id, offset, value & 0xFF)
                address = offset + 1
            else:
                for i in range(32):
                    b = (value >> (8 * (31 - i))) & 0xFF
                    self.memory[offset + i] = b
                    rw.memory_write(call_id, offset + i, b)
                address = offset + 32
        # the MEMORY gadget passes curr.memory_word_size as the "offset" of
        # memory_expansion (reference memory.py:22-24, instruction.py:1138-
        # 1145), so the expansion target includes the current size — mirrored
        computed = (address + self.mws + 31) // 32
        next_size = max(self.mws, computed)
        self.gas_left -= (
            3 * (next_size - self.mws)
            + next_size * next_size // 512 - self.mws * self.mws // 512
        )
        self.mws = next_size
        self.pc += 1

    def op_msize(self, op):
        self.spush(self.mws * 32)
        self.pc += 1

    def op_gas(self, op):
        self.spush(self.gas_left)  # gas AFTER the constant cost
        self.pc += 1

    def op_pc(self, op):
        self.spush(self.pc)
        self.pc += 1

    def op_jumpdest(self, op):
        self.pc += 1

    def op_jump(self, op):
        dest = self.spop()
        self.pc = dest

    def op_jumpi(self, op):
        dest = self.spop()
        cond = self.spop()
        self.pc = dest if cond != 0 else self.pc + 1

    def op_sload(self, op):
        addr = self.callee_address
        self.cc_read(CallContextFieldTag.TxId, self.tx_id)
        self.reversion_reads()
        self.cc_read(CallContextFieldTag.CalleeAddress, addr)
        key = self.spop()
        skey = (addr, key)
        value = self.storage.get(skey, 0)
        committed = self.committed.setdefault(skey, value)
        self.rw.account_storage_read(addr, key, value, self.tx_id,
                                     committed)
        self.spush(value)
        warm = skey in self.warm_slot
        self.rw.tx_access_list_account_storage_write(
            self.tx_id, addr, key, True, warm)
        self._mirror_last()
        self.warm_slot.add(skey)
        self.rev += 1
        self.gas_left -= WARM_STORAGE_READ_COST if warm else COLD_SLOAD_COST
        self.pc += 1

    def op_sstore(self, op):
        addr = self.callee_address
        self.cc_read(CallContextFieldTag.TxId, self.tx_id)
        self.cc_read(CallContextFieldTag.IsStatic, self.is_static)
        self.reversion_reads()
        self.cc_read(CallContextFieldTag.CalleeAddress, addr)
        key = self.spop()
        value = self.spop()
        skey = (addr, key)
        value_prev = self.storage.get(skey, 0)
        original = self.committed.setdefault(skey, value_prev)
        self.rw.account_storage_write(addr, key, value, value_prev,
                                      self.tx_id, original)
        self._mirror_last()
        self.storage[skey] = value
        warm = skey in self.warm_slot
        self.rw.tx_access_list_account_storage_write(
            self.tx_id, addr, key, True, warm)
        self._mirror_last()
        self.warm_slot.add(skey)

        # EIP-3529 refund schedule (reference storage.py:88-131)
        refund_prev = self.refund
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
        self.rw.tx_refund_write(self.tx_id, refund, refund_prev)
        self._mirror_last()
        self.refund = refund
        self.rev += 3

        if value == value_prev or value_prev != original:
            warm_gas = SLOAD_GAS
        elif original == 0:
            warm_gas = SSTORE_SET_GAS
        else:
            warm_gas = SSTORE_RESET_GAS
        self.gas_left -= warm_gas if warm else warm_gas + COLD_SLOAD_COST
        self.pc += 1

    # context / env queries
    def op_address(self, op):
        self.cc_read(CallContextFieldTag.CalleeAddress, self.callee_address)
        self.spush(self.callee_address)
        self.pc += 1

    def op_caller(self, op):
        self.cc_read(CallContextFieldTag.CallerAddress, self.caller_address)
        self.spush(self.caller_address)
        self.pc += 1

    def op_callvalue(self, op):
        self.cc_read(CallContextFieldTag.Value, self.value)
        self.spush(self.value)
        self.pc += 1

    def op_calldatasize(self, op):
        self.cc_read(CallContextFieldTag.CallDataLength, len(self.calldata))
        self.spush(len(self.calldata))
        self.pc += 1

    def op_returndatasize(self, op):
        self.cc_read(CallContextFieldTag.LastCalleeReturnDataLength,
                     self.last_callee[2])
        self.spush(self.last_callee[2])
        self.pc += 1

    def op_codesize(self, op):
        self.spush(len(self.code.code))
        self.pc += 1

    def op_gasprice(self, op):
        self.cc_read(CallContextFieldTag.TxId, self.tx_id)
        self.spush(self.tx.gas_price)
        self.pc += 1

    def op_origin(self, op):
        self.cc_read(CallContextFieldTag.TxId, self.tx_id)
        self.spush(self.tx.caller_address)
        self.pc += 1

    def op_selfbalance(self, op):
        addr = self.callee_address
        self.cc_read(CallContextFieldTag.CalleeAddress, addr)
        bal = self.balances.get(addr, 0)
        self.rw.account_read(addr, AccountFieldTag.Balance, bal)
        self.spush(bal)
        self.pc += 1

    def op_blockctx(self, op):
        v = {
            Opcode.COINBASE: self.block.coinbase,
            Opcode.TIMESTAMP: self.block.timestamp,
            Opcode.NUMBER: self.block.number,
            Opcode.GASLIMIT: self.block.gas_limit,
            Opcode.PREVRANDAO: self.block.prev_randao,
            Opcode.BASEFEE: self.block.base_fee,
            Opcode.CHAINID: self.block.chainid,
        }[op]
        self.spush(v)
        self.pc += 1

    def op_blockhash(self, op):
        number = self.spop()
        cur = self.block.number
        if number < cur and cur <= 256 + number:
            idx = cur - number - 1  # history_hashes is most-recent-last
            assert idx < len(self.block.history_hashes), (
                f"tracer: BLOCKHASH of block {number} is inside the 256-"
                f"block window but the Block witness records only "
                f"{len(self.block.history_hashes)} history hashes — the "
                "gadget's block-table lookup needs the hash; extend "
                "Block(history_hashes=...)")
            value = self.block.history_hashes[-1 - idx]
        else:
            value = 0
        self.spush(value)
        self.pc += 1

    def _access_account(self, addr: int):
        """TxId + reversion reads + access-list write; returns prior warmth."""
        self.cc_read(CallContextFieldTag.TxId, self.tx_id)
        self.reversion_reads()
        warm = addr in self.warm_addr
        self.rw.tx_access_list_account_write(self.tx_id, addr, True, warm)
        self._mirror_last()
        self.rev += 1
        self.warm_addr.add(addr)
        self.gas_left -= 0 if warm else EXTRA_GAS_COST_ACCOUNT_COLD_ACCESS
        return warm

    def op_balance(self, op):
        addr = self.spop()
        self._access_account(addr)
        code_hash = self._account_code_hash(addr)
        self.rw.account_read(addr, AccountFieldTag.CodeHash, code_hash)
        if code_hash != 0:
            bal = self.balances.get(addr, 0)
            self.rw.account_read(addr, AccountFieldTag.Balance, bal)
        else:
            bal = 0
        self.spush(bal)
        self.pc += 1

    def op_extcodesize(self, op):
        addr = self.spop()
        self._access_account(addr)
        code_hash = self._account_code_hash(addr)
        self.rw.account_read(addr, AccountFieldTag.CodeHash, code_hash)
        if code_hash != 0 and addr in self.codes:
            size = len(self.codes[addr].code)
        else:
            size = 0
        if code_hash != 0 and addr not in self.codes:
            # existing but codeless account: bytecode_length of EMPTY hash
            self._register_code(Bytecode(bytearray()))
        self.spush(size)
        self.pc += 1

    def op_extcodehash(self, op):
        addr = self.spop()
        self._access_account(addr)
        code_hash = self._account_code_hash(addr)
        self.rw.account_read(addr, AccountFieldTag.CodeHash, code_hash)
        self.spush(code_hash)
        self.pc += 1

    def op_calldataload(self, op):
        offset = self.spop()
        data = self.calldata
        if self.is_root:
            self.cc_read(CallContextFieldTag.TxId, self.tx_id)
            self.cc_read(CallContextFieldTag.CallDataLength, len(data))
        else:
            self.cc_read(CallContextFieldTag.CallerId, self.caller_frame_id)
            self.cc_read(CallContextFieldTag.CallDataLength, len(data))
            self.cc_read(CallContextFieldTag.CallDataOffset, self.cd_offset_abs)
            # in-bounds bytes are read from the caller's memory
            src_addr = self.cd_offset_abs + offset
            src_end = self.cd_offset_abs + len(data)
            caller_mem = self.frames[-1]["memory"]
            for i in range(32):
                if src_addr + i < src_end:
                    self.rw.memory_read(self.caller_frame_id, src_addr + i,
                                        caller_mem.get(src_addr + i, 0))
        word = bytes(data[offset + i] if offset + i < len(data) else 0
                     for i in range(32))
        # the gadget packs the read-order bytes LITTLE-endian into the word,
        # mirroring the reference (calldataload.py:49-52)
        self.spush(int.from_bytes(word, "little"))
        self.pc += 1

    def op_calldatacopy(self, op):
        memory_offset = self.spop()
        data_offset = self.spop()
        length = self.spop()
        data = self.calldata
        if self.is_root:
            self.cc_read(CallContextFieldTag.TxId, self.tx_id)
            self.cc_read(CallContextFieldTag.CallDataLength, len(data))
        else:
            self.cc_read(CallContextFieldTag.CallerId, self.caller_frame_id)
            self.cc_read(CallContextFieldTag.CallDataLength, len(data))
            self.cc_read(CallContextFieldTag.CallDataOffset, self.cd_offset_abs)
        self._expand_dyn(memory_offset if length else 0, length)
        self._copier_gas(length)
        if length:
            if self.is_root:
                src_data = {data_offset + i: data[data_offset + i]
                            for i in range(length)
                            if data_offset + i < len(data)}
                self.w.copy_circuit.copy(
                    self.copy_r, self.rw, self.tx_id, CopyDataTypeTag.TxCalldata,
                    self.call_id, CopyDataTypeTag.Memory, data_offset, len(data),
                    memory_offset, length, src_data,
                )
            else:
                caller_mem = self.frames[-1]["memory"]
                src_base = self.cd_offset_abs + data_offset
                src_end = self.cd_offset_abs + len(data)
                src_data = {src_base + i: caller_mem.get(src_base + i, 0)
                            for i in range(length) if src_base + i < src_end}
                self.w.copy_circuit.copy(
                    self.copy_r, self.rw, self.caller_frame_id,
                    CopyDataTypeTag.Memory, self.call_id,
                    CopyDataTypeTag.Memory, src_base, src_end,
                    memory_offset, length, src_data,
                )
            for i in range(length):
                b = data[data_offset + i] if data_offset + i < len(data) else 0
                self.memory[memory_offset + i] = b
        self.pc += 1

    def op_codecopy(self, op):
        memory_offset = self.spop()
        code_offset = self.spop()
        size = self.spop()
        self._expand_dyn(memory_offset if size else 0, size)
        self._copier_gas(size)
        if size:
            code = self.code.code
            is_code = self.code.is_code
            src_data = {code_offset + i: (code[code_offset + i],
                                          int(is_code[code_offset + i]))
                        for i in range(size) if code_offset + i < len(code)}
            self.w.copy_circuit.copy(
                self.copy_r, self.rw, self.code_hash, CopyDataTypeTag.Bytecode,
                self.call_id, CopyDataTypeTag.Memory, code_offset, len(code),
                memory_offset, size, src_data,
            )
            for i in range(size):
                b = code[code_offset + i] if code_offset + i < len(code) else 0
                self.memory[memory_offset + i] = b
        self.pc += 1

    def op_extcodecopy(self, op):
        addr = self.spop()
        memory_offset = self.spop()
        code_offset = self.spop()
        size = self.spop()
        self._access_account(addr)
        code_hash = self._account_code_hash(addr)
        self.rw.account_read(addr, AccountFieldTag.CodeHash, code_hash)
        self._expand_dyn(memory_offset if size else 0, size)
        self._copier_gas(size)
        ext = self.codes.get(addr)
        code = ext.code if ext is not None else b""
        is_code = ext.is_code if ext is not None else []
        if code_hash != 0 and ext is None:
            self._register_code(Bytecode(bytearray()))
        if size:
            src_data = {code_offset + i: (code[code_offset + i],
                                          int(is_code[code_offset + i]))
                        for i in range(size) if code_offset + i < len(code)}
            self.w.copy_circuit.copy(
                self.copy_r, self.rw, code_hash, CopyDataTypeTag.Bytecode,
                self.call_id, CopyDataTypeTag.Memory, code_offset, len(code),
                memory_offset, size, src_data,
            )
            for i in range(size):
                b = code[code_offset + i] if code_offset + i < len(code) else 0
                self.memory[memory_offset + i] = b
        self.pc += 1

    def op_sha3(self, op):
        offset = self.spop()
        length = self.spop()
        data = self._mem_bytes(offset, length)
        out = int.from_bytes(keccak256(data), "big")
        self.spush(out)
        if length:
            src_data = {offset + i: data[i] for i in range(length)}
            self.w.copy_circuit.copy(
                self.copy_r, self.rw, self.call_id, CopyDataTypeTag.Memory,
                self.call_id, CopyDataTypeTag.RlcAcc, offset, offset + length,
                0, length, src_data,
            )
        self.w.sha3_preimages.append(data)
        self._expand_dyn(offset if length else 0, length)
        self._copier_gas(length, GAS_COST_COPY_SHA3)
        self.pc += 1

    def op_log(self, op):
        mstart = self.spop()
        msize = self.spop()
        self.cc_read(CallContextFieldTag.TxId, self.tx_id)
        self.cc_read(CallContextFieldTag.IsStatic, self.is_static)
        self.cc_read(CallContextFieldTag.CalleeAddress, self.callee_address)
        persistent = self.persistent
        self.cc_read(CallContextFieldTag.IsPersistent, int(persistent))
        log_id = self.log_count + 1
        # logs of non-persistent frames are discarded: the gadget skips the
        # TxLog lookups and the data copy, and log_id does not advance
        # (log.py gates on is_persistent; log_id Transition.delta(is_persistent))
        if persistent:
            self.rw.tx_log_write(self.tx_id, log_id, TxLogFieldTag.Address, 0,
                                 self.callee_address)
        n_topics = int(op) - int(Opcode.LOG0)
        for i in range(n_topics):
            topic = self.spop()
            if persistent:
                self.rw.tx_log_write(self.tx_id, log_id, TxLogFieldTag.Topic, i, topic)
        if msize and persistent:
            data = self._mem_bytes(mstart, msize)
            src_data = {mstart + i: data[i] for i in range(msize)}
            self.w.copy_circuit.copy(
                self.copy_r, self.rw, self.call_id, CopyDataTypeTag.Memory,
                self.tx_id, CopyDataTypeTag.TxLog, mstart, mstart + msize,
                0, msize, src_data, log_id=log_id,
            )
        self._expand_dyn(mstart if msize else 0, msize)
        # dynamic gas carries the base 375 too (log.py: GAS_COST_LOG +
        # GAS_COST_LOG * n_topics; the opcode's constant gas is 0)
        self.gas_left -= GAS_COST_LOG * (1 + n_topics) + GAS_COST_LOGDATA * msize
        if persistent:
            self.log_count = log_id
        self.pc += 1

    def op_return_revert(self, op):
        # gadget order (return_revert.py): IsSuccess read precedes the pops
        is_return = op == Opcode.RETURN
        if not is_return:
            self._mark_failed()
        self.cc_read(CallContextFieldTag.IsSuccess, int(is_return))
        offset = self.spop()
        length = self.spop()

        if self.is_create_frame:
            # A. deploy the returned chunk as contract code — the gadget
            # emits these rows for REVERT too (is_create branch alone,
            # return_revert.py note at lines 27-31)
            from ..ops.keccak import EMPTY_HASH
            from ..utils.param import GAS_COST_CODE_DEPOSIT
            from .typing import init_is_code

            contract = self.callee_address
            self.cc_read(CallContextFieldTag.CalleeAddress, contract)
            self.rw.account_write(contract, AccountFieldTag.CodeHash,
                                  self.code_hash, int(EMPTY_HASH))
            deployed_bytes = bytearray(self._mem_bytes(offset, length))
            deployed = Bytecode(deployed_bytes)
            # model: deployment sticks only on RETURN (the unmirrored
            # account write is a reference quirk; see gadget docstring)
            if is_return:
                assert deployed.hash() == self.code_hash, (
                    "tracer: initcode must return its own bytes (the gadget "
                    "pins the deployed CodeHash to curr.code_hash, "
                    "return_revert.py:40)")
                self.codes[contract] = deployed
            else:
                assert length == 0, (
                    "tracer: REVERT with data in an initcode frame "
                    "unsupported (the gadget would register the revert data "
                    "as bytecode under the initcode hash)")
            self.gas_left -= length * GAS_COST_CODE_DEPOSIT
            if length:
                is_code = init_is_code(deployed_bytes)
                src_data = {offset + i: (deployed_bytes[i], int(is_code[i]))
                            for i in range(length)}
                self.w.copy_circuit.copy(
                    self.copy_r, self.rw, self.call_id, CopyDataTypeTag.Memory,
                    self.code_hash, CopyDataTypeTag.Bytecode, offset,
                    offset + length, 0, length, src_data,
                )

        if self.is_root:
            self.cc_read(CallContextFieldTag.IsPersistent, int(is_return))
            self._expand_dyn(offset if length else 0, length)
            if not is_return:
                self._materialize_reversion()
                self._rollback(self.snapshot)
            self.stopped = True
            return

        saved = self.frames[-1]
        if not self.is_create_frame:
            # D. return the memory chunk to the caller (return_revert.py:72-95)
            self.cc_read(CallContextFieldTag.ReturnDataOffset, self.rd_offset_abs)
            self.cc_read(CallContextFieldTag.ReturnDataLength, self.rd_length)
            copy_length = min(length, self.rd_length)
            if copy_length:
                src_data = {offset + i: self.memory.get(offset + i, 0)
                            for i in range(copy_length)}
                self.w.copy_circuit.copy(
                    self.copy_r, self.rw, self.call_id, CopyDataTypeTag.Memory,
                    saved["call_id"], CopyDataTypeTag.Memory, offset,
                    offset + length, self.rd_offset_abs, copy_length, src_data,
                )
                for i in range(copy_length):
                    saved["memory"][self.rd_offset_abs + i] = self.memory.get(offset + i, 0)
        self._expand_dyn(offset if length else 0, length)
        last_callee = (self.call_id, offset, length)
        self._restore_context_rows(saved, last_callee)
        if is_return:
            self._pop_frame(last_callee)
        else:
            self._materialize_reversion()
            self._rollback(self.snapshot)
            self._pop_frame(last_callee, success=False)


_ALU_BINARY = {
    Opcode.ADD: lambda a, b: (a + b) & U256M,
    Opcode.SUB: lambda a, b: (a - b) & U256M,
    Opcode.MUL: lambda a, b: (a * b) & U256M,
    Opcode.DIV: lambda a, b: a // b if b else 0,
    Opcode.MOD: lambda a, b: a % b if b else 0,
    Opcode.SDIV: lambda a, b: (abs(_signed(a)) // abs(_signed(b))
                               * (1 if (_signed(a) < 0) == (_signed(b) < 0) else -1)
                               ) & U256M if b else 0,
    Opcode.SMOD: lambda a, b: ((abs(_signed(a)) % abs(_signed(b)))
                               * (1 if _signed(a) >= 0 else -1)) & U256M if b else 0,
    Opcode.LT: lambda a, b: int(a < b),
    Opcode.GT: lambda a, b: int(a > b),
    Opcode.EQ: lambda a, b: int(a == b),
    Opcode.SLT: lambda a, b: int(_signed(a) < _signed(b)),
    Opcode.SGT: lambda a, b: int(_signed(a) > _signed(b)),
    Opcode.AND: lambda a, b: a & b,
    Opcode.OR: lambda a, b: a | b,
    Opcode.XOR: lambda a, b: a ^ b,
    Opcode.BYTE: lambda a, b: (b >> (8 * (31 - a))) & 0xFF if a < 32 else 0,
    Opcode.SHL: lambda a, b: (b << a) & U256M if a < 256 else 0,
    Opcode.SHR: lambda a, b: b >> a if a < 256 else 0,
    Opcode.SAR: lambda a, b: (_signed(b) >> a) & U256M if a < 256
    else (U256M if _signed(b) < 0 else 0),
}

_BLOCK_CTX_OPS = (Opcode.COINBASE, Opcode.TIMESTAMP, Opcode.NUMBER,
                  Opcode.GASLIMIT, Opcode.PREVRANDAO, Opcode.BASEFEE,
                  Opcode.CHAINID)

_HANDLERS = {
    Opcode.STOP: _Tracer.op_stop,
    Opcode.POP: _Tracer.op_pop,
    Opcode.EXP: _Tracer.op_exp,
    Opcode.SIGNEXTEND: _Tracer.op_signextend,
    Opcode.MLOAD: _Tracer.op_memory,
    Opcode.MSTORE: _Tracer.op_memory,
    Opcode.MSTORE8: _Tracer.op_memory,
    Opcode.MSIZE: _Tracer.op_msize,
    Opcode.GAS: _Tracer.op_gas,
    Opcode.PC: _Tracer.op_pc,
    Opcode.JUMPDEST: _Tracer.op_jumpdest,
    Opcode.JUMP: _Tracer.op_jump,
    Opcode.JUMPI: _Tracer.op_jumpi,
    Opcode.SLOAD: _Tracer.op_sload,
    Opcode.SSTORE: _Tracer.op_sstore,
    Opcode.ADDRESS: _Tracer.op_address,
    Opcode.CALLER: _Tracer.op_caller,
    Opcode.CALLVALUE: _Tracer.op_callvalue,
    Opcode.CALLDATASIZE: _Tracer.op_calldatasize,
    Opcode.CALLDATALOAD: _Tracer.op_calldataload,
    Opcode.CALLDATACOPY: _Tracer.op_calldatacopy,
    Opcode.RETURNDATASIZE: _Tracer.op_returndatasize,
    Opcode.CODESIZE: _Tracer.op_codesize,
    Opcode.CODECOPY: _Tracer.op_codecopy,
    Opcode.GASPRICE: _Tracer.op_gasprice,
    Opcode.ORIGIN: _Tracer.op_origin,
    Opcode.SELFBALANCE: _Tracer.op_selfbalance,
    Opcode.BLOCKHASH: _Tracer.op_blockhash,
    Opcode.BALANCE: _Tracer.op_balance,
    Opcode.EXTCODESIZE: _Tracer.op_extcodesize,
    Opcode.EXTCODECOPY: _Tracer.op_extcodecopy,
    Opcode.EXTCODEHASH: _Tracer.op_extcodehash,
    Opcode.SHA3: _Tracer.op_sha3,
    Opcode.LOG0: _Tracer.op_log,
    Opcode.LOG1: _Tracer.op_log,
    Opcode.LOG2: _Tracer.op_log,
    Opcode.LOG3: _Tracer.op_log,
    Opcode.LOG4: _Tracer.op_log,
    Opcode.RETURN: _Tracer.op_return_revert,
    Opcode.REVERT: _Tracer.op_return_revert,
    Opcode.RETURNDATACOPY: _Tracer.op_returndatacopy,
    Opcode.CREATE: _Tracer.op_create,
    Opcode.CREATE2: _Tracer.op_create,
    Opcode.CALL: _Tracer.op_callop,
    Opcode.CALLCODE: _Tracer.op_callop,
    Opcode.DELEGATECALL: _Tracer.op_callop,
    Opcode.STATICCALL: _Tracer.op_callop,
}

# -- hot-path dispatch tables -------------------------------------------------
# step_op/_detect_error run once per traced step; 256-entry arrays indexed by
# the raw byte replace enum construction and chained membership tests (the
# per-step Python interpreter is the host-bound term on step-dense blocks).
_OP_BY_RAW: List[Optional[Opcode]] = [None] * 256
_MIN_SP = [0] * 256
_MAX_SP = [1024] * 256
_CONST_GAS = [0] * 256
_FAST_STATE: List[Optional[ExecutionState]] = [None] * 256
_FAST_HANDLER: List[Optional[object]] = [None] * 256
# raw bytes with a per-opcode dynamic-gas / runtime branch in _detect_error
_HAS_DYNAMIC_CHECK = [False] * 256
for _o in Opcode:
    _raw = int(_o)
    _OP_BY_RAW[_raw] = _o
    _MIN_SP[_raw] = min_stack_pointer(_o)
    _MAX_SP[_raw] = max_stack_pointer(_o)
    _CONST_GAS[_raw] = constant_gas_cost(_o)
    if is_push_with_data(_o) or _o is Opcode.PUSH0:
        _FAST_STATE[_raw] = ExecutionState.PUSH
        _FAST_HANDLER[_raw] = _Tracer.op_push
    else:
        _FAST_STATE[_raw] = _STATE_BY_OPCODE.get(_o)
        _h = _HANDLERS.get(_o)
        if _h is None:
            if Opcode.DUP1 <= _o <= Opcode.DUP16:
                _h = _Tracer.op_dup
            elif Opcode.SWAP1 <= _o <= Opcode.SWAP16:
                _h = _Tracer.op_swap
            elif _o in _ALU_BINARY or _o in (Opcode.NOT, Opcode.ISZERO):
                _h = _Tracer.op_alu
            elif _o in (Opcode.ADDMOD, Opcode.MULMOD):
                _h = _Tracer.op_mod3
            elif _o in _BLOCK_CTX_OPS:
                _h = _Tracer.op_blockctx
        _FAST_HANDLER[_raw] = _h
for _o in (
    Opcode.JUMP, Opcode.JUMPI, Opcode.BALANCE, Opcode.EXTCODESIZE,
    Opcode.EXTCODEHASH, Opcode.MLOAD, Opcode.MSTORE, Opcode.MSTORE8,
    Opcode.RETURN, Opcode.REVERT, Opcode.CALLDATACOPY, Opcode.CODECOPY,
    Opcode.EXTCODECOPY, Opcode.RETURNDATACOPY, Opcode.SLOAD, Opcode.SSTORE,
    Opcode.LOG0, Opcode.LOG1, Opcode.LOG2, Opcode.LOG3, Opcode.LOG4,
    Opcode.EXP, Opcode.SHA3, Opcode.CREATE, Opcode.CREATE2,
    Opcode.CALL, Opcode.CALLCODE, Opcode.DELEGATECALL, Opcode.STATICCALL,
):
    _HAS_DYNAMIC_CHECK[int(_o)] = True


def _derive_tx_key(tx_id: int) -> int:
    """Deterministic per-tx secp256k1 secret key (the traced block's
    senders are real keypairs, like the reference's tests that sign with
    eth_keys, tests/test_tx_circuit.py)."""
    from ..ops.ecc import secp256k1

    sk = int.from_bytes(
        keccak256(b"zkevm-specs-tpu tx key #%d" % tx_id), "big") % secp256k1.N
    return sk or 1


def tx_sender_address(tx_id: int) -> int:
    """Address of the deterministic key for tx ``tx_id``
    (keccak(pk)[-20:], reference tx_circuit.py:341-349)."""
    from ..ops.ecc import secp256k1

    pk = secp256k1.priv_to_pub(_derive_tx_key(tx_id))
    return int.from_bytes(keccak256(secp256k1.pubkey_bytes(pk))[-20:], "big")


def sign_block_txs(w: BlockWitness) -> None:
    """Sign every tx of a traced witness with its deterministic key and
    attach ``signed_txs`` so the tx + sig circuits run on the block
    (reference tx_circuit.py:253-291 verifies real ECDSA for every tx).

    The tracer has already set each caller address to the key-derived
    address (keccak(pk)[-20:]), so the tx circuit's recovered-address
    constraint binds the signatures to the EVM-side tx table."""
    from ..circuits.tx import Transaction as SignedTx, sign_tx

    signed = []
    for tx in w.txs:
        sk = _derive_tx_key(tx.id)
        stx = SignedTx(nonce=tx.nonce, gas_price=tx.gas_price, gas=tx.gas,
                       to=tx.callee_address, value=tx.value,
                       data=bytes(tx.call_data), sig_v=0, sig_r=0, sig_s=0)
        stx = sign_tx(sk, stx, w.chain_id)
        # binding sanity: the recovered sender must be the traced caller
        assert tx_sender_address(tx.id) == tx.caller_address, (
            "signed-tx sender does not match the traced caller address")
        signed.append(stx)
    w.signed_txs = signed


def trace_block(
    block: Block,
    txs: List[Tuple[Transaction, Bytecode]],
    caller_balance: int = 10**21,
    withdrawals: Optional[List] = None,
    accounts: Optional[Dict[int, Account]] = None,
    sign: bool = True,
) -> BlockWitness:
    """Execute txs (each a call to a contract with the given bytecode) and
    emit the full witness.

    The state circuit requires the first access of every call-context key to
    be a write (reference state_circuit.py:338; read-only fields "will be
    written in State circuit directly in their first row", table.py:230-237).
    The reference never runs both circuits on one witness; here a block-level
    prologue of setup writes (rw counters 1..10*n_txs) provides them, and
    execution rows start after the prologue.  verify_prologue
    (circuits/super_circuit.py) constrains the prologue itself."""
    if sign:
        # authenticated senders by default: each tx's caller address is the
        # address of a deterministic real keypair, and the signatures ride
        # the witness so tx + sig circuits always run (reference
        # tx_circuit.py:341-349 address = keccak(recovered pk)[-20:])
        for tx, _bc in txs:
            old = tx.caller_address
            tx.caller_address = tx_sender_address(tx.id)
            if accounts and old in accounts and tx.caller_address not in accounts:
                # an account the caller pinned to the pre-signing sender
                # (balance/nonce) follows the sender to its real address
                acct = accounts.pop(old)
                acct.address = tx.caller_address
                accounts[tx.caller_address] = acct

    if withdrawals:
        # chain the mock MPT withdrawal roots up front so the block table's
        # WithdrawalRoot matches the withdrawal circuit's final root
        block.withdrawal_root = 7 * sum(1 for wd in withdrawals if wd.amount)

    def run(start: int, outcomes=None) -> _Tracer:
        tracer = _Tracer(block, caller_balance, start, accounts, outcomes)
        for i, (tx, bytecode) in enumerate(txs):
            tracer.balances.setdefault(tx.caller_address, caller_balance)
            tracer.has_next_tx = i + 1 < len(txs)
            tracer.run_tx(tx, bytecode)
        return tracer

    # pass 1 discovers (a) each frame's halt outcome — needed at emission
    # time for IsPersistent/IsSuccess values and TxLog gating — and (b) how
    # many prologue setup rows the state circuit needs (first access of
    # every context/memory key must be a write); pass 2 replays with the
    # outcome oracle and the prologue budget reserved
    start = 1 + _N_SETUP_ROWS * len(txs)
    probe = run(start)
    outcomes = probe.discovered
    n_setup_rows = (sum(len(s) for s in probe.w.subcall_setups)
                    + len(probe.w.memory_setups))
    tracer = run(start + n_setup_rows, outcomes)
    assert tracer.discovered == [] and tracer.fseq == len(outcomes), (
        "tracer: non-deterministic frame structure between passes")
    w = tracer.w
    rw = w.rw

    # resolve deferred RwCounterEndOfReversion reads
    for row, anchor in tracer.fixups:
        row["value"] = _resolve_anchor(anchor)
    w.tx_rwceor = [_resolve_anchor(a) for a in tracer.root_anchors]
    for setup in w.subcall_setups:
        for i, (callee_id, tag, value) in enumerate(setup):
            if isinstance(value, dict):
                setup[i] = (callee_id, tag, _resolve_anchor(value))

    # --- EndBlock ---
    final_rwc = rw.rw_counter
    if txs:
        call_id = tracer.call_ids[-1]
        rw.call_context_read(call_id, CallContextFieldTag.TxId, len(txs))
        rw.tx_receipt_read(len(txs), TxReceiptFieldTag.CumulativeGasUsed,
                           tracer.cumulative_gas)
        w.steps.append(StepState(ExecutionState.EndBlock, final_rwc, call_id=call_id))
    else:
        w.steps.append(StepState(ExecutionState.EndBlock, final_rwc))
    # rw-table Start padding row for the totality argument
    start_rows = [
        {"rw_counter": i + 1, "rw": 0, "key0": int(Target.Start), "id": 0,
         "address": 0, "field_tag": 0, "storage_key": 0, "value": 0,
         "value_prev": 0, "aux0": 0}
        for i in range(1)
    ]

    # --- call-context setup prologue: rw counters 1..11*n_txs for the root
    # frames, then one write per subcall context key, then one memory write
    # per precompile-output byte ---
    prologue = RWDictionary(1)
    for i, ((tx, bytecode), call_id) in enumerate(zip(txs, tracer.call_ids)):
        code_hash = bytecode.hash()
        success = int(w.tx_success[i])
        for tag, value in (
            (CallContextFieldTag.TxId, tx.id),
            (CallContextFieldTag.RwCounterEndOfReversion, w.tx_rwceor[i]),
            (CallContextFieldTag.IsPersistent, success),
            (CallContextFieldTag.IsSuccess, success),
            (CallContextFieldTag.Depth, 1),
            (CallContextFieldTag.CallerAddress, tx.caller_address),
            (CallContextFieldTag.CalleeAddress, tx.callee_address),
            (CallContextFieldTag.CallDataLength, len(tx.call_data)),
            (CallContextFieldTag.Value, tx.value),
            (CallContextFieldTag.IsRoot, 1),
            (CallContextFieldTag.CodeHash, code_hash),
        ):
            prologue.call_context_write(call_id, tag, value)
    for setup in w.subcall_setups:
        for callee_id, tag, value in setup:
            prologue.call_context_write(callee_id, tag, value)
    for callee_id, addr, byte in w.memory_setups:
        prologue.memory_write(callee_id, addr, byte)
    assert prologue.rw_counter == start + n_setup_rows
    w.rw.rws = start_rows + prologue.rws + w.rw.rws

    w.withdrawals = list(withdrawals or [])
    if not w.copy_circuit.rows:
        w.copy_circuit = None
    if not w.exp_circuit.rows:
        w.exp_circuit = None
    if sign:
        sign_block_txs(w)
    return w
