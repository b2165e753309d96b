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
from ..evm.opcode import Opcode, constant_gas_cost, get_push_size, is_push_with_data
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
    GAS_COST_COPY,
    GAS_COST_COPY_SHA3,
    GAS_COST_EXP_PER_BYTE,
    GAS_COST_LOG,
    GAS_COST_LOGDATA,
    GAS_COST_TX,
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
    Opcode.REVERT: ExecutionState.REVERT,
    Opcode.RETURNDATACOPY: ExecutionState.RETURNDATACOPY,
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
        self.sha3_preimages: List[bytes] = []  # extra keccak-circuit preimages
        self.tx_code_hashes: List[int] = []    # per-tx root code hash
        self.subcall_setups: List[List[Tuple[int, object, int]]] = []
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


_N_SETUP_ROWS = 10


def _signed(v: int) -> int:
    return v - (1 << 256) if v >= U255 else v


def _byte_size(v: int) -> int:
    return (v.bit_length() + 7) // 8


class _Tracer:
    """Single-block interpreter emitting gadget-exact witness rows."""

    def __init__(self, block: Block, caller_balance: int, start_counter: int,
                 accounts: Optional[Dict[int, Account]] = None):
        self.w = BlockWitness()
        self.w.block = block
        self.w.rw = RWDictionary(start_counter)
        self.w.copy_circuit = CopyCircuit()
        self.w.exp_circuit = ExpCircuit()
        self.rw = self.w.rw
        self.block = block
        self.copy_r = 0x64  # randomness for copy RLC events (shared default)
        self.cumulative_gas = 0
        self.call_ids: List[int] = []
        self._code_hashes: Dict[int, Bytecode] = {}

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
        self.warm_addr = set()
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

        # --- BeginTx (gadget rw order, begin_tx.py) ---
        begin_rwc = rw.rw_counter
        rw.call_context_read(call_id, CallContextFieldTag.TxId, tx_id)
        rw.call_context_read(call_id, CallContextFieldTag.RwCounterEndOfReversion, 0)
        rw.call_context_read(call_id, CallContextFieldTag.IsPersistent, 1)
        rw.call_context_read(call_id, CallContextFieldTag.IsSuccess, 1)
        # the gadget constrains the nonce write against the tx table's
        # declared nonce (begin_tx.py), so the declared value is authoritative
        rw.account_write(tx.caller_address, AccountFieldTag.Nonce,
                         tx.nonce + 1, tx.nonce)
        self.nonces[tx.caller_address] = tx.nonce + 1
        for addr in (block.coinbase, tx.caller_address, tx.callee_address):
            rw.tx_access_list_account_write(tx_id, addr, True, addr in self.warm_addr)
            self.warm_addr.add(addr)
        gas_fee = tx.gas * tx.gas_price
        caller_bal_prev = self.balances.get(tx.caller_address, 0)
        caller_bal = caller_bal_prev - tx.value - gas_fee
        rw.account_write(tx.caller_address, AccountFieldTag.Balance,
                         caller_bal, caller_bal_prev)
        self.balances[tx.caller_address] = caller_bal
        callee_bal_prev = self.balances.get(tx.callee_address, 0)
        rw.account_write(tx.callee_address, AccountFieldTag.Balance,
                         callee_bal_prev + tx.value, callee_bal_prev)
        self.balances[tx.callee_address] = callee_bal_prev + tx.value
        rw.account_read(tx.callee_address, AccountFieldTag.CodeHash, code_hash)
        for tag, value in (
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

        self.w.steps.append(StepState(ExecutionState.BeginTx, begin_rwc))
        self.rev = 2  # the two transfer balance writes are reversible
        self.gas_left = tx.gas - GAS_COST_TX - tx.call_data_gas_cost()

        # --- interpret the bytecode ---
        while not self.stopped:
            self.step_op()

        # --- EndTx (gadget rw order, end_tx.py) ---
        end_rwc = rw.rw_counter
        gas_used = tx.gas - self.gas_left
        effective_refund = min(self.refund, gas_used // MAX_REFUND_QUOTIENT_OF_GAS_USED)
        rw.call_context_read(call_id, CallContextFieldTag.TxId, tx_id)
        rw.call_context_read(call_id, CallContextFieldTag.IsPersistent, 1)
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
        rw.tx_receipt_write(tx_id, TxReceiptFieldTag.PostStateOrStatus, 1)
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

    def step_op(self):
        op = Opcode(self.code.code[self.pc] if self.pc < len(self.code.code)
                    else Opcode.STOP)
        state = (
            ExecutionState.PUSH if is_push_with_data(op) or op == Opcode.PUSH0
            else _STATE_BY_OPCODE[op]
        )
        sp = 1024 - len(self.stack)
        self.w.steps.append(
            StepState(state, self.rw.rw_counter, call_id=self.call_id,
                      is_root=self.is_root, code_hash=self.code_hash,
                      program_counter=self.pc, stack_pointer=sp,
                      gas_left=self.gas_left, memory_word_size=self.mws,
                      reversible_write_counter=self.rev,
                      log_id=self.log_count)
        )
        self.gas_left -= constant_gas_cost(op)
        handler = _HANDLERS.get(op)
        if handler is None:
            if is_push_with_data(op) or op == Opcode.PUSH0:
                handler = _Tracer.op_push
            elif Opcode.DUP1 <= op <= Opcode.DUP16:
                handler = _Tracer.op_dup
            elif Opcode.SWAP1 <= op <= Opcode.SWAP16:
                handler = _Tracer.op_swap
            elif op in _ALU_BINARY or op in (Opcode.NOT, Opcode.ISZERO):
                handler = _Tracer.op_alu
            elif op in (Opcode.ADDMOD, Opcode.MULMOD):
                handler = _Tracer.op_mod3
            elif op in _BLOCK_CTX_OPS:
                handler = _Tracer.op_blockctx
            else:
                raise NotImplementedError(f"tracer: no handler for {op!r}")
        handler(self, op)

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
        self.cc_read(CallContextFieldTag.IsPersistent, 1)

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
    )

    def _push_frame(self) -> dict:
        saved = {f: getattr(self, f) for f in self._FRAME_FIELDS}
        self.frames.append(saved)
        return saved

    def _pop_frame(self, last_callee):
        self.memories[self.call_id] = self.memory
        callee_gas = self.gas_left
        callee_rev = self.rev
        saved = self.frames.pop()
        for f in self._FRAME_FIELDS:
            setattr(self, f, saved[f])
        self.pc = saved["resume_pc"]
        self.gas_left = saved["resume_gas"] + callee_gas
        self.mws = saved["resume_mws"]
        self.rev = saved["resume_rev"] + callee_rev  # halt in success
        self.last_callee = last_callee

    def _restore_context_rows(self, saved: dict, last_callee):
        """The 12 restore rows of step_state_transition_to_restored_context
        (evm/instruction.py:481-538)."""
        caller_id = saved["call_id"]
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
        """CALL/CALLCODE/DELEGATECALL/STATICCALL, success path
        (evm/execution/callop.py; row order per tests/evm/test_callop_return.py)."""
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
        self.spush(1)  # is_success (success path only)

        # memory expansion across the cd and rd regions (CallGadget)
        sizes = [self.mws]
        if cd_length:
            sizes.append((cd_offset + cd_length + 31) // 32)
        if rd_length:
            sizes.append((rd_offset + rd_length + 31) // 32)
        next_mws = max(sizes)
        mem_gas = (3 * (next_mws - self.mws)
                   + next_mws * next_mws // 512 - self.mws * self.mws // 512)

        code_hash = self._account_code_hash(target)
        rw.account_read(target, AccountFieldTag.CodeHash, code_hash)
        warm = target in self.warm_addr
        rw.tx_access_list_account_write(self.tx_id, target, True, warm)
        self.warm_addr.add(target)
        rw.call_context_read(callee_call_id,
                             CallContextFieldTag.RwCounterEndOfReversion, 0)
        rw.call_context_read(callee_call_id, CallContextFieldTag.IsPersistent, 1)
        # the state circuit needs the first access of every callee context
        # key to be a write; record the setup for the block prologue
        setup = [(callee_call_id, CallContextFieldTag.RwCounterEndOfReversion, 0),
                 (callee_call_id, CallContextFieldTag.IsPersistent, 1)]
        self.w.subcall_setups.append(setup)

        has_value = int(value != 0) if not (is_delegatecall or is_staticcall) else 0
        callee_not_exists = int(code_hash == 0)
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
        if is_call:
            # transfer value (reversible, bound to the callee frame)
            src, dst = self.callee_address, target
            src_prev = self.balances.get(src, 0)
            rw.account_write(src, AccountFieldTag.Balance, src_prev - value,
                             src_prev)
            self.balances[src] = src_prev - value
            dst_prev = self.balances.get(dst, 0)
            rw.account_write(dst, AccountFieldTag.Balance, dst_prev + value,
                             dst_prev)
            self.balances[dst] = dst_prev + value

        gas_cost = (
            (GAS_COST_WARM_ACCESS if warm else GAS_COST_ACCOUNT_COLD_ACCESS)
            + has_value * (GAS_COST_CALL_WITH_VALUE
                           + (GAS_COST_NEW_ACCOUNT if is_call and callee_not_exists else 0))
            + mem_gas
        )
        gas_available = self.gas_left - gas_cost
        all_but_64th = gas_available - gas_available // 64
        callee_gas = min(all_but_64th, gas_arg) if gas_arg < (1 << 64) else all_but_64th

        callee_code = self.codes.get(target)
        no_code = code_hash in (0, int(EMPTY_CODE_HASH)) or callee_code is None
        if no_code:
            # empty-code call: stays in the caller's frame (callop.py:120-142)
            for tag, v in ((CallContextFieldTag.LastCalleeId, 0),
                           (CallContextFieldTag.LastCalleeReturnDataOffset, 0),
                           (CallContextFieldTag.LastCalleeReturnDataLength, 0)):
                rw.call_context_write(self.call_id, tag, v)
            self.last_callee = (0, 0, 0)
            self.rev += 3
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
            (CallContextFieldTag.ReversibleWriteCounter, self.rev + 1),
        ):
            rw.call_context_write(self.call_id, tag, v)

        # callee context reads (18) — note the gadget pins the callee's
        # IsStatic to the CALLER's flag (callop.py:278), not OR'd with
        # STATICCALL; mirrored for verdict parity
        callee_static = self.is_static
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
            (CallContextFieldTag.IsSuccess, 1),
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
        saved["resume_rev"] = self.rev + 1
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
        self.storage[skey] = value
        warm = skey in self.warm_slot
        self.rw.tx_access_list_account_storage_write(
            self.tx_id, addr, key, True, warm)
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
        self.rev += 1  # the EXTCODESIZE gadget counts the AL write reversible
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
        self.cc_read(CallContextFieldTag.IsPersistent, 1)
        log_id = self.log_count + 1
        self.rw.tx_log_write(self.tx_id, log_id, TxLogFieldTag.Address, 0,
                             self.callee_address)
        n_topics = int(op) - int(Opcode.LOG0)
        for i in range(n_topics):
            topic = self.spop()
            self.rw.tx_log_write(self.tx_id, log_id, TxLogFieldTag.Topic, i, topic)
        if msize:
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
        self.log_count = log_id
        self.pc += 1

    def op_return_revert(self, op):
        # gadget order (return_revert.py): IsSuccess read precedes the pops
        assert op == Opcode.RETURN, "tracer: REVERT not supported yet"
        self.cc_read(CallContextFieldTag.IsSuccess, 1)
        offset = self.spop()
        length = self.spop()
        if self.is_root:
            self.cc_read(CallContextFieldTag.IsPersistent, 1)
            self._expand_dyn(offset if length else 0, length)
            self.stopped = True
            return
        # D. return the memory chunk to the caller (return_revert.py:72-95)
        self.cc_read(CallContextFieldTag.ReturnDataOffset, self.rd_offset_abs)
        self.cc_read(CallContextFieldTag.ReturnDataLength, self.rd_length)
        copy_length = min(length, self.rd_length)
        # the gadget's copy lookup needs a copy event even for length 0;
        # zero-length subcall returns are not traced yet
        assert copy_length > 0, "tracer: zero-length subcall RETURN unsupported"
        saved = self.frames[-1]
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
        self._pop_frame(last_callee)


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
    Opcode.CALL: _Tracer.op_callop,
    Opcode.CALLCODE: _Tracer.op_callop,
    Opcode.DELEGATECALL: _Tracer.op_callop,
    Opcode.STATICCALL: _Tracer.op_callop,
}


def trace_block(
    block: Block,
    txs: List[Tuple[Transaction, Bytecode]],
    caller_balance: int = 10**21,
    withdrawals: Optional[List] = None,
    accounts: Optional[Dict[int, Account]] = None,
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
    if withdrawals:
        # chain the mock MPT withdrawal roots up front so the block table's
        # WithdrawalRoot matches the withdrawal circuit's final root
        block.withdrawal_root = 7 * sum(1 for wd in withdrawals if wd.amount)

    def run(start: int) -> _Tracer:
        tracer = _Tracer(block, caller_balance, start, accounts)
        for i, (tx, bytecode) in enumerate(txs):
            tracer.balances.setdefault(tx.caller_address, caller_balance)
            tracer.has_next_tx = i + 1 < len(txs)
            tracer.run_tx(tx, bytecode)
        return tracer

    # pass 1 discovers how many subcall context-setup prologue rows the
    # state circuit needs (first access of every context key must be a
    # write); pass 2 re-traces with the prologue budget reserved
    start = 1 + _N_SETUP_ROWS * len(txs)
    tracer = run(start)
    n_setup_rows = sum(len(s) for s in tracer.w.subcall_setups)
    if n_setup_rows:
        tracer = run(start + n_setup_rows)
    w = tracer.w
    rw = w.rw

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

    # --- call-context setup prologue: rw counters 1..10*n_txs for the root
    # frames, then one write per subcall context key ---
    prologue = RWDictionary(1)
    for (tx, bytecode), call_id in zip(txs, tracer.call_ids):
        code_hash = bytecode.hash()
        for tag, value in (
            (CallContextFieldTag.TxId, tx.id),
            (CallContextFieldTag.IsPersistent, 1),
            (CallContextFieldTag.IsSuccess, 1),
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
    assert prologue.rw_counter == start + n_setup_rows
    w.rw.rws = start_rows + prologue.rws + w.rw.rws

    w.withdrawals = list(withdrawals or [])
    if not w.copy_circuit.rows:
        w.copy_circuit = None
    if not w.exp_circuit.rows:
        w.exp_circuit = None
    return w
