"""Mini EVM tracer: builds a *coherent* full-block witness (steps + rw rows
+ all tables) for the super circuit.

The reference has no tracer — its tests hand-assemble witnesses per gadget
(SURVEY.md §4).  This module automates that assembly for a practical opcode
subset (PUSH*/POP/arithmetic/bitwise/compare/MSTORE/MLOAD/STOP), producing
the exact row bookkeeping the gadgets constrain: BeginTx's access-list and
balance rows, per-opcode stack/memory rows, EndTx's refund/receipt rows and
EndBlock's totality argument rows.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from ..evm.execution_state import ExecutionState
from ..evm.opcode import Opcode, constant_gas_cost, get_push_size, is_push_with_data
from ..evm.step import StepState
from ..tables.schemas import (
    AccountFieldTag,
    CallContextFieldTag,
    Target,
    TxReceiptFieldTag,
)
from ..utils.param import GAS_COST_TX
from .typing import Block, Bytecode, RWDictionary, Transaction

_STATE_BY_OPCODE = {
    Opcode.STOP: ExecutionState.STOP,
    Opcode.ADD: ExecutionState.ADD,
    Opcode.SUB: ExecutionState.ADD,
    Opcode.MUL: ExecutionState.MUL,
    Opcode.DIV: ExecutionState.MUL,
    Opcode.MOD: ExecutionState.MUL,
    Opcode.LT: ExecutionState.CMP,
    Opcode.GT: ExecutionState.CMP,
    Opcode.EQ: ExecutionState.CMP,
    Opcode.AND: ExecutionState.BITWISE,
    Opcode.OR: ExecutionState.BITWISE,
    Opcode.XOR: ExecutionState.BITWISE,
    Opcode.NOT: ExecutionState.NOT,
    Opcode.ISZERO: ExecutionState.ISZERO,
    Opcode.POP: ExecutionState.POP,
    Opcode.MLOAD: ExecutionState.MEMORY,
    Opcode.MSTORE: ExecutionState.MEMORY,
    Opcode.MSTORE8: ExecutionState.MEMORY,
    Opcode.PC: ExecutionState.PC,
    Opcode.JUMPDEST: ExecutionState.JUMPDEST,
}
for _i in range(1, 17):
    _STATE_BY_OPCODE[Opcode[f"DUP{_i}"]] = ExecutionState.DUP
    _STATE_BY_OPCODE[Opcode[f"SWAP{_i}"]] = ExecutionState.SWAP

U256M = (1 << 256) - 1


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


def trace_block(
    block: Block,
    txs: List[Tuple[Transaction, Bytecode]],
    caller_balance: int = 10**21,
    withdrawals: Optional[List] = None,
) -> BlockWitness:
    """Execute txs (each a call to a contract with the given bytecode) and
    emit the full witness.

    The state circuit requires the first access of every call-context key to
    be a write (reference state_circuit.py:338; read-only fields "will be
    written in State circuit directly in their first row", table.py:230-237).
    The reference never runs both circuits on one witness; here a block-level
    prologue of setup writes (rw counters 1..10*n_txs) provides them, and
    execution rows start after the prologue."""
    if withdrawals:
        # chain the mock MPT withdrawal roots up front so the block table's
        # WithdrawalRoot matches the withdrawal circuit's final root
        block.withdrawal_root = 7 * sum(1 for wd in withdrawals if wd.amount)
    start = 1 + _N_SETUP_ROWS * len(txs)
    w, call_ids = _trace_execution(block, txs, caller_balance, start)
    w.withdrawals = list(withdrawals or [])

    prologue = RWDictionary(1)
    for (tx, bytecode), call_id in zip(txs, call_ids):
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
    assert prologue.rw_counter == start
    w.rw.rws = prologue.rws + w.rw.rws
    return w


def _trace_execution(
    block: Block,
    txs: List[Tuple[Transaction, Bytecode]],
    caller_balance: int,
    start_counter: int,
) -> Tuple[BlockWitness, List[int]]:
    w = BlockWitness()
    w.block = block
    w.rw = RWDictionary(start_counter)
    rw = w.rw
    cumulative_gas = 0
    coinbase_balance = 0
    call_ids: List[int] = []

    for tx, bytecode in txs:
        tx_id = tx.id
        w.txs.append(tx)
        w.bytecodes.append(bytecode)
        code_hash = bytecode.hash()
        call_id = rw.rw_counter
        call_ids.append(call_id)

        # --- BeginTx (gadget rw order, begin_tx.py) ---
        begin_rwc = rw.rw_counter
        rw.call_context_read(call_id, CallContextFieldTag.TxId, tx_id)
        rw.call_context_read(call_id, CallContextFieldTag.RwCounterEndOfReversion, 0)
        rw.call_context_read(call_id, CallContextFieldTag.IsPersistent, 1)
        rw.call_context_read(call_id, CallContextFieldTag.IsSuccess, 1)
        rw.account_write(tx.caller_address, AccountFieldTag.Nonce, tx.nonce + 1, tx.nonce)
        rw.tx_access_list_account_write(tx_id, block.coinbase, True, False)
        rw.tx_access_list_account_write(tx_id, tx.caller_address, True, False)
        rw.tx_access_list_account_write(tx_id, tx.callee_address, True, False)
        gas_fee = tx.gas * tx.gas_price
        caller_bal_prev = caller_balance
        caller_balance = caller_balance - tx.value - gas_fee
        rw.account_write(tx.caller_address, AccountFieldTag.Balance,
                         caller_balance, caller_bal_prev)
        rw.account_write(tx.callee_address, AccountFieldTag.Balance, tx.value, 0)
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

        w.steps.append(StepState(ExecutionState.BeginTx, begin_rwc))

        gas_left = tx.gas - GAS_COST_TX - tx.call_data_gas_cost()

        # --- interpret the bytecode ---
        stack: List[int] = []
        memory: Dict[int, int] = {}
        memory_word_size = 0
        pc = 0
        code = bytecode.code
        while True:
            op = Opcode(code[pc])
            sp = 1024 - len(stack)
            state = (
                ExecutionState.PUSH if is_push_with_data(op) or op == Opcode.PUSH0
                else _STATE_BY_OPCODE[op]
            )
            w.steps.append(
                StepState(state, rw.rw_counter, call_id=call_id, is_root=True,
                          code_hash=code_hash, program_counter=pc,
                          stack_pointer=sp, gas_left=gas_left,
                          memory_word_size=memory_word_size,
                          reversible_write_counter=2)
            )
            gas_left -= constant_gas_cost(op)
            if op == Opcode.STOP:
                # final IsSuccess read happens in the STOP gadget
                rw.call_context_read(call_id, CallContextFieldTag.IsSuccess, 1)
                break
            elif is_push_with_data(op) or op == Opcode.PUSH0:
                n = get_push_size(op)
                v = int.from_bytes(code[pc + 1: pc + 1 + n], "big")
                stack.append(v)
                rw.stack_write(call_id, 1024 - len(stack), v)
                pc += 1 + n
            elif op == Opcode.JUMPDEST:
                pc += 1
            elif op == Opcode.PC:
                stack.append(pc)
                rw.stack_write(call_id, 1024 - len(stack), pc)
                pc += 1
            elif int(Opcode.DUP1) <= int(op) <= int(Opcode.DUP16):
                # gadget rw order (stack_family.py): read at depth x, push
                x = int(op) - int(Opcode.DUP1) + 1
                v = stack[-x]
                rw.stack_read(call_id, sp + x - 1, v)
                stack.append(v)
                rw.stack_write(call_id, 1024 - len(stack), v)
                pc += 1
            elif int(Opcode.SWAP1) <= int(op) <= int(Opcode.SWAP16):
                # gadget rw order: read top, read deep, write top, write deep
                n = int(op) - int(Opcode.SWAP1) + 1
                top, deep = stack[-1], stack[-1 - n]
                rw.stack_read(call_id, sp, top)
                rw.stack_read(call_id, sp + n, deep)
                rw.stack_write(call_id, sp, deep)
                rw.stack_write(call_id, sp + n, top)
                stack[-1], stack[-1 - n] = deep, top
                pc += 1
            elif op == Opcode.POP:
                v = stack.pop()
                rw.stack_read(call_id, 1023 - len(stack), v)
                pc += 1
            elif op in (Opcode.MSTORE, Opcode.MSTORE8, Opcode.MLOAD):
                if op == Opcode.MLOAD:
                    offset = stack.pop()
                    rw.stack_read(call_id, 1024 - len(stack) - 1, offset)
                    value = 0
                    for i in range(32):
                        value = (value << 8) | memory.get(offset + i, 0)
                    stack.append(value)
                    rw.stack_write(call_id, 1024 - len(stack), value)
                    for i in range(32):
                        rw.memory_read(call_id, offset + i, memory.get(offset + i, 0))
                    address = offset + 32
                else:
                    offset = stack.pop()
                    rw.stack_read(call_id, 1024 - len(stack) - 1, offset)
                    value = stack.pop()
                    rw.stack_read(call_id, 1024 - len(stack) - 1, value)
                    if op == Opcode.MSTORE8:
                        memory[offset] = value & 0xFF
                        rw.memory_write(call_id, offset, value & 0xFF)
                        address = offset + 1
                    else:
                        for i in range(32):
                            b = (value >> (8 * (31 - i))) & 0xFF
                            memory[offset + i] = b
                            rw.memory_write(call_id, offset + i, b)
                        address = offset + 32
                # the MEMORY gadget passes curr.memory_word_size as the
                # "offset" of memory_expansion (reference memory.py:22-24,
                # instruction.py:1138-1145), so the expansion target includes
                # the current size — mirrored exactly
                computed = (address + memory_word_size + 31) // 32
                next_size = max(memory_word_size, computed)
                gas_left -= (
                    3 * (next_size - memory_word_size)
                    + next_size * next_size // 512
                    - memory_word_size * memory_word_size // 512
                )
                memory_word_size = next_size
                pc += 1
            else:
                # binary/unary ALU ops
                a = stack.pop()
                rw.stack_read(call_id, 1024 - len(stack) - 1, a)
                if op in (Opcode.NOT, Opcode.ISZERO):
                    if op == Opcode.NOT:
                        out = a ^ U256M
                    else:
                        out = int(a == 0)
                else:
                    b = stack.pop()
                    rw.stack_read(call_id, 1024 - len(stack) - 1, b)
                    out = {
                        Opcode.ADD: lambda: (a + b) & U256M,
                        Opcode.SUB: lambda: (a - b) & U256M,
                        Opcode.MUL: lambda: (a * b) & U256M,
                        Opcode.DIV: lambda: a // b if b else 0,
                        Opcode.MOD: lambda: a % b if b else 0,
                        Opcode.LT: lambda: int(a < b),
                        Opcode.GT: lambda: int(a > b),
                        Opcode.EQ: lambda: int(a == b),
                        Opcode.AND: lambda: a & b,
                        Opcode.OR: lambda: a | b,
                        Opcode.XOR: lambda: a ^ b,
                    }[op]()
                stack.append(out)
                rw.stack_write(call_id, 1024 - len(stack), out)
                pc += 1

        # --- EndTx (gadget rw order, end_tx.py) ---
        end_rwc = rw.rw_counter
        gas_used = tx.gas - gas_left
        rw.call_context_read(call_id, CallContextFieldTag.TxId, tx_id)
        rw.call_context_read(call_id, CallContextFieldTag.IsPersistent, 1)
        rw.tx_refund_read(tx_id, 0)
        refund_value = gas_left * tx.gas_price
        caller_balance_new = caller_balance + refund_value
        rw.account_write(tx.caller_address, AccountFieldTag.Balance,
                         caller_balance_new, caller_balance)
        caller_balance = caller_balance_new
        effective_tip = tx.gas_price - block.base_fee
        coinbase_balance_new = coinbase_balance + effective_tip * gas_used
        rw.account_write(block.coinbase, AccountFieldTag.Balance,
                         coinbase_balance_new, coinbase_balance)
        coinbase_balance = coinbase_balance_new
        rw.tx_receipt_write(tx_id, TxReceiptFieldTag.PostStateOrStatus, 1)
        rw.tx_receipt_write(tx_id, TxReceiptFieldTag.LogLength, 0)
        if tx_id > 1:
            rw.tx_receipt_read(tx_id - 1, TxReceiptFieldTag.CumulativeGasUsed, cumulative_gas)
        cumulative_gas += gas_used
        rw.tx_receipt_write(tx_id, TxReceiptFieldTag.CumulativeGasUsed, cumulative_gas)
        if tx_id < len(txs):
            # EndTx additionally reads the NEXT BeginTx's TxId row
            # (end_tx.py:73-78): one extra rw row bound to the next call id
            next_call_id = rw.rw_counter + 1
            rw.call_context_read(next_call_id, CallContextFieldTag.TxId, tx_id + 1)
        w.steps.append(
            StepState(ExecutionState.EndTx, end_rwc, call_id=call_id, gas_left=gas_left)
        )

    # --- EndBlock ---
    final_rwc = rw.rw_counter
    if txs:
        rw.call_context_read(call_id, CallContextFieldTag.TxId, len(txs))
        rw.tx_receipt_read(len(txs), TxReceiptFieldTag.CumulativeGasUsed, cumulative_gas)
        w.steps.append(StepState(ExecutionState.EndBlock, final_rwc, call_id=call_id))
    else:
        # empty block: EndBlock's is_empty_block branch (rw_counter == 1)
        # makes no lookups beyond the rw-table Start padding argument
        w.steps.append(StepState(ExecutionState.EndBlock, final_rwc))
    # padding rows so the rw-table totality argument holds:
    # max_rws - total_rws = number of Start rows needed
    total_rws = final_rwc - 1 + 2
    start_rows = [
        {"rw_counter": i + 1, "rw": 0, "key0": int(Target.Start), "id": 0,
         "address": 0, "field_tag": 0, "storage_key": 0, "value": 0,
         "value_prev": 0, "aux0": 0}
        for i in range(1)
    ]
    w.rw.rws = start_rows + w.rw.rws
    return w, call_ids
