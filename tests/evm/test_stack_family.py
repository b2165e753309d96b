"""DUP/SWAP/PC/JUMPDEST conformance vectors.

These states have no gadget in the reference (execution/__init__.py:86-171
leaves them unregistered); the vectors here are derived from EVM semantics
(Yellow Paper appendix H) and pin down our beyond-parity implementation in
zkevm_specs_tpu/evm/execution/stack_family.py.
"""
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from zkevm_specs_tpu.evm import (
    Block,
    Bytecode,
    ExecutionState,
    Opcode,
    RWDictionary,
    StepState,
    Tables,
    verify_steps,
)
from zkevm_specs_tpu.evm.opcode import constant_gas_cost
from common import rand_word


def two_steps(state, bytecode, rw, pc0, pc1, sp0, sp1, gas, rw_delta,
              success=True):
    h = bytecode.hash()
    tables = Tables(
        block_table=Block().table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
    )
    steps = [
        StepState(execution_state=state, rw_counter=9, call_id=1, is_root=True,
                  code_hash=h, program_counter=pc0, stack_pointer=sp0,
                  gas_left=gas),
        StepState(execution_state=ExecutionState.STOP, rw_counter=9 + rw_delta,
                  call_id=1, is_root=True, code_hash=h, program_counter=pc1,
                  stack_pointer=sp1, gas_left=0),
    ]
    verify_steps(tables=tables, steps=steps, success=success)


@pytest.mark.parametrize("x", list(range(1, 17)))
def test_dup(x):
    v = rand_word()
    bytecode = Bytecode()
    getattr(bytecode, f"dup{x}")()
    bytecode.stop()
    sp = 1024 - x  # x items on the stack; DUPx reads the deepest one
    rw = (RWDictionary(9)
          .stack_read(1, sp + x - 1, v)
          .stack_write(1, sp - 1, v))
    two_steps(ExecutionState.DUP, bytecode, rw, 0, 1, sp, sp - 1,
              constant_gas_cost(Opcode(int(Opcode.DUP1) + x - 1)), 2)


def test_dup_wrong_value_rejected():
    bytecode = Bytecode().dup1().stop()
    rw = (RWDictionary(9)
          .stack_read(1, 1023, 5)
          .stack_write(1, 1022, 6))
    two_steps(ExecutionState.DUP, bytecode, rw, 0, 1, 1023, 1022,
              constant_gas_cost(Opcode.DUP1), 2, success=False)


@pytest.mark.parametrize("x", list(range(1, 17)))
def test_swap(x):
    top, deep = rand_word(), rand_word()
    bytecode = Bytecode()
    getattr(bytecode, f"swap{x}")()
    bytecode.stop()
    sp = 1024 - (x + 1)  # x+1 items on the stack
    rw = (RWDictionary(9)
          .stack_read(1, sp, top)
          .stack_read(1, sp + x, deep)
          .stack_write(1, sp, deep)
          .stack_write(1, sp + x, top))
    two_steps(ExecutionState.SWAP, bytecode, rw, 0, 1, sp, sp,
              constant_gas_cost(Opcode(int(Opcode.SWAP1) + x - 1)), 4)


def test_swap_not_swapped_rejected():
    top, deep = 1, 2
    bytecode = Bytecode().swap1().stop()
    sp = 1022
    rw = (RWDictionary(9)
          .stack_read(1, sp, top)
          .stack_read(1, sp + 1, deep)
          .stack_write(1, sp, top)       # wrong: should be deep
          .stack_write(1, sp + 1, deep))  # wrong: should be top
    two_steps(ExecutionState.SWAP, bytecode, rw, 0, 1, sp, sp,
              constant_gas_cost(Opcode.SWAP1), 4, success=False)


@pytest.mark.parametrize("pc0", [0, 1, 255, 1000])
def test_pc(pc0):
    bytecode = Bytecode()
    for _ in range(pc0):
        bytecode.jumpdest()
    bytecode.pc().stop()
    rw = RWDictionary(9).stack_write(1, 1023, pc0)
    two_steps(ExecutionState.PC, bytecode, rw, pc0, pc0 + 1, 1024, 1023,
              constant_gas_cost(Opcode.PC), 1)


def test_pc_wrong_value_rejected():
    bytecode = Bytecode().jumpdest().pc().stop()
    rw = RWDictionary(9).stack_write(1, 1023, 0)  # should push 1
    two_steps(ExecutionState.PC, bytecode, rw, 1, 2, 1024, 1023,
              constant_gas_cost(Opcode.PC), 1, success=False)


def test_jumpdest():
    bytecode = Bytecode().jumpdest().stop()
    rw = RWDictionary(9)
    two_steps(ExecutionState.JUMPDEST, bytecode, rw, 0, 1, 1024, 1024,
              constant_gas_cost(Opcode.JUMPDEST), 0)
