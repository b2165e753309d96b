"""JUMP/JUMPI/GAS/MSIZE/PUSH/POP flow vectors (mirrors reference
tests/evm/test_{jump,jumpi,gas,msize,push,pop}.py scenarios)."""
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
              success=True, gas_end=0):
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
                  stack_pointer=sp1, gas_left=gas_end),
    ]
    verify_steps(tables=tables, steps=steps, success=success)


def test_jump():
    # PUSH1 3 JUMP JUMPDEST STOP
    bytecode = Bytecode().push1(3).jump().jumpdest().stop()
    rw = RWDictionary(9).stack_read(1, 1023, 3)
    two_steps(ExecutionState.JUMP, bytecode, rw, 2, 3, 1023, 1024,
              constant_gas_cost(Opcode.JUMP), 1)


def test_jump_to_non_jumpdest_rejected():
    bytecode = Bytecode().push1(4).jump().jumpdest().stop()
    rw = RWDictionary(9).stack_read(1, 1023, 4)
    two_steps(ExecutionState.JUMP, bytecode, rw, 2, 4, 1023, 1024,
              constant_gas_cost(Opcode.JUMP), 1, success=False)


@pytest.mark.parametrize("cond", [0, 1, rand_word()])
def test_jumpi(cond):
    # PUSH1 cond PUSH1 5 JUMPI JUMPDEST STOP  (dest 5 == pc+1 so both the
    # taken and fall-through paths land on pc 5)
    bytecode = Bytecode().push1(1).push1(5).jumpi().jumpdest().stop()
    rw = RWDictionary(9).stack_read(1, 1022, 5).stack_read(1, 1023, cond)
    two_steps(ExecutionState.JUMPI, bytecode, rw, 4, 5, 1022, 1024,
              constant_gas_cost(Opcode.JUMPI), 2)


def test_gas_opcode():
    bytecode = Bytecode().gas().stop()
    gas = constant_gas_cost(Opcode.GAS) + 7
    rw = RWDictionary(9).stack_write(1, 1023, 7)
    two_steps(ExecutionState.GAS, bytecode, rw, 0, 1, 1024, 1023, gas, 1,
              gas_end=7)


def test_msize():
    bytecode = Bytecode().msize().stop()
    gas = constant_gas_cost(Opcode.MSIZE)
    rw = RWDictionary(9).stack_write(1, 1023, 3 * 32)
    h = bytecode.hash()
    tables = Tables(
        block_table=Block().table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
    )
    steps = [
        StepState(execution_state=ExecutionState.MSIZE, rw_counter=9, call_id=1,
                  is_root=True, code_hash=h, program_counter=0,
                  stack_pointer=1024, gas_left=gas, memory_word_size=3),
        StepState(execution_state=ExecutionState.STOP, rw_counter=10, call_id=1,
                  is_root=True, code_hash=h, program_counter=1,
                  stack_pointer=1023, gas_left=0, memory_word_size=3),
    ]
    verify_steps(tables=tables, steps=steps)


@pytest.mark.parametrize("n", list(range(0, 33)))
def test_push_n(n):
    value = rand_word() >> (8 * (32 - n)) if n else 0
    bytecode = Bytecode()
    if n == 0:
        bytecode.code.append(int(Opcode.PUSH0))
        bytecode.is_code.append(True)
    else:
        bytecode.push(value, n_bytes=n)
    bytecode.stop()
    op = Opcode(int(Opcode.PUSH0) + n)
    rw = RWDictionary(9).stack_write(1, 1023, value)
    two_steps(ExecutionState.PUSH, bytecode, rw, 0, 1 + n, 1024, 1023,
              constant_gas_cost(op), 1)


def test_pop():
    v = rand_word()
    bytecode = Bytecode().push(v, n_bytes=32).pop().stop()
    rw = RWDictionary(9).stack_read(1, 1023, v)
    two_steps(ExecutionState.POP, bytecode, rw, 33, 34, 1023, 1024,
              constant_gas_cost(Opcode.POP), 1)
