"""ADD/SUB conformance vectors (mirrors reference tests/evm/test_add_sub.py)."""
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
from common import generate_nasty_tests, rand_word

TESTING_DATA = [
    (Opcode.ADD, 0x030201, 0x060504),
    (Opcode.SUB, 0x090705, 0x060504),
    (Opcode.ADD, rand_word(), rand_word()),
    (Opcode.SUB, rand_word(), rand_word()),
]

generate_nasty_tests(TESTING_DATA, (Opcode.ADD, Opcode.SUB))


def build(opcode, a, b, c):
    bytecode = (
        Bytecode().add(a, b).stop() if opcode == Opcode.ADD else Bytecode().sub(a, b).stop()
    )
    tables = Tables(
        block_table=Block().table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=(
            RWDictionary(9)
            .stack_read(1, 1022, a)
            .stack_read(1, 1023, b)
            .stack_write(1, 1023, c)
            .rws
        ),
    )
    return bytecode, tables


def steps(bytecode):
    h = bytecode.hash()
    return [
        StepState(
            execution_state=ExecutionState.ADD,
            rw_counter=9,
            call_id=1,
            is_root=True,
            is_create=False,
            code_hash=h,
            program_counter=66,
            stack_pointer=1022,
            gas_left=3,
        ),
        StepState(
            execution_state=ExecutionState.STOP,
            rw_counter=12,
            call_id=1,
            is_root=True,
            is_create=False,
            code_hash=h,
            program_counter=67,
            stack_pointer=1023,
            gas_left=0,
        ),
    ]


@pytest.mark.parametrize("opcode, a, b", TESTING_DATA)
def test_add_sub(opcode: Opcode, a: int, b: int):
    c = (a + b if opcode == Opcode.ADD else a - b) % 2**256
    bytecode, tables = build(opcode, a, b, c)
    verify_steps(tables=tables, steps=steps(bytecode))


def test_add_wrong_result_rejected():
    a, b = 0x030201, 0x060504
    c = (a + b + 1) % 2**256  # corrupted
    bytecode, tables = build(Opcode.ADD, a, b, c)
    verify_steps(tables=tables, steps=steps(bytecode), success=False)


def test_add_wrong_gas_rejected():
    a, b = 1, 2
    bytecode, tables = build(Opcode.ADD, a, b, 3)
    s = steps(bytecode)
    s[1].gas_left = 1  # ADD costs 3, started with 3
    verify_steps(tables=tables, steps=s, success=False)
