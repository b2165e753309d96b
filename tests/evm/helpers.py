"""Shared scenario builder for single-opcode gadget tests.

Builds the same witness shape the reference tests hand-construct
(cf. reference tests/evm/test_add_sub.py:28-76): PUSH32 args, one opcode,
the exact rw rows, and the curr/next StepState pair."""
import sys
from pathlib import Path

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


def run_opcode(
    execution_state: ExecutionState,
    opcode: Opcode,
    pops,
    pushes,
    success: bool = True,
    dynamic_gas: int = 0,
    exp_table=(),
    gas_left=None,
):
    """pops: values popped (top first); pushes: values pushed (top first)."""
    bytecode = Bytecode()
    method = getattr(bytecode, opcode.name.lower())
    bytecode = method(*pops).stop()
    h = bytecode.hash()

    n_pops, n_push = len(pops), len(pushes)
    sp0 = 1024 - n_pops
    rw = RWDictionary(9)
    for i, v in enumerate(pops):
        rw.stack_read(1, sp0 + i, v)
    sp1 = sp0 + n_pops - n_push
    for i, v in enumerate(pushes):
        rw.stack_write(1, sp1 + i, v)

    gas = constant_gas_cost(opcode) + dynamic_gas
    if gas_left is None:
        gas_left = gas

    tables = Tables(
        block_table=Block().table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
        exp_table=exp_table,
    )

    pc0 = 33 * n_pops
    steps = [
        StepState(
            execution_state=execution_state,
            rw_counter=9,
            call_id=1,
            is_root=True,
            is_create=False,
            code_hash=h,
            program_counter=pc0,
            stack_pointer=sp0,
            gas_left=gas_left,
        ),
        StepState(
            execution_state=ExecutionState.STOP,
            rw_counter=9 + n_pops + n_push,
            call_id=1,
            is_root=True,
            is_create=False,
            code_hash=h,
            program_counter=pc0 + 1,
            stack_pointer=sp1,
            gas_left=gas_left - gas,
        ),
    ]
    verify_steps(tables=tables, steps=steps, success=success)
