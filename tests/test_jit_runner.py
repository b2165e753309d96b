"""The jit/TPU production path must produce the same verdicts as eager spec
mode (here exercised on the CPU backend)."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))

from zkevm_specs_tpu.evm import (
    Block,
    Bytecode,
    ExecutionState,
    RWDictionary,
    StepState,
    Tables,
)
from zkevm_specs_tpu.runtime.jit import CompiledGroupVerifier
from common import rand_word


pytestmark = pytest.mark.slow  # compile-heavy: excluded from `make test-fast`


def build_add_batch(n_steps, corrupt_lane=None):
    bytecode = Bytecode().add(1, 2).stop()
    h = bytecode.hash()
    rw = RWDictionary(9)
    steps, nexts = [], []
    rwc = 9
    for i in range(n_steps):
        a, b = rand_word(), rand_word()
        c = (a + b) % 2**256
        if i == corrupt_lane:
            c = (c + 1) % 2**256
        rw.stack_read(1, 1022, a).stack_read(1, 1023, b).stack_write(1, 1023, c)
        steps.append(
            StepState(ExecutionState.ADD, rwc, call_id=1, is_root=True,
                      code_hash=h, program_counter=66, stack_pointer=1022,
                      gas_left=3)
        )
        nexts.append(
            StepState(ExecutionState.STOP, rwc + 3, call_id=1, is_root=True,
                      code_hash=h, program_counter=67, stack_pointer=1023,
                      gas_left=0)
        )
        rwc += 3
    tables = Tables(
        block_table=Block().table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
    )
    return tables, steps, nexts


def test_jit_matches_eager_ok():
    tables, steps, nexts = build_add_batch(16)
    v = CompiledGroupVerifier(tables, ExecutionState.ADD, steps, nexts)
    fail = np.asarray(v(*v.prepare_inputs(steps, nexts)))
    assert not fail.any()


def test_jit_flags_corrupt_lane():
    tables, steps, nexts = build_add_batch(16, corrupt_lane=5)
    v = CompiledGroupVerifier(tables, ExecutionState.ADD, steps, nexts)
    fail = np.asarray(v(*v.prepare_inputs(steps, nexts)))
    assert fail[5] and fail.sum() == 1


def build_binop_batch(state, op_name, result_of, n_steps, corrupt_lane=None,
                      shift_style=False):
    """Batch of one 2-pop/1-push opcode; shared bytecode, per-lane rw rows."""
    from zkevm_specs_tpu.evm import Opcode
    from zkevm_specs_tpu.evm.opcode import constant_gas_cost

    op = Opcode[op_name]
    bytecode = getattr(Bytecode(), op_name.lower())(1, 2).stop()
    h = bytecode.hash()
    gas = constant_gas_cost(op)
    rw = RWDictionary(9)
    steps, nexts = [], []
    rwc = 9
    for i in range(n_steps):
        a = rand_word() % 512 if shift_style else rand_word()
        b = rand_word()
        c = result_of(a, b)
        if i == corrupt_lane:
            c = (c + 1) % 2**256
        rw.stack_read(1, 1022, a).stack_read(1, 1023, b).stack_write(1, 1023, c)
        steps.append(
            StepState(state, rwc, call_id=1, is_root=True, code_hash=h,
                      program_counter=66, stack_pointer=1022, gas_left=gas)
        )
        nexts.append(
            StepState(ExecutionState.STOP, rwc + 3, call_id=1, is_root=True,
                      code_hash=h, program_counter=67, stack_pointer=1023,
                      gas_left=0)
        )
        rwc += 3
    tables = Tables(
        block_table=Block().table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
    )
    return tables, steps, nexts


@pytest.mark.parametrize("state,op,fn,shift", [
    (ExecutionState.MUL, "MUL", lambda a, b: (a * b) % 2**256, False),
    (ExecutionState.MUL, "DIV", lambda a, b: a // b if b else 0, False),
    (ExecutionState.SHL_SHR, "SHL", lambda s, v: (v << s) % 2**256 if s < 256 else 0, True),
])
def test_jit_hinted_gadgets(state, op, fn, shift):
    """Gadgets whose constraints use host witness hints (quotients, byte
    decompositions) must compile and match spec-mode verdicts via the
    recorded hint stream."""
    tables, steps, nexts = build_binop_batch(state, op, fn, 8, shift_style=shift)
    v = CompiledGroupVerifier(tables, state, steps, nexts)
    if op in ("DIV", "SHL"):
        assert v.n_hints > 0, f"{op} gadget was expected to use witness hints"
    fail = np.asarray(v(*v.prepare_inputs(steps, nexts)))
    assert not fail.any()


def test_jit_hinted_flags_corrupt_lane():
    tables, steps, nexts = build_binop_batch(
        ExecutionState.MUL, "MUL", lambda a, b: (a * b) % 2**256, 8,
        corrupt_lane=3)
    v = CompiledGroupVerifier(tables, ExecutionState.MUL, steps, nexts)
    fail = np.asarray(v(*v.prepare_inputs(steps, nexts)))
    assert fail[3] and fail.sum() == 1


def test_jit_hint_rebatch():
    """prepare_inputs regenerates hints for a fresh batch under the compiled
    signature — verdicts must stay exact without recompiling."""
    tables, steps, nexts = build_binop_batch(
        ExecutionState.MUL, "MUL", lambda a, b: (a * b) % 2**256, 8)
    v = CompiledGroupVerifier(tables, ExecutionState.MUL, steps, nexts)
    tables2, steps2, nexts2 = build_binop_batch(
        ExecutionState.MUL, "MUL", lambda a, b: (a * b) % 2**256, 8,
        corrupt_lane=7)
    # same shared bytecode/tables shape: swap in the new rw table
    v2 = CompiledGroupVerifier(tables2, ExecutionState.MUL, steps2, nexts2)
    fail = np.asarray(v2(*v2.prepare_inputs(steps2, nexts2)))
    assert fail[7] and fail.sum() == 1
