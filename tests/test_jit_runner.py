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
