"""Full ErrorStack (opcode, stack_pointer) conformance matrix.

The reference (tests/evm/test_error_stack.py:1-144) spot-checks underflow
and overflow scenarios; the responsible-opcode pair set itself lives in
``ExecutionState.responsible_opcode()`` (reference
evm_circuit/execution_state.py:143-362).  Here we sweep the ENTIRE pair
registry — every (opcode, stack_pointer) that must be accepted by the
ErrorStack gadget's fixed-table lookup — plus sampled valid pairs that
must be rejected.  This validates the fixed ResponsibleOpcode predicate
bit-exactly against the opcode min/max stack-pointer tables
(reference evm_circuit/opcode.py tail)."""
import sys
from collections import defaultdict
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from zkevm_specs_tpu.evm import (
    Block,
    Bytecode,
    CallContextFieldTag,
    ExecutionState,
    Opcode,
    RWDictionary,
    StepState,
    Tables,
    Transaction,
    verify_steps,
)
from zkevm_specs_tpu.evm.opcode import (
    max_stack_pointer,
    min_stack_pointer,
    stack_overflow_pairs,
    stack_underflow_pairs,
    valid_opcodes,
)


def _run_error_stack(op: int, sp: int, success: bool = True):
    bytecode = Bytecode(bytearray([op]))
    rw = RWDictionary(24).call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    tables = Tables(
        block_table=Block().table_assignments(),
        tx_table=Transaction().table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
    )
    steps = [
        StepState(execution_state=ExecutionState.ErrorStack, rw_counter=24,
                  call_id=1, is_root=True, code_hash=bytecode.hash(),
                  program_counter=0, stack_pointer=sp, gas_left=3),
        StepState(execution_state=ExecutionState.EndTx, rw_counter=25,
                  call_id=1),
    ]
    verify_steps(tables=tables, steps=steps, success=success)


def _pairs_by_opcode(pairs):
    by_op = defaultdict(list)
    for op, sp in pairs:
        by_op[op].append(sp)
    return sorted(by_op.items())


_UNDERFLOW = _pairs_by_opcode(stack_underflow_pairs())
_OVERFLOW = _pairs_by_opcode(stack_overflow_pairs())


def test_registry_shape():
    """The pair registry matches the reference's counts: every valid opcode
    with max_stack_pointer < 1024 contributes its underflow band, every
    opcode with min_stack_pointer > 0 its overflow band."""
    n_under = sum(1024 - max_stack_pointer(op) for op in valid_opcodes()
                  if max_stack_pointer(op) < 1024)
    n_over = sum(min_stack_pointer(op) for op in valid_opcodes()
                 if min_stack_pointer(op) > 0)
    assert n_under == len(stack_underflow_pairs())
    assert n_over == len(stack_overflow_pairs())
    assert n_under + n_over > 400  # the matrix is genuinely dense


@pytest.mark.parametrize(
    "op,sps", _UNDERFLOW,
    ids=[Opcode(op).name for op, _ in _UNDERFLOW])
def test_stack_underflow_all_pairs(op, sps):
    """Every registered underflow stack pointer for this opcode is accepted
    by the ErrorStack gadget (too few operands on the stack)."""
    for sp in sps:
        _run_error_stack(op, sp)


@pytest.mark.parametrize(
    "op,sps", _OVERFLOW,
    ids=[Opcode(op).name for op, _ in _OVERFLOW])
def test_stack_overflow_all_pairs(op, sps):
    """Every registered overflow stack pointer for this opcode is accepted
    (push depth would exceed 1024)."""
    for sp in sps:
        _run_error_stack(op, sp)


# Valid (opcode, sp) pairs — the gadget must REJECT these: the fixed-table
# membership fails, so the step is unprovable as ErrorStack.
_VALID_SAMPLES = [
    (int(Opcode.ADD), 1022),       # exactly enough operands
    (int(Opcode.ADD), 512),        # mid-stack
    (int(Opcode.PUSH1), 1),        # room to push
    (int(Opcode.PUSH1), 1024),     # empty stack, push is fine
    (int(Opcode.DUP16), 1008),     # deepest reachable dup
    (int(Opcode.SWAP16), 1007),
    (int(Opcode.CALL), 1017),      # 7 operands available
    (int(Opcode.ADDMOD), 1021),
    (int(Opcode.STOP), 0),         # STOP never errors on stack
    (int(Opcode.STOP), 1024),
    (int(Opcode.JUMPDEST), 500),
]


@pytest.mark.parametrize(
    "op,sp", _VALID_SAMPLES,
    ids=[f"{Opcode(op).name}-sp{sp}" for op, sp in _VALID_SAMPLES])
def test_valid_pair_rejected(op, sp):
    _run_error_stack(op, sp, success=False)


def test_boundary_band_edges():
    """The band edges are exact: sp one step inside the valid region is
    rejected, the first invalid sp is accepted, for a representative set."""
    for op in (int(Opcode.ADD), int(Opcode.MULMOD), int(Opcode.DUP1),
               int(Opcode.SWAP1), int(Opcode.CALL), int(Opcode.LOG4)):
        max_sp = max_stack_pointer(op)
        if max_sp < 1024:
            _run_error_stack(op, max_sp + 1)               # first underflow
            _run_error_stack(op, max_sp, success=False)    # last valid
    for op in (int(Opcode.PUSH32), int(Opcode.DUP1), int(Opcode.MSIZE)):
        min_sp = min_stack_pointer(op)
        if min_sp > 0:
            _run_error_stack(op, min_sp - 1)               # last overflow
            _run_error_stack(op, min_sp, success=False)    # first valid
