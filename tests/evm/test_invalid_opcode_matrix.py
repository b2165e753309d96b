"""Full ErrorInvalidOpcode conformance matrix.

The reference (tests/evm/test_error_invalid_opcode.py:19-37) samples ~15
invalid byte codes; the authoritative set is ``invalid_opcodes()``
(reference evm_circuit/opcode.py tail).  Here we sweep ALL 113 invalid
bytes through the gadget, plus multi-byte and repeated invalid code
shapes from the reference vectors, plus every VALID opcode as a
rejection case (the fixed-table predicate must not over-accept)."""
import sys
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
from zkevm_specs_tpu.evm.opcode import invalid_opcodes, is_push_with_data, valid_opcodes


def _run_invalid(code: bytearray, pc: int, success: bool = True):
    bytecode = Bytecode(code)
    rw = RWDictionary(24).call_context_read(1, CallContextFieldTag.IsSuccess, 0)
    tables = Tables(
        block_table=Block().table_assignments(),
        tx_table=Transaction().table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
    )
    steps = [
        StepState(execution_state=ExecutionState.ErrorInvalidOpcode,
                  rw_counter=24, call_id=1, is_root=True,
                  code_hash=bytecode.hash(), program_counter=pc,
                  stack_pointer=1024, gas_left=0),
        StepState(execution_state=ExecutionState.EndTx, rw_counter=25,
                  call_id=1),
    ]
    verify_steps(tables=tables, steps=steps, success=success)


_INVALID = invalid_opcodes()


def test_invalid_set_shape():
    """113 invalid bytes = 256 - 143 valid opcodes (reference opcode.py)."""
    assert len(_INVALID) + len(valid_opcodes()) == 256
    assert 0xFE in _INVALID  # designated INVALID
    assert 0x0C in _INVALID


@pytest.mark.parametrize("chunk", range(8))
def test_all_invalid_bytes_accepted(chunk):
    """Every invalid byte, as a single-opcode program, proves as
    ErrorInvalidOpcode (split into chunks to keep per-test time small)."""
    for op in _INVALID[chunk::8]:
        _run_invalid(bytearray([op]), 0)


def test_invalid_mid_code():
    """Invalid byte in the middle of otherwise-valid code, pc pointing at it
    (reference multi-opcode vectors)."""
    code = bytearray([int(Opcode.JUMPDEST), 0x5E, int(Opcode.STOP)])
    _run_invalid(code, 1)


def test_many_duplicate_invalid():
    """[0x22] * 256 — reference's duplicate-row vector (the bytecode table
    must hold all rows with correct multiplicity)."""
    _run_invalid(bytearray([0x22] * 256), 128)


def test_sequence_of_distinct_invalid():
    code = bytearray([0x5C, 0x5D, 0x5E][i % 3] for i in range(12))
    for pc in (0, 5, 11):
        _run_invalid(code, pc)


@pytest.mark.parametrize("chunk", range(4))
def test_all_valid_bytes_rejected(chunk):
    """Every VALID opcode byte must NOT prove as ErrorInvalidOpcode.
    Push opcodes get trailing data bytes so pc=0 is a code byte."""
    for op in valid_opcodes()[chunk::4]:
        n_data = 32 if is_push_with_data(op) else 0
        code = bytearray([int(op)] + [0] * n_data)
        _run_invalid(code, 0, success=False)
