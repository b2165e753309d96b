"""Block-level conformance for reverting frames and error halts: whole-block
witnesses traced by witness/tracer.py containing REVERT (root and subcall),
error halts (invalid jump / stack / OOG / invalid opcode), with reversion-
mirrored writes, verified through every sub-circuit (the integrated-witness
analog of reference tests/evm/test_callop.py's reverting callees and the
rw_counter_end_of_reversion flows of reference evm_circuit/typing.py:464-845).
"""
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))

from zkevm_specs_tpu.circuits.super_circuit import verify_super_circuit
from zkevm_specs_tpu.evm.execution_state import ExecutionState
from zkevm_specs_tpu.tables.schemas import Target
from zkevm_specs_tpu.witness.tracer import trace_block
from zkevm_specs_tpu.witness.typing import Account, Block, Bytecode, Transaction


def _tx(gas=1000000, value=0, **kw):
    return Transaction(id=1, gas=gas, gas_price=int(2e9), caller_address=0xFE,
                       callee_address=0xFF, value=value, **kw)


def _trace(bc, accounts=None, gas=1000000, value=0):
    return trace_block(Block(base_fee=int(1e9)), [(_tx(gas=gas, value=value), bc)],
                       accounts=accounts)


# -- root-frame REVERT -------------------------------------------------------

def test_block_root_revert():
    """SSTORE + warm SLOAD then REVERT at the root: the storage write, the
    access-list entries and the refund are mirror-reverted; the receipt
    status is 0."""
    bc = (Bytecode()
          .push1(0x2A).push1(0x07).sstore()      # slot 7 := 42 (cold)
          .push1(0x07).sload().pop()             # warm read back
          .push1(0).push1(0).revert())
    w = _trace(bc)
    assert w.tx_success == [False]
    states = {s.execution_state for s in w.steps}
    assert ExecutionState.RETURN in states  # REVERT shares the RETURN state
    # the mirror section exists: storage write reverted to 0
    storage_rows = [r for r in w.rw.rws if r["key0"] == int(Target.AccountStorage)]
    assert any(r["rw"] == 1 and r["value"] == 0 and r["value_prev"] == 0x2A
               for r in storage_rows), "storage mirror write missing"
    verify_super_circuit(w)


def test_block_root_revert_corrupt_mirror_rejected():
    bc = Bytecode().push1(0x2A).push1(0x07).sstore().push1(0).push1(0).revert()
    w = _trace(bc)
    # corrupt the reversion mirror of the storage write (the highest-counter
    # AccountStorage write row)
    mirrors = [r for r in w.rw.rws
               if r["key0"] == int(Target.AccountStorage) and r["rw"] == 1]
    mirrors.sort(key=lambda r: r["rw_counter"])
    mirrors[-1]["value"] = 99
    with pytest.raises(AssertionError):
        verify_super_circuit(w)


def test_block_revert_returns_data():
    """REVERT at root with a non-empty memory chunk (expansion gas)."""
    bc = (Bytecode()
          .push32(0xDEAD).push1(0).mstore()
          .push1(32).push1(0).revert())
    w = _trace(bc)
    verify_super_circuit(w)


# -- subcall REVERT ----------------------------------------------------------

def _call(bc, target, gas=0xFFFF, value=0, cd=(0, 0), rd=(0, 0)):
    return bc.push1(rd[1]).push1(rd[0]).push1(cd[1]).push1(cd[0]) \
             .push1(value).push2(target).push2(gas).call().pop()


def test_block_subcall_revert():
    """A callee SSTOREs, LOGs, and REVERTs (with return data): its writes
    mirror into its own reversion section, its log is discarded, the caller
    observes is_success == 0 and continues to a successful STOP."""
    callee = (Bytecode()
              .push1(0x55).push1(0x09).sstore()
              .push1(0).push1(0).log1()
              .push32(0xBAD).push1(0).mstore()
              .push1(32).push1(0).revert())
    caller = Bytecode()
    _call(caller, 0x5000, rd=(0, 32))
    caller.push1(1).push1(0x11).sstore()   # caller write AFTER the revert
    caller.stop()
    accounts = {0x5000: Account(address=0x5000, code=callee)}
    w = _trace(caller, accounts)
    assert w.tx_success == [True]
    # callee's slot 9 reverted; caller's slot 0x11 persists
    sw = [r for r in w.rw.rws if r["key0"] == int(Target.AccountStorage)]
    assert any(r["storage_key"] == 9 and r["rw"] == 1 and r["value"] == 0
               for r in sw), "callee storage mirror missing"
    # no TxLog rows from the reverted callee
    assert not any(r["key0"] == int(Target.TxLog) for r in w.rw.rws)
    verify_super_circuit(w)


def test_block_nested_revert_inside_reverting_caller():
    """caller frame reverts AFTER a successful subcall: the subcall's writes
    are chained into the caller's reversion section
    (rw_counter_end_of_reversion - (rev + 1) chaining)."""
    inner = Bytecode().push1(0x66).push1(0x0A).sstore().push1(0).push1(0).return_()
    outer = Bytecode()
    outer.push1(0x77).push1(0x0B).sstore()
    _call(outer, 0x6000)
    outer.push1(0).push1(0).revert()
    root = Bytecode()
    _call(root, 0x5000)
    root.stop()
    accounts = {
        0x5000: Account(address=0x5000, code=outer),
        0x6000: Account(address=0x6000, code=inner),
    }
    w = _trace(root, accounts)
    assert w.tx_success == [True]
    sw = [r for r in w.rw.rws if r["key0"] == int(Target.AccountStorage)]
    # both slot 0x0A (inner, chained) and 0x0B (outer) are mirror-reverted
    for slot in (0x0A, 0x0B):
        assert any(r["storage_key"] == slot and r["rw"] == 1 and r["value"] == 0
                   for r in sw), f"slot {slot} mirror missing"
    verify_super_circuit(w)


def test_block_revert_with_value_transfer():
    """CALL with value to a reverting callee: the transfer is reverted in
    the callee's mirror section (balance write pair)."""
    callee = Bytecode().push1(0).push1(0).revert()
    caller = Bytecode()
    _call(caller, 0x5000, value=7)
    caller.stop()
    accounts = {
        0xFF: Account(address=0xFF, balance=100),
        0x5000: Account(address=0x5000, balance=1, code=callee),
    }
    w = _trace(caller, accounts, value=0)
    verify_super_circuit(w)


# -- error halts -------------------------------------------------------------

def test_block_invalid_jump_root():
    bc = Bytecode().push1(3).jump()  # dest 3 is not a JUMPDEST
    w = _trace(bc)
    states = {s.execution_state for s in w.steps}
    assert ExecutionState.ErrorInvalidJump in states
    assert w.tx_success == [False]
    verify_super_circuit(w)


def test_block_invalid_jumpi_taken():
    bc = Bytecode().push1(1).push1(60).swap1().jumpi()
    w = _trace(bc)
    assert ExecutionState.ErrorInvalidJump in {s.execution_state for s in w.steps}
    verify_super_circuit(w)


def test_block_jumpi_not_taken_is_no_error():
    bc = Bytecode().push1(0).push1(60).swap1().pop().pop().stop()
    w = _trace(bc)
    assert ExecutionState.ErrorInvalidJump not in {s.execution_state for s in w.steps}
    verify_super_circuit(w)


def test_block_stack_underflow():
    bc = Bytecode().pop()  # POP on empty stack
    w = _trace(bc)
    assert ExecutionState.ErrorStack in {s.execution_state for s in w.steps}
    verify_super_circuit(w)


def test_block_oog_constant():
    bc = Bytecode().push1(1).push1(2).add().pop().stop()
    # base tx cost 21000; give 21005 so the 3rd opcode runs out
    w = _trace(bc, gas=21008)
    assert ExecutionState.ErrorOutOfGasConstant in {s.execution_state
                                                    for s in w.steps}
    verify_super_circuit(w)


def test_block_invalid_opcode():
    bc = Bytecode()
    bc.code.append(0xEF)  # invalid opcode
    bc.is_code.append(True)
    w = _trace(bc)
    assert ExecutionState.ErrorInvalidOpcode in {s.execution_state
                                                 for s in w.steps}
    verify_super_circuit(w)


def test_block_error_in_subcall_restores_caller():
    """An invalid jump inside a subcall consumes the callee's gas and the
    caller resumes with is_success == 0."""
    callee = Bytecode().push1(0x42).push1(0x0C).sstore().push1(9).jump()
    caller = Bytecode()
    _call(caller, 0x5000)
    caller.push1(5).push1(0x0D).sstore()
    caller.stop()
    accounts = {0x5000: Account(address=0x5000, code=callee)}
    w = _trace(caller, accounts)
    assert ExecutionState.ErrorInvalidJump in {s.execution_state for s in w.steps}
    assert w.tx_success == [True]
    sw = [r for r in w.rw.rws if r["key0"] == int(Target.AccountStorage)]
    assert any(r["storage_key"] == 0x0C and r["rw"] == 1 and r["value"] == 0
               for r in sw), "errored callee's write not mirror-reverted"
    verify_super_circuit(w)


def test_block_revert_corrupt_status_rejected():
    """A reverted tx whose receipt claims success must be rejected."""
    bc = Bytecode().push1(0).push1(0).revert()
    w = _trace(bc)
    from zkevm_specs_tpu.tables.schemas import TxReceiptFieldTag

    for r in w.rw.rws:
        if (r["key0"] == int(Target.TxReceipt)
                and r["field_tag"] == int(TxReceiptFieldTag.PostStateOrStatus)):
            r["value"] = 1
    with pytest.raises(AssertionError):
        verify_super_circuit(w)


# -- extended error-state coverage (errors.py gadget family) -----------------

def _subcall(bc, target, gas_arg):
    """CALL with a small gas argument to force precise OOG inside the callee."""
    return bc.push1(0).push1(0).push1(0).push1(0).push1(0).push2(target) \
             .push2(gas_arg).call().pop()


def _error_block(callee: Bytecode, gas_arg: int, expect: ExecutionState,
                 accounts=None):
    caller = Bytecode()
    _subcall(caller, 0x5000, gas_arg)
    caller.stop()
    accounts = accounts or {}
    accounts[0x5000] = Account(address=0x5000, code=callee)
    w = _trace(caller, accounts)
    states = {s.execution_state for s in w.steps}
    assert expect in states, sorted(s.name for s in states)
    assert w.tx_success == [True]
    verify_super_circuit(w)
    return w


def test_block_write_protection():
    callee = Bytecode().push1(1).push1(2).sstore()
    caller = Bytecode()
    caller.push1(0).push1(0).push1(0).push1(0).push2(0x5000) \
          .push2(0xFFFF).staticcall().pop().stop()
    accounts = {0x5000: Account(address=0x5000, code=callee)}
    w = _trace(caller, accounts)
    assert ExecutionState.ErrorWriteProtection in {s.execution_state
                                                   for s in w.steps}
    verify_super_circuit(w)


def test_block_oog_account_access():
    callee = Bytecode().push1(0xAB).balance()
    _error_block(callee, 300, ExecutionState.ErrorOutOfGasAccountAccess)


def test_block_oog_account_access_dirty_address():
    """A BALANCE operand with bits above 160 set: geth truncates the
    address, so the traced access-list key is the low 160 bits and the
    gadget (word_to_address_truncated) still proves the step (ADVICE r4)."""
    dirty = (0xDEAD << 160) | 0xAB
    callee = Bytecode().push32(dirty).balance()
    _error_block(callee, 300, ExecutionState.ErrorOutOfGasAccountAccess)


def test_block_oog_memory_copy_dirty_extcodecopy_address():
    """EXTCODECOPY OOG with a dirty-high-bit external address: the warm-set
    key and access-list row use the truncated 160-bit address."""
    dirty = (0xBEEF << 160) | 0xCD
    callee = (Bytecode().push3(0x100000).push1(0).push1(0)
              .push32(dirty).extcodecopy())
    _error_block(callee, 5000, ExecutionState.ErrorOutOfGasMemoryCopy)


def test_block_oog_static_memory_expansion():
    callee = Bytecode().push1(0).push3(0x100000).mstore()
    _error_block(callee, 5000, ExecutionState.ErrorOutOfGasStaticMemoryExpansion)


def test_block_oog_dynamic_memory_expansion():
    callee = Bytecode().push3(0x100000).push1(0).return_()
    _error_block(callee, 5000, ExecutionState.ErrorOutOfGasDynamicMemoryExpansion)


def test_block_oog_memory_copy():
    callee = Bytecode().push3(0x100000).push1(0).push1(0).calldatacopy()
    _error_block(callee, 5000, ExecutionState.ErrorOutOfGasMemoryCopy)


def test_block_returndata_out_of_bound():
    returning = Bytecode().push1(1).push1(0).mstore8().push1(1).push1(0).return_()
    callee = Bytecode()
    callee.push1(1).push1(0).push1(0).push1(0).push2(0x6000) \
          .push2(0xFFFF).staticcall().pop()
    callee.push1(32).push1(16).push1(0).returndatacopy()
    accounts = {0x6000: Account(address=0x6000, code=returning)}
    _error_block(callee, 0xFFFF, ExecutionState.ErrorReturnDataOutOfBound,
                 accounts)


def test_block_oog_sstore_sentry():
    callee = Bytecode().push1(1).push1(2).sstore()
    _error_block(callee, 2000, ExecutionState.ErrorOutOfGasSloadSstore)


def test_block_oog_sload():
    callee = Bytecode().push1(2).sload()
    _error_block(callee, 500, ExecutionState.ErrorOutOfGasSloadSstore)


def test_block_oog_log():
    callee = Bytecode().push3(0x100000).push1(0).log0()
    _error_block(callee, 5000, ExecutionState.ErrorOutOfGasLOG)


def test_block_oog_exp():
    callee = Bytecode().push32(1 << 200).push1(2).exp()
    _error_block(callee, 100, ExecutionState.ErrorOutOfGasEXP)


def test_block_oog_sha3():
    callee = Bytecode().push3(0x100000).push1(0).sha3()
    _error_block(callee, 5000, ExecutionState.ErrorOutOfGasSHA3)


def test_block_oog_call():
    inner = Bytecode().stop()
    callee = Bytecode()
    callee.push1(0).push1(0).push1(0).push1(0).push1(0).push2(0x6000) \
          .push2(0xFF).call()
    accounts = {0x6000: Account(address=0x6000, code=inner)}
    _error_block(callee, 150, ExecutionState.ErrorOutOfGasCall, accounts)


# -- copy-edge sweeps (out-of-bound / zero-length, reference
# tests/evm/test_calldatacopy.py cartesian style) ----------------------------

@pytest.mark.parametrize("data_offset,length", [
    (0, 0),      # zero-length
    (0, 8),      # in-bounds
    (28, 16),    # straddles the calldata end (pad reads)
    (64, 8),     # fully out of bounds (all pad)
])
def test_block_calldatacopy_edges(data_offset, length):
    bc = (Bytecode()
          .push1(length).push1(data_offset).push1(0).calldatacopy().stop())
    w = _trace_cd(bc, call_data=bytes(range(1, 33)))
    verify_super_circuit(w)


@pytest.mark.parametrize("code_offset,length", [(0, 4), (2, 64), (200, 8), (0, 0)])
def test_block_codecopy_edges(code_offset, length):
    bc = (Bytecode()
          .push1(length).push1(code_offset).push1(0).codecopy().stop())
    w = _trace(bc)
    verify_super_circuit(w)


def test_block_returndatacopy_exact_bound():
    """RETURNDATACOPY of exactly the full return buffer (no error)."""
    returning = Bytecode().push1(0x7F).push1(0).mstore8().push1(1).push1(0).return_()
    caller = Bytecode()
    caller.push1(1).push1(0).push1(0).push1(0).push2(0x6000) \
          .push2(0xFFFF).staticcall().pop()
    caller.push1(1).push1(0).push1(0x40).returndatacopy().stop()
    accounts = {0x6000: Account(address=0x6000, code=returning)}
    w = _trace(caller, accounts)
    verify_super_circuit(w)


def _trace_cd(bc, call_data):
    return trace_block(Block(base_fee=int(1e9)),
                       [(_tx(call_data=call_data), bc)])


def test_block_gas_uint_overflow():
    """MLOAD at an offset whose memory size overflows u64 (in a subcall so
    the gadget's calldata section is skipped)."""
    callee = Bytecode().push32(1 << 65).mload()
    caller = Bytecode()
    _call(caller, 0x5000, gas=0xFFFF)
    caller.stop()
    accounts = {0x5000: Account(address=0x5000, code=callee)}
    w = _trace(caller, accounts)
    assert ExecutionState.ErrorGasUintOverflow in {s.execution_state
                                                   for s in w.steps}
    verify_super_circuit(w)


# -- invalid-jump destination boundary matrix ---------------------------------
# (reference tests/evm/test_error_invalid_jump.py:1-150 destination classes,
# driven end-to-end through the tracer's pre-dispatch error classification)

def test_block_jump_into_push_data():
    """A JUMPDEST byte inside PUSH data is NOT code (is_code=0): jumping
    there is an invalid jump even though the byte value is 0x5B."""
    # PUSH2 0x5B5B puts 0x5B at pc 1 and 2 as DATA; then jump to 1
    bc = Bytecode().push2(0x5B5B).pop().push1(1).jump()
    w = _trace(bc)
    assert ExecutionState.ErrorInvalidJump in {s.execution_state for s in w.steps}
    assert w.tx_success == [False]
    verify_super_circuit(w)


def test_block_jump_to_code_end():
    """dest == code length (one past the last byte) is out of range."""
    bc = Bytecode().push1(4).jump()  # code is exactly 4 bytes: 60 04 56 ...
    code_len = len(bc.code)
    bc2 = Bytecode().push1(code_len).jump()
    w = _trace(bc2)
    assert ExecutionState.ErrorInvalidJump in {s.execution_state for s in w.steps}
    verify_super_circuit(w)


def test_block_jump_to_huge_dest():
    """A 2^63-scale destination (word far beyond any code) is invalid."""
    bc = Bytecode().push32(1 << 63).jump()
    w = _trace(bc)
    assert ExecutionState.ErrorInvalidJump in {s.execution_state for s in w.steps}
    verify_super_circuit(w)


def test_block_jump_valid_dest_after_push_data():
    """A real JUMPDEST after PUSH data is reachable; the 0x5B bytes inside
    the push data do not confuse the is_code map."""
    # layout: PUSH2 0x5B5B | POP | PUSH1 dest | JUMP | JUMPDEST | STOP
    bc = Bytecode().push2(0x5B5B).pop().push1(7).jump().jumpdest().stop()
    w = _trace(bc)
    assert ExecutionState.ErrorInvalidJump not in {s.execution_state for s in w.steps}
    assert w.tx_success == [True]
    verify_super_circuit(w)


def test_block_jumpi_huge_dest_not_taken():
    """JUMPI with an out-of-range dest but condition 0 is NOT an error."""
    bc = Bytecode().push1(0).push32(1 << 200).swap1().pop().pop().stop()
    w = _trace(bc)
    assert ExecutionState.ErrorInvalidJump not in {s.execution_state for s in w.steps}
    verify_super_circuit(w)


def test_block_jump_in_subcall_restores_caller():
    """An invalid jump inside a subcall halts the callee only; the caller
    continues and succeeds."""
    callee = Bytecode().push1(60).jump()
    w = trace_block(
        Block(base_fee=int(1e9)),
        [(_tx(), _call(Bytecode(), 0x600, gas=0xFFFF).stop())],
        accounts={0x600: Account(address=0x600, code=callee)})
    states = {s.execution_state for s in w.steps}
    assert ExecutionState.ErrorInvalidJump in states
    assert w.tx_success == [True]
    verify_super_circuit(w)
