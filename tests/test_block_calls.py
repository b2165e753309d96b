"""Block-level conformance for the CALL family: whole-block witnesses with
subcalls, context save/restore, and cross-frame data movement, verified
through every sub-circuit (cf. reference tests/evm/test_callop.py)."""
import pytest

from zkevm_specs_tpu.circuits.super_circuit import verify_super_circuit
from zkevm_specs_tpu.evm.execution_state import ExecutionState
from zkevm_specs_tpu.witness.tracer import trace_block
from zkevm_specs_tpu.witness.typing import Account, Block, Bytecode, Transaction

CALLEE_A = 0xAA
CALLEE_B = 0xBB


def run_block(root_code, accounts=None, gas=1000000):
    block = Block(base_fee=int(1e9))
    tx = Transaction(id=1, gas=gas, gas_price=int(2e9),
                     caller_address=0xFE, callee_address=0xFF,
                     call_data=bytes(range(1, 17)))
    witness = trace_block(block, [(tx, root_code)], accounts=accounts or {})
    verify_super_circuit(witness)
    return witness


def stop_callee():
    return Account(address=CALLEE_A, balance=0,
                   code=Bytecode().push1(7).pop().stop())


def return_callee():
    # stores 0x42 at mem[0..32) and returns the 32-byte chunk
    return Account(address=CALLEE_A, balance=0,
                   code=Bytecode().push1(0x42).push1(0).mstore()
                                  .push1(32).push1(0).return_())


def test_call_stop_callee():
    code = (Bytecode()
            .push1(0).push1(0).push1(0).push1(0).push1(0)
            .push2(CALLEE_A).push2(0xFFFF).call().pop().stop())
    w = run_block(code, {CALLEE_A: stop_callee()})
    states = {s.execution_state for s in w.steps}
    assert ExecutionState.CALL_OP in states
    # callee frame steps are non-root
    assert any(not s.is_root for s in w.steps)


def test_call_return_callee_and_returndatacopy():
    # rd region mem[64..96); then RETURNDATACOPY pulls the data again
    code = (Bytecode()
            .push1(32).push1(64).push1(0).push1(0).push1(0)
            .push2(CALLEE_A).push2(0xFFFF).call().pop()
            .returndatasize().pop()
            .push1(8).push1(0).push1(96).returndatacopy()
            .stop())
    w = run_block(code, {CALLEE_A: return_callee()})
    states = {s.execution_state for s in w.steps}
    assert ExecutionState.RETURN in states
    assert ExecutionState.RETURNDATACOPY in states


def test_call_with_value_transfer():
    code = (Bytecode()
            .push1(0).push1(0).push1(0).push1(0).push1(5)  # value 5
            .push2(CALLEE_A).push2(0xFFFF).call().pop().stop())
    # seed the root contract with balance so the transfer doesn't underflow
    run_block(code, {CALLEE_A: stop_callee(),
                     0xFF: Account(address=0xFF, balance=1000)})


def test_call_warm_then_cold():
    code = (Bytecode()
            .push1(0).push1(0).push1(0).push1(0).push1(0)
            .push2(CALLEE_A).push2(0xFFFF).call().pop()
            .push1(0).push1(0).push1(0).push1(0).push1(0)
            .push2(CALLEE_A).push2(0xFFFF).call().pop()
            .stop())
    run_block(code, {CALLEE_A: stop_callee()})


def test_staticcall():
    code = (Bytecode()
            .push1(0).push1(0).push1(0).push1(0)
            .push2(CALLEE_A).push2(0xFFFF).staticcall().pop().stop())
    run_block(code, {CALLEE_A: stop_callee()})


def test_delegatecall_preserves_context():
    # callee code runs with the root's storage context: SLOAD hits the
    # root contract's (empty) storage, ADDRESS pushes the root's address
    callee = Account(address=CALLEE_A, balance=0,
                     code=Bytecode().address().pop().caller().pop()
                                    .callvalue().pop().stop())
    code = (Bytecode()
            .push1(0).push1(0).push1(0).push1(0)
            .push2(CALLEE_A).push2(0xFFFF).delegatecall().pop().stop())
    run_block(code, {CALLEE_A: callee})


def test_callcode():
    code = (Bytecode()
            .push1(0).push1(0).push1(0).push1(0).push1(0)
            .push2(CALLEE_A).push2(0xFFFF).callcode().pop().stop())
    run_block(code, {CALLEE_A: stop_callee()})


def test_call_to_empty_account():
    # no code at the target: the no-callee-code branch stays in the caller
    code = (Bytecode()
            .push1(0).push1(0).push1(0).push1(0).push1(0)
            .push2(0xD00D).push2(0xFFFF).call().pop().stop())
    run_block(code)


def test_nested_calls():
    # root -> A -> B, each callee halts with STOP
    b_acct = Account(address=CALLEE_B, balance=0,
                     code=Bytecode().push1(1).pop().stop())
    a_code = (Bytecode()
              .push1(0).push1(0).push1(0).push1(0).push1(0)
              .push2(CALLEE_B).push2(0xFFFF).call().pop().stop())
    a_acct = Account(address=CALLEE_A, balance=0, code=a_code)
    root = (Bytecode()
            .push1(0).push1(0).push1(0).push1(0).push1(0)
            .push2(CALLEE_A).push2(0xFFFF).call().pop().stop())
    w = run_block(root, {CALLEE_A: a_acct, CALLEE_B: b_acct})
    depths = [s for s in w.steps if not s.is_root]
    assert depths, "expected non-root steps"


def test_call_subcall_uses_calldata():
    # callee reads its calldata (a slice of the caller's memory)
    callee = Account(address=CALLEE_A, balance=0,
                     code=Bytecode().push1(0).calldataload().pop()
                                    .calldatasize().pop()
                                    .push1(8).push1(0).push1(32).calldatacopy()
                                    .stop())
    code = (Bytecode()
            .push1(0x77).push1(0).mstore()          # caller memory[0..32)
            .push1(0).push1(0).push1(16).push1(0).push1(0)
            .push2(CALLEE_A).push2(0xFFFF).call().pop().stop())
    run_block(code, {CALLEE_A: callee})


def test_call_corrupt_restore_rejected():
    code = (Bytecode()
            .push1(0).push1(0).push1(0).push1(0).push1(0)
            .push2(CALLEE_A).push2(0xFFFF).call().pop().stop())
    block = Block(base_fee=int(1e9))
    tx = Transaction(id=1, gas=1000000, gas_price=int(2e9),
                     caller_address=0xFE, callee_address=0xFF)
    witness = trace_block(block, [(tx, code)], accounts={CALLEE_A: stop_callee()})
    # corrupt the saved caller GasLeft so the restored context mismatches
    from zkevm_specs_tpu.tables.schemas import CallContextFieldTag, Target

    for row in witness.rw.rws:
        if (row["key0"] == int(Target.CallContext) and row["rw"] == 1
                and row["address"] == int(CallContextFieldTag.GasLeft)):
            row["value"] += 1
            break
    with pytest.raises(AssertionError):
        verify_super_circuit(witness)
