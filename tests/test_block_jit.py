"""CompiledBlockVerifier: production (jit) whole-block verification must
reproduce the spec-mode super-circuit verdict exactly."""
import numpy as np
import pytest

from zkevm_specs_tpu.circuits.super_circuit import verify_super_circuit
from zkevm_specs_tpu.runtime.block import CompiledBlockVerifier
from zkevm_specs_tpu.witness.tracer import trace_block
from zkevm_specs_tpu.witness.typing import Block, Bytecode, Transaction


def _block(n_txs=2, n_ops=6):
    block = Block(base_fee=int(1e9))
    txs = []
    for i in range(n_txs):
        bytecode = Bytecode()
        for j in range(n_ops):
            bytecode.push1(j).push1(j + 1).add().pop()
        bytecode.stop()
        txs.append((Transaction(id=i + 1, gas=100000, gas_price=int(2e9),
                                caller_address=0xFE, callee_address=0xFF + i),
                    bytecode))
    return trace_block(block, txs)


def test_block_jit_ok():
    witness = _block()
    verify_super_circuit(witness)  # spec mode accepts
    CompiledBlockVerifier(witness).verify()  # production mode agrees


def test_block_jit_flags_corrupt_step():
    witness = _block()
    # corrupt one ADD step's gas accounting
    for s in witness.steps:
        if s.execution_state.name == "ADD":
            s.gas_left += 1
            break
    bv = CompiledBlockVerifier(witness)
    with pytest.raises(AssertionError):
        bv.verify()


def test_block_jit_flags_corrupt_rw_value():
    from zkevm_specs_tpu.tables.schemas import RW, Target

    witness = _block()
    # corrupt a stack write in the rw table: EVM circuit lookup or the
    # state circuit consistency must flag it
    corrupted = False
    for row in witness.rw.rws:
        if row["key0"] == int(Target.Stack) and row["rw"] == int(RW.Write):
            row["value"] = (row["value"] + 1) % (1 << 256)
            corrupted = True
            break
    assert corrupted, "no stack write row found to corrupt"
    with pytest.raises(AssertionError):
        CompiledBlockVerifier(witness).verify()


def test_block_jit_padding_lanes_ignored():
    # a 3-step group pads to 4 lanes; the padded lane must not leak into
    # the verdict
    witness = _block(n_txs=1, n_ops=3)
    bv = CompiledBlockVerifier(witness, pad_pow2=True)
    assert all(len(g["curr"]) >= len(g["idxs"]) for g in bv.groups)
    bv.verify()


def _full_witness():
    """A block exercising every sub-circuit kernel: withdrawals (pi + wd),
    signed txs (tx + sig), bytecode/keccak always."""
    from zkevm_specs_tpu.circuits.tx import Transaction as SignedTx, sign_tx
    from zkevm_specs_tpu.witness.typing import Withdrawal

    bc = Bytecode().push1(1).push1(2).add().pop().stop()
    txs = [(Transaction(id=1, gas=100000, gas_price=int(2e9),
                        caller_address=0xFE, callee_address=0xFF), bc)]
    wds = [Withdrawal(0, 9, 0xABCD, 100), Withdrawal(1, 10, 0xABCE, 200)]
    signed = [sign_tx(7, SignedTx(nonce=0, gas_price=int(2e9), gas=100000,
                                  to=0xFF, value=0, data=b"", sig_v=0,
                                  sig_r=0, sig_s=0), 1337)]
    w = trace_block(Block(base_fee=int(1e9)), txs, withdrawals=wds)
    w.signed_txs = signed
    return w, signed


def test_block_jit_all_subcircuits():
    w, signed = _full_witness()
    verify_super_circuit(w, signed_txs=signed, tx_circuit_params=(2, 8, 1337))
    bv = CompiledBlockVerifier(w, signed_txs=signed, tx_circuit_params=(2, 8, 1337))
    assert {n for n, _ in bv.circuit_kernels} == {
        "bytecode", "keccak", "tx", "sig", "withdrawal", "pi"}
    bv.verify()


def test_block_jit_flags_corrupt_subcircuit():
    w, signed = _full_witness()
    w.withdrawals[1].amount = 0  # breaks pi's non-zero-amount rule
    bv = CompiledBlockVerifier(w, signed_txs=signed, tx_circuit_params=(2, 8, 1337))
    with pytest.raises(AssertionError):
        bv.verify()
