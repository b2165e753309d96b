"""Super-circuit end-to-end: trace a block, verify every sub-circuit against
the shared tables (BASELINE.json config 5 class)."""
import pytest

from zkevm_specs_tpu.circuits.super_circuit import verify_super_circuit
from zkevm_specs_tpu.circuits.tx import Transaction as SigTx, sign_tx
from zkevm_specs_tpu.witness.tracer import trace_block
from zkevm_specs_tpu.witness.typing import Block, Bytecode, Transaction


def simple_block(n_txs=1, program=None):
    block = Block(base_fee=int(1e9))
    txs = []
    for i in range(n_txs):
        bytecode = program() if program else (
            Bytecode().push1(3).push1(5).add().push1(7).mul().pop().stop()
        )
        tx = Transaction(id=i + 1, gas=30000, gas_price=int(2e9),
                         caller_address=0xFE, callee_address=0xFF + i, value=0)
        txs.append((tx, bytecode))
    return block, txs


def test_super_circuit_single_tx():
    block, txs = simple_block(1)
    witness = trace_block(block, txs)
    verify_super_circuit(witness)


def test_super_circuit_two_txs():
    block, txs = simple_block(2)
    witness = trace_block(block, txs)
    verify_super_circuit(witness)


def test_super_circuit_memory_program():
    block, txs = simple_block(
        1,
        program=lambda: (
            Bytecode()
            .push1(0x42).push1(0).mstore()
            .push1(0).mload().pop().stop()
        ),
    )
    witness = trace_block(block, txs)
    verify_super_circuit(witness)


def test_super_circuit_with_signatures():
    """Every traced block carries real signatures by default; the tx
    circuit binds the EVM tx-table sender to the recovered signer, so an
    externally-supplied signature from the wrong key is REJECTED."""
    block, txs = simple_block(1)
    witness = trace_block(block, txs)
    assert witness.signed_txs is not None
    # the default-signed witness verifies (tx + sig circuits included)
    verify_super_circuit(witness, tx_circuit_params=(2, 8, witness.chain_id))

    # a signature over the same payload from a DIFFERENT key recovers a
    # different sender and must fail the EVM-table/recovered-signer binding
    bad = [sign_tx(5, witness.signed_txs[0], witness.chain_id)]
    with pytest.raises(AssertionError):
        verify_super_circuit(witness, signed_txs=bad,
                             tx_circuit_params=(2, 8, witness.chain_id))


def test_super_circuit_corrupt_rw_rejected():
    block, txs = simple_block(1)
    witness = trace_block(block, txs)
    # corrupt one stack write value
    for row in witness.rw.rws:
        if row["key0"] == 8 and row["rw"] == 1:  # Target.Stack write
            row["value"] ^= 1
            break
    with pytest.raises(AssertionError):
        verify_super_circuit(witness)
