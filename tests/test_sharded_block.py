"""ShardedBlockVerifier: a traced multi-tx block verified end-to-end over an
8-device mesh — EVM groups data-parallel, state circuit row-sharded with
halo exchange, lookup families proven by the binding distributed logUp where
no device holds the full rw table (parallel/block_shard.py; SURVEY.md §2.4
item 5)."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax

from zkevm_specs_tpu.parallel.block_shard import ShardedBlockVerifier
from zkevm_specs_tpu.parallel.shard import make_mesh, make_mesh_2d
from zkevm_specs_tpu.witness.tracer import trace_block
from zkevm_specs_tpu.witness.typing import Account, Block, Bytecode, Transaction

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh")


def _multi_tx_witness():
    """Two txs: ALU + storage + a subcall with a REVERT — enough breadth to
    shard several distinct groups and a non-trivial rw table."""
    callee = Bytecode().push1(0x55).push1(0x09).sstore().push1(0).push1(0).revert()
    bc1 = (Bytecode()
           .push1(3).push1(5).add().pop()
           .push1(0x11).push1(0x01).sstore()
           .push1(0x01).sload().pop()
           .stop())
    bc2 = Bytecode()
    bc2.push1(0).push1(0).push1(0).push1(0).push1(0).push2(0x5000) \
       .push2(0xFFFF).call().pop()
    bc2.push1(7).push1(0x02).sstore().stop()
    txs = [
        (Transaction(id=1, gas=100000, gas_price=int(2e9),
                     caller_address=0xFE, callee_address=0xFF), bc1),
        (Transaction(id=2, gas=200000, gas_price=int(2e9),
                     caller_address=0xFE, callee_address=0xF2, nonce=1), bc2),
    ]
    return trace_block(Block(base_fee=int(1e9)), txs,
                       accounts={0x5000: Account(address=0x5000, code=callee)})


def test_sharded_block_ok():
    w = _multi_tx_witness()
    sbv = ShardedBlockVerifier(w, make_mesh(8))
    sbv.verify()


def test_sharded_block_2d_mesh():
    w = _multi_tx_witness()
    sbv = ShardedBlockVerifier(w, make_mesh_2d(2, 4), axes=("hosts", "chips"))
    sbv.verify()


def test_sharded_block_attributes_step_failure():
    w = _multi_tx_witness()
    # corrupt AFTER construction: the builder's host passes (signature
    # partition, lookup log) run on the honest witness; the sharded device
    # pass must still attribute the corrupted lane
    sbv = ShardedBlockVerifier(w, make_mesh(8))
    for s in w.steps:
        if s.execution_state.name == "ADD":
            s.gas_left += 1
            break
    fails = sbv.verify_evm_groups()
    assert fails, "corrupt ADD step not attributed"


def test_sharded_block_attributes_state_failure():
    w = _multi_tx_witness()
    sbv = ShardedBlockVerifier(w, make_mesh(8))
    # corrupt a state row value AFTER building: re-run only the state part
    sbv.inner._state_rows[len(sbv.inner._state_rows) // 2]["value"] = (
        sbv.inner._state_rows[len(sbv.inner._state_rows) // 2]["value"] + 1)
    out = sbv.verify_state()
    assert out.any(), "corrupt state row not flagged across shards"


def test_sharded_block_lookup_families_binding():
    w = _multi_tx_witness()
    sbv = ShardedBlockVerifier(w, make_mesh(8))
    ok = sbv.verify_lookups()
    assert ok.get("rw") is True and ok.get("bytecode") is True


def test_sharded_block_runs_all_producers():
    """The mesh path executes every producer-circuit kernel (round-3
    missing #2: a sharded whole-block verifier must be the WHOLE super
    circuit, reference specs/super_circuit.md)."""
    w = _multi_tx_witness()
    sbv = ShardedBlockVerifier(w, make_mesh(8))
    fails = sbv.verify_producers()
    assert {"prologue", "bytecode", "keccak", "tx", "sig",
            "withdrawal", "pi"} <= set(fails), set(fails)
    assert not any(f.any() for f in fails.values()), {
        k: np.nonzero(v)[0][:4].tolist() for k, v in fails.items() if v.any()}


def _copy_witness():
    bc = Bytecode()
    bc.push1(8).push1(0).push1(0).calldatacopy()
    bc.push1(3).push1(2).exp().pop()
    bc.stop()
    tx = Transaction(id=1, gas=100000, gas_price=int(2e9),
                     caller_address=0xFE, callee_address=0xFF,
                     call_data=bytes(range(8)))
    return trace_block(Block(base_fee=int(1e9)), [(tx, bc)])


def test_sharded_block_attributes_copy_failure():
    w = _copy_witness()
    ShardedBlockVerifier(w, make_mesh(8)).verify()  # clean baseline
    w2 = _copy_witness()
    w2.copy_circuit.rows[0]["value"] += 1
    sbv = ShardedBlockVerifier(w2, make_mesh(8))
    with pytest.raises(AssertionError, match="copy"):
        sbv.verify()


def test_sharded_block_attributes_pi_failure():
    from zkevm_specs_tpu.witness.typing import Withdrawal

    bc = Bytecode().push1(1).push1(2).add().pop().stop()
    tx = Transaction(id=1, gas=100000, gas_price=int(2e9),
                     caller_address=0xFE, callee_address=0xFF)
    wds = [Withdrawal(id=7, validator_id=1, address=0xD00D, amount=int(2e9))]
    w = trace_block(Block(base_fee=int(1e9)), [(tx, bc)], withdrawals=wds)
    w.withdrawals[0].amount = 0  # breaks pi's non-zero-amount rule
    sbv = ShardedBlockVerifier(w, make_mesh(8))
    fails = sbv.verify_producers()
    assert fails["pi"].any() or fails["withdrawal"].any(), (
        "corrupt withdrawal amount not attributed on the mesh path")
