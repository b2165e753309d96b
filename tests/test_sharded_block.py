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
