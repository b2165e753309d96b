"""Distributed lookup argument: sharded tables + logUp partial sums + psum
over an 8-device mesh — no device holds the full rw table, the query side is
fingerprinted from constraint-consumed values, and the table side is
fingerprinted on-device from each shard (parallel/logup_shard.py; replaces
reference table.py:864-885 semantics for multi-chip deployments)."""
import numpy as np
import pytest

from zkevm_specs_tpu.parallel.logup_shard import (
    block_lookup_log,
    query_fingerprints_from_log,
    sharded_logup_check,
    table_parts,
    verify_block_lookups_logup,
)
from zkevm_specs_tpu.parallel.shard import make_mesh
from zkevm_specs_tpu.witness.tracer import trace_block
from zkevm_specs_tpu.witness.typing import Block, Bytecode, Transaction


pytestmark = pytest.mark.slow  # compile-heavy: excluded from `make test-fast`


def _witness():
    bc = (Bytecode()
          .push1(3).push1(5).add().pop()
          .push1(0x11).push1(0x01).sstore()
          .push1(0x01).sload().pop()
          .stop())
    tx = Transaction(id=1, gas=100000, gas_price=int(2e9),
                     caller_address=0xFE, callee_address=0xFF)
    return trace_block(Block(base_fee=int(1e9)), [(tx, bc)])


def test_sharded_rw_logup_ok():
    mesh = make_mesh(8)
    out = verify_block_lookups_logup(_witness(), mesh,
                                     tables_names=("rw", "bytecode"))
    assert out["rw"] is True
    assert out["bytecode"] is True


def test_sharded_logup_detects_bad_multiplicity():
    mesh = make_mesh(8)
    tables, per_table = block_lookup_log(_witness())
    table = tables.rw
    q_fps, en = query_fingerprints_from_log(table.schema, per_table["rw"])
    idx = np.concatenate([i for i, _, _ in per_table["rw"]])
    mult_counts = np.bincount(idx[en.astype(bool)], minlength=table.n_rows)
    mult_counts[int(idx[0])] += 1  # over-count one row
    from zkevm_specs_tpu.dsl.value import Ctx, F

    ctx = Ctx(np, table.n_rows, "eager")
    mult = np.asarray(F.from_ints(ctx, [int(c) for c in mult_counts], 64)
                      .widen(16).limbs)
    assert sharded_logup_check(q_fps, en, table_parts(table), mult, mesh,
                               0xA1FA) is False


def test_sharded_logup_detects_corrupt_table_value():
    """The binding property: a corrupted TABLE VALUE in the sharded copy
    (multiplicities untouched) is caught by the distributed argument alone —
    the query side was fingerprinted from the values the constraints
    consumed, so rhs shifts while lhs does not."""
    mesh = make_mesh(8)

    def corrupt(name, parts):
        # flip a value limb of some mid-table row in the device-bound data
        _w, limbs = parts[-1]
        limbs[limbs.shape[0] // 2, 0] ^= 1

    out = verify_block_lookups_logup(_witness(), mesh, tables_names=("rw",),
                                     corrupt_table=corrupt)
    assert out["rw"] is False


def test_sharded_logup_exact_on_2d_mesh():
    # hosts x chips 2-D mesh: psum rides both axes (DCN analog on the
    # virtual mesh)
    from zkevm_specs_tpu.parallel.shard import make_mesh_2d

    mesh = make_mesh_2d(2, 4)
    out = verify_block_lookups_logup(_witness(), mesh, tables_names=("rw",),
                                     axes=("hosts", "chips"))
    assert out["rw"] is True
