"""Distributed lookup argument: sharded tables + logUp partial sums + psum
over an 8-device mesh — no device holds the full rw table
(parallel/logup_shard.py; replaces reference table.py:864-885 semantics for
multi-chip deployments)."""
import numpy as np
import pytest

from zkevm_specs_tpu.parallel.logup_shard import (
    sharded_logup_check,
    table_fingerprints,
    verify_block_lookups_logup,
)
from zkevm_specs_tpu.parallel.shard import make_mesh
from zkevm_specs_tpu.witness.tracer import trace_block
from zkevm_specs_tpu.witness.typing import Block, Bytecode, Transaction


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
    w = _witness()
    from zkevm_specs_tpu.tables.container import Tables
    from zkevm_specs_tpu.circuits.bytecode import assign_keccak_table

    kwargs = w.tables_kwargs()
    kwargs["keccak_table"] = assign_keccak_table(
        [bytes(b.code) for b in w.bytecodes], 0x64)
    tables = Tables(**kwargs)
    t_fps = table_fingerprints(tables.rw)
    n = t_fps.shape[0]
    # claim every row queried once, but drop one query from the lhs
    q_fps = t_fps[np.arange(n)]
    en = np.ones(n, dtype=bool)
    en[3] = False
    from zkevm_specs_tpu.dsl.value import Ctx, F

    ctx = Ctx(np, n, "eager")
    mult = np.asarray(F.from_ints(ctx, [1] * n, 64).widen(16).limbs)
    assert sharded_logup_check(q_fps, en, t_fps, mult, mesh, 0xA1FA) is False


def test_sharded_logup_exact_on_2d_mesh():
    # hosts x chips 2-D mesh: psum rides both axes (DCN analog on the
    # virtual mesh)
    from zkevm_specs_tpu.parallel.shard import make_mesh_2d

    mesh = make_mesh_2d(2, 4)
    out = verify_block_lookups_logup(_witness(), mesh, tables_names=("rw",),
                                     axes=("hosts", "chips"))
    assert out["rw"] is True
