"""Multi-chip sharding correctness on a virtual 8-device CPU mesh.

The driver's dryrun validates that the sharded step compiles; these tests
additionally check that sharded verdicts are *exact* (including per-lane
failure attribution across shard boundaries and the halo exchange of the
state circuit's sorted-adjacency checks)."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax

from zkevm_specs_tpu.evm import ExecutionState
from zkevm_specs_tpu.parallel.shard import (
    make_mesh,
    shard_evm_group,
    sharded_state_circuit,
)
from zkevm_specs_tpu.runtime.jit import CompiledGroupVerifier
from test_jit_runner import build_add_batch, build_binop_batch

pytestmark = [
    pytest.mark.skipif(len(jax.devices()) < 8,
                       reason="needs the 8-device virtual CPU mesh"),
    pytest.mark.slow,  # compile-heavy: excluded from `make test-fast`
]


def test_sharded_evm_group_ok():
    tables, steps, nexts = build_add_batch(16)
    v = CompiledGroupVerifier(tables, ExecutionState.ADD, steps, nexts)
    mesh = make_mesh(8)
    fail = np.asarray(shard_evm_group(v, steps, nexts, mesh))
    assert not fail.any()


def test_sharded_evm_group_flags_lane_on_remote_shard():
    # lane 13 lives on device 6 of the 8-way shard; the verdict must still
    # attribute the failure to exactly that lane.
    tables, steps, nexts = build_add_batch(16, corrupt_lane=13)
    v = CompiledGroupVerifier(tables, ExecutionState.ADD, steps, nexts)
    mesh = make_mesh(8)
    fail = np.asarray(shard_evm_group(v, steps, nexts, mesh))
    assert fail[13] and fail.sum() == 1


def test_sharded_hinted_gadget():
    # hint columns must shard row-wise alongside the step columns
    tables, steps, nexts = build_binop_batch(
        ExecutionState.MUL, "DIV", lambda a, b: a // b if b else 0, 16)
    v = CompiledGroupVerifier(tables, ExecutionState.MUL, steps, nexts)
    assert v.n_hints > 0
    mesh = make_mesh(8)
    fail = np.asarray(shard_evm_group(v, steps, nexts, mesh))
    assert not fail.any()


def _state_rows(n, bad_adjacency=False):
    from zkevm_specs_tpu.circuits.state import (
        MemoryOp, StackOp, StartOp, assign_state_circuit, mpt_table_from_ops,
    )
    from zkevm_specs_tpu.tables.schemas import RW

    ops = [StartOp(rw_counter=1, rw=RW.Read, lexicographic_ordering_selector=0)]
    rwc = 1
    half = (n - 1) // 2
    for i in range(half):
        ops.append(MemoryOp(rw_counter=rwc, rw=RW.Write, call_id=1,
                            mem_addr=i, value=i % 256))
        rwc += 1
    for i in range(n - 1 - half):
        ops.append(StackOp(rw_counter=rwc, rw=RW.Write, call_id=1,
                           stack_ptr=1023, value=i))
        rwc += 1
    rows = assign_state_circuit(ops)
    if bad_adjacency:
        # swap two rows so the lexicographic-ordering check must fail across
        # what will be a shard boundary (rows 7|8 on an 8-way split of 16)
        rows[7], rows[8] = rows[8], rows[7]
    return rows, mpt_table_from_ops(ops)


def test_sharded_state_circuit_ok():
    rows, mpt = _state_rows(16)
    mesh = make_mesh(8)
    fail = np.asarray(sharded_state_circuit(rows, mpt, mesh))
    assert not fail.any()


def test_sharded_state_circuit_halo_catches_boundary_violation():
    rows, mpt = _state_rows(16, bad_adjacency=True)
    mesh = make_mesh(8)
    fail = np.asarray(sharded_state_circuit(rows, mpt, mesh))
    assert fail.any()


def test_comm_model_weak_scaling_bound():
    """The analytic communication-volume model (parallel/comm_model.py)
    must predict >85% weak-scaling efficiency for the BASELINE target
    workload (one 1M-gas block per device-group) and show the latency
    wall for small strong-scaled blocks."""
    from zkevm_specs_tpu.parallel.comm_model import CommModel

    weak = CommModel(n_devices=8, n_steps=352_000 * 8,
                     n_rw_rows=1_056_000 * 8, n_constraints_per_step=29,
                     n_logup_families=10)
    assert weak.predicted_weak_efficiency() > 0.85
    # comm volume grows linearly with the mesh, compute per device fixed
    weak64 = CommModel(n_devices=64, n_steps=352_000 * 64,
                       n_rw_rows=1_056_000 * 64, n_constraints_per_step=29,
                       n_logup_families=10)
    assert abs(weak64.predicted_weak_efficiency()
               - weak.predicted_weak_efficiency()) < 0.01

    small_strong = CommModel(n_devices=64, n_steps=8_000,
                             n_rw_rows=12_000, n_constraints_per_step=29,
                             n_logup_families=10)
    assert small_strong.predicted_weak_efficiency() < 0.5
