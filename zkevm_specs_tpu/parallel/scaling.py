"""Multi-chip scaling measurement harness (BASELINE.md: >85% linear
scaling target on 2-host v5e).

Measures weak scaling (fixed rows per device) of the two distributed
kernels over a 1-D ``rows`` mesh and the 2-D ``hosts x chips`` mesh:

  1. the sharded state circuit (sort-adjacency halo exchange + verdict
     psum — the SP analog, SURVEY.md §2.4 item 6), and
  2. the sharded logUp lookup argument (tables + queries row-sharded, one
     psum of partial sums — SURVEY.md §2.4 item 5).

On real hardware the device counts map to chips (ICI) and hosts (DCN);
under the virtual CPU platform all "devices" share the host's cores, so
the numbers here validate *overhead* (collective + partition cost as the
mesh grows), while absolute scaling comes from the per-device work being
constant.  Run:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python -m zkevm_specs_tpu.parallel.scaling
"""
from __future__ import annotations

import json
import time
from typing import Dict, List, Sequence

import numpy as np


def _state_workload(n_rows: int):
    from ..circuits.state import (
        MemoryOp, StackOp, StartOp, assign_state_circuit, mpt_table_from_ops,
    )
    from ..tables.schemas import RW

    ops = [StartOp(rw_counter=1, rw=RW.Read, lexicographic_ordering_selector=0)]
    rwc = 1
    for i in range((n_rows - 1) // 2):
        ops.append(MemoryOp(rw_counter=rwc, rw=RW.Write, call_id=1,
                            mem_addr=i, value=i % 256))
        rwc += 1
    for i in range(n_rows - 1 - (n_rows - 1) // 2):
        ops.append(StackOp(rw_counter=rwc, rw=RW.Write, call_id=1,
                           stack_ptr=1023, value=i))
        rwc += 1
    return assign_state_circuit(ops), mpt_table_from_ops(ops)


def measure_state_scaling(rows_per_device: int = 2048,
                          device_counts: Sequence[int] = (1, 2, 4, 8),
                          n_iters: int = 10) -> List[Dict]:
    """Weak scaling of the sharded state-circuit kernel: rows grow with the
    mesh, per-device work constant; efficiency = t(1) / t(n)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..circuits.state import make_state_check_fn, pack_state_inputs
    from .shard import make_mesh

    results: List[Dict] = []
    t1 = None
    for n_dev in device_counts:
        if n_dev > len(jax.devices()):
            continue
        rows, mpt_rows = _state_workload(n_dev * rows_per_device)
        mesh = make_mesh(n_dev)
        cols, mpt_tree, meta = pack_state_inputs(rows, mpt_rows)
        fn = jax.jit(make_state_check_fn(meta))
        row_sharding = NamedSharding(mesh, P("rows"))
        repl = NamedSharding(mesh, P())
        cols = jax.tree.map(lambda a: jax.device_put(a, row_sharding), cols)
        mpt_tree = jax.tree.map(lambda a: jax.device_put(a, repl), mpt_tree)
        out = fn(cols, mpt_tree)
        out.block_until_ready()
        assert not np.asarray(out).any()
        t0 = time.time()
        for _ in range(n_iters):
            out = fn(cols, mpt_tree)
        out.block_until_ready()
        dt = (time.time() - t0) / n_iters
        if t1 is None:
            t1 = dt
        results.append({
            "kernel": "state_circuit", "devices": n_dev,
            "rows": n_dev * rows_per_device,
            "iter_ms": round(dt * 1e3, 2),
            "rows_per_s": round(n_dev * rows_per_device / dt),
            "weak_efficiency": round(t1 / dt, 3),
        })
        print(json.dumps(results[-1]), flush=True)
    return results


def measure_logup_scaling(rows_per_device: int = 8192,
                          device_counts: Sequence[int] = (1, 2, 4, 8),
                          n_iters: int = 10,
                          mesh_2d: bool = False) -> List[Dict]:
    """Weak scaling of the sharded logUp multiset argument (synthetic
    table + query multiset, exact-verdict check each iteration)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..dsl.value import Ctx, F
    from ..ops import fr
    from ..ops import limbs as L
    from ..tables.logup import logup_partial_sum
    from .shard import make_mesh, make_mesh_2d

    rng = np.random.RandomState(0)
    alpha_l = np.asarray(L.int_to_limbs(0xA1FA, 16))
    results = []
    t1 = None
    for n_dev in device_counts:
        if n_dev > len(jax.devices()):
            continue
        n_rows = n_dev * rows_per_device
        # synthetic full-width fingerprints + a consistent query multiset
        t_fps = rng.randint(0, 1 << 16, size=(n_rows, 16)).astype(np.uint32)
        idx = rng.randint(0, n_rows, size=n_rows)
        q_fps = t_fps[idx]
        en = np.ones(n_rows, dtype=np.uint32)
        counts = np.bincount(idx, minlength=n_rows)
        ctx = Ctx(np, n_rows, "eager")
        mult = np.asarray(
            F.from_ints(ctx, [int(c) for c in counts], 64).widen(16).limbs)
        en_limbs = np.zeros((n_rows, 16), dtype=np.uint32)
        en_limbs[:, 0] = en

        if mesh_2d and n_dev >= 4:
            mesh = make_mesh_2d(2, n_dev // 2)
            axes = ("hosts", "chips")
        else:
            mesh = make_mesh(n_dev)
            axes = ("rows",)
        spec_rows, spec_repl = P(axes), P()

        @jax.jit
        def check(q_fps, q_en, t_fps, mult):
            def local(q_fps, q_en, t_fps, mult):
                lhs = logup_partial_sum(jnp, q_fps, jnp.asarray(alpha_l), q_en)
                rhs = logup_partial_sum(jnp, t_fps, jnp.asarray(alpha_l), mult)
                for a in axes:
                    lhs = jax.lax.psum(lhs, a)
                    rhs = jax.lax.psum(rhs, a)
                return lhs[None, :], rhs[None, :]

            lhs, rhs = shard_map(local, mesh=mesh,
                                 in_specs=(spec_rows,) * 4,
                                 out_specs=(spec_repl, spec_repl))(
                q_fps, q_en, t_fps, mult)
            lhs_c = fr.reduce_wide(jnp, L.carry_propagate(jnp, lhs, 17))
            rhs_c = fr.reduce_wide(jnp, L.carry_propagate(jnp, rhs, 17))
            return jnp.all(lhs_c == rhs_c)

        out = check(q_fps, en_limbs, t_fps, mult)
        assert bool(np.asarray(out))
        t0 = time.time()
        for _ in range(n_iters):
            out = check(q_fps, en_limbs, t_fps, mult)
        out.block_until_ready()
        dt = (time.time() - t0) / n_iters
        if t1 is None:
            t1 = dt
        results.append({
            "kernel": "logup_lookup" + ("_2d" if mesh_2d and n_dev >= 4 else ""),
            "devices": n_dev, "rows": n_rows,
            "iter_ms": round(dt * 1e3, 2),
            "rows_per_s": round(n_rows / dt),
            "weak_efficiency": round(t1 / dt, 3),
        })
        print(json.dumps(results[-1]), flush=True)
    return results


def main():
    import os
    from pathlib import Path

    import jax

    # honor JAX_PLATFORMS so the same entry point measures real slices; only
    # force the virtual-CPU mesh when the caller asked for cpu (the axon hook
    # overrides the env var at interpreter start, so re-apply it here)
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        jax.config.update("jax_platforms", want)
    cache = Path(__file__).resolve().parent.parent.parent / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    measure_logup_scaling()
    measure_logup_scaling(mesh_2d=True, device_counts=(4, 8))
    measure_state_scaling()


if __name__ == "__main__":
    main()
