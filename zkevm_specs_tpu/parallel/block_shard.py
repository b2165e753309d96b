"""Sharded whole-block verification — the multi-chip super circuit.

``ShardedBlockVerifier`` runs a traced block witness over a
``jax.sharding.Mesh`` (1-D ``rows`` or 2-D hosts×chips):

1. every EVM step group's lanes are data-parallel over the mesh
   (parallel/shard.py shard_evm_group — step/hint columns row-sharded,
   tables replicated, per-lane verdicts gathered);
2. the state circuit proving the rw table runs row-sharded with the 1-row
   halo exchange of the sorted-adjacency checks (sharded_state_circuit);
3. the lookup families are proven by the *binding* distributed logUp
   argument (parallel/logup_shard.py): no device holds the full rw table —
   each fingerprints its own shard, queries are fingerprinted from the
   constraint-consumed values, and one psum combines the mesh.

This is SURVEY.md §2.4 item 5's actual requirement (a sharded block
verifier, not isolated demos) and replaces the reference's replicated
global-set lookups (reference table.py:864-885) at deployment scale.
Failure attribution: ``verify()`` raises with the failing step indices /
state rows / lookup families.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from .logup_shard import (
    query_fingerprints_from_log,
    sharded_logup_check,
    table_parts,
)
from .shard import shard_evm_group, sharded_state_circuit


class ShardedBlockVerifier:
    def __init__(self, witness, mesh, axes: Tuple[str, ...] = ("rows",),
                 keccak_randomness: Optional[int] = None,
                 logup_tables: Tuple[str, ...] = ("rw", "bytecode", "copy",
                                                  "exp", "keccak", "tx",
                                                  "block", "sig", "ecc",
                                                  "withdrawal"),
                 alpha: int = 0xA1FA, config=None):
        from ..config import DEFAULT_CONFIG
        from ..runtime.block import CompiledBlockVerifier
        from .logup_shard import block_lookup_log

        self.mesh = mesh
        self.axes = axes
        self.alpha = alpha
        self.logup_tables = logup_tables
        self.n_dev = int(np.prod([mesh.shape[a] for a in axes]))

        # grouping/signatures/producer kernels from the single-chip builder
        self.inner = CompiledBlockVerifier(
            witness, keccak_randomness=keccak_randomness, config=config)
        # one clean instrumented eager pass collects each lookup's resolved
        # row values — the distributed argument's query side
        kr = (config or DEFAULT_CONFIG).keccak_randomness \
            if keccak_randomness is None else keccak_randomness
        _tables, self._per_table = block_lookup_log(witness, kr)
        self.witness = witness

    # -- pieces ---------------------------------------------------------------

    def _pad_group(self, g):
        curr, nxt = g["curr"], g["next"]
        n = len(curr)
        m = ((n + self.n_dev - 1) // self.n_dev) * self.n_dev
        pad = m - n
        return curr + [curr[0]] * pad, nxt + [nxt[0]] * pad

    def verify_evm_groups(self) -> Dict[int, bool]:
        """All step groups, lanes sharded over the mesh; returns
        {step_index: failed} for real lanes."""
        failures: Dict[int, bool] = {}
        axis = self.axes if len(self.axes) > 1 else self.axes[0]
        for g in self.inner.groups:
            if g["verifier"] is None:
                # tiny eager-scheduled subgroup (runtime/block.py policy)
                fail = self.inner._run_eager_group(g)
            else:
                curr, nxt = self._pad_group(g)
                fail = np.asarray(shard_evm_group(g["verifier"], curr, nxt,
                                                  self.mesh, axis=axis))
            for lane, i in enumerate(g["idxs"]):
                if fail[lane]:
                    failures[i] = True
        return failures

    def verify_state(self) -> np.ndarray:
        """Row-sharded state circuit; padding rows (copies of the leading
        Start row, whose keys differ from every real tail row) keep the
        shard sizes even and their verdict bits are masked out."""
        rows = list(self.inner._state_rows)
        n = len(rows)
        m = ((n + self.n_dev - 1) // self.n_dev) * self.n_dev
        rows = rows + [dict(rows[0]) for _ in range(m - n)]
        axis = self.axes if len(self.axes) > 1 else self.axes[0]
        out = np.asarray(sharded_state_circuit(rows, self.inner._state_mpt,
                                               self.mesh, axis=axis))
        return out[:n]

    def verify_lookups(self) -> Dict[str, bool]:
        """The binding distributed logUp argument per lookup family."""
        from ..dsl.value import Ctx, F

        per_table = self._per_table
        out: Dict[str, bool] = {}
        for name in self.logup_tables:
            if name not in per_table:
                continue
            table = getattr(self.inner.tables, name)
            q_fps, en = query_fingerprints_from_log(table.schema,
                                                    per_table[name])
            idx = np.concatenate([i for i, _, _ in per_table[name]])
            mult_counts = np.bincount(idx[en.astype(bool)],
                                      minlength=table.n_rows)
            ctx = Ctx(np, table.n_rows, "eager")
            mult = np.asarray(
                F.from_ints(ctx, [int(c) for c in mult_counts], 64)
                .widen(16).limbs)
            out[name] = sharded_logup_check(
                q_fps, en, table_parts(table), mult, self.mesh, self.alpha,
                self.axes)
        return out

    def verify_producers(self) -> Dict[str, np.ndarray]:
        """Every producer-circuit kernel (prologue, bytecode, keccak, copy,
        exp, tx, sig, ecc, pi, withdrawal) executed ON the mesh: row-parallel
        circuits shard their lane dimension, small/indivisible ones run
        replicated (SPMD with identical data), tables replicate.  Returns
        {circuit: per-row fail bits} — the same verdict set as the
        single-chip CompiledBlockVerifier (reference specs/super_circuit.md:
        the super circuit is ALL sub-circuits over shared tables)."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = self.axes if len(self.axes) > 1 else self.axes[0]
        row_sh = NamedSharding(self.mesh, P(axis))
        repl = NamedSharding(self.mesh, P())
        out: Dict[str, np.ndarray] = {}
        # which circuits actually ran row-sharded vs fully replicated this
        # pass (small/indivisible row counts replicate; round-4 weak #4
        # asked for this to be observable)
        self.producer_placement: Dict[str, str] = {}
        for name, kernel in self.inner.circuit_kernels:
            n = kernel.n
            sharded = []

            def place(a, n=n, sharded=sharded):
                a = np.asarray(a)
                if a.ndim >= 1 and a.shape[0] == n and n % self.n_dev == 0:
                    sharded.append(True)
                    return jax.device_put(a, row_sh)
                return jax.device_put(a, repl)

            cols_tree, tbl_tree, extra_tree = kernel.args
            cols_tree = jax.tree.map(place, cols_tree)
            tbl_tree = jax.tree.map(
                lambda a: jax.device_put(np.asarray(a), repl), tbl_tree)
            extra_tree = jax.tree.map(place, extra_tree)
            out[name] = np.asarray(kernel((cols_tree, tbl_tree, extra_tree)))
            self.producer_placement[name] = ("sharded" if sharded
                                             else "replicated")
        return out

    def verify(self) -> None:
        step_fails = self.verify_evm_groups()
        state_fail = self.verify_state()
        lookup_ok = self.verify_lookups()
        producer_fails = self.verify_producers()
        problems = []
        if step_fails:
            problems.append(f"steps {sorted(step_fails)[:8]}")
        bad_rows = np.nonzero(state_fail)[0]
        if bad_rows.size:
            problems.append(f"state rows {bad_rows[:8].tolist()}")
        bad_tables = [k for k, ok in lookup_ok.items() if not ok]
        if bad_tables:
            problems.append(f"lookup families {bad_tables}")
        for name, fail in producer_fails.items():
            rows = np.nonzero(fail)[0]
            if rows.size:
                problems.append(f"{name} rows {rows[:8].tolist()}")
        if problems:
            raise AssertionError(
                "sharded block verification failed: " + "; ".join(problems))
