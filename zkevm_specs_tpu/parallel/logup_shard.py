"""Distributed lookup argument: sharded tables + logUp partial sums.

This is the production distribution story for lookups (SURVEY.md §2.4 item
5): instead of replicating every table on every chip (parallel/shard.py's
round-1 approach, which caps block size at single-chip HBM), the table rows
AND the query multiset are sharded row-wise over the mesh; each device
computes the local logUp partial sums

    lhs_d = sum_{queries on d}  en_i / (alpha - q_i)
    rhs_d = sum_{rows on d}      m_j / (alpha - t_j)

and one psum over the mesh combines them — O(rows/N) work and O(1)
communication per device, riding ICI.

Binding: the QUERY side is fingerprinted from the row values each
constraint actually consumed (the engine logs the gathered rows,
tables/engine.py lookup_log), while the TABLE side is fingerprinted
ON-DEVICE from each device's raw column shard.  A corrupted table shard
therefore changes rhs but not lhs and the identity fails — the argument is
sound end-to-end, not a re-statement of the table against itself.

Replaces the semantics of the reference's global set-membership lookup
(reference: src/zkevm_specs/evm_circuit/table.py:864-885) for multi-chip
deployments.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..dsl.value import Ctx, F, Word
from ..ops import fr
from ..ops import limbs as L
from ..tables.engine import Table
from ..tables.logup import fingerprint_fr, logup_partial_sum


def table_fingerprints(table: Table) -> np.ndarray:
    """[n_rows, 16] sound Fr fingerprints of every full table row (host
    helper for single-device checks/tests)."""
    ctx = Ctx(np, table.n_rows, "eager")
    return np.asarray(
        fingerprint_fr(ctx, table.schema, tuple(table.schema.columns), table.data))


def table_parts(table: Table) -> List[Tuple[int, np.ndarray]]:
    """The raw per-part column limbs of a table with their fingerprint
    weights: [(weight, [n_rows, 16] u32 limbs), ...].  Shipped sharded to
    the devices, which fingerprint their own shard."""
    parts: List[Tuple[int, np.ndarray]] = []
    for c, spec in table.schema.columns.items():
        v = table.data[c]
        if spec.kind == "word":
            sub = [("lo", v.lo), ("hi", v.hi)]
        else:
            sub = [("f", v if isinstance(v, F) else v.value())]
        for part_name, fv in sub:
            w = table.schema.weight(c, part_name)
            limbs = np.asarray(L.pad_limbs(np, np.asarray(fv.limbs), 16))
            parts.append((int(w), limbs))
    return parts


def query_fingerprints_from_log(schema, logged) -> Tuple[np.ndarray, np.ndarray]:
    """Fingerprint the query side from the engine's lookup log entries
    [(idx, en, Row), ...]: the values the constraints consumed, independent
    of any table copy."""
    fps, ens = [], []
    for _idx, en, row in logged:
        ctx = Ctx(np, en.shape[0], "eager")
        fps.append(np.asarray(
            fingerprint_fr(ctx, schema, tuple(schema.columns), row._cols)))
        ens.append(np.asarray(en))
    return np.concatenate(fps), np.concatenate(ens)


def _pad_to(arr: np.ndarray, n: int, fill=0) -> np.ndarray:
    if arr.shape[0] == n:
        return arr
    pad = np.full((n - arr.shape[0],) + arr.shape[1:], fill, dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def sharded_logup_check(
    query_fps: np.ndarray,       # [Q, 16] query-side fingerprints
    query_en: np.ndarray,        # [Q] bool
    parts: List[Tuple[int, np.ndarray]],  # table column parts (weight, limbs)
    multiplicities: np.ndarray,  # [T, 16] Fr limbs
    mesh,
    alpha: int,
    axes: Tuple[str, ...] = ("rows",),
) -> bool:
    """Evaluate the logUp identity with BOTH sides sharded over the mesh.

    No device ever holds the full table or query set: shard_map slices the
    row axis, each device fingerprints ITS OWN table shard from the raw
    column limbs, reduces its local terms, and a psum of the raw limb sums
    (entries < 2^16 * n_devices, exact in u32) combines the mesh.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    n_dev = int(np.prod([mesh.shape[a] for a in axes]))
    T0 = parts[0][1].shape[0]
    Q = ((query_fps.shape[0] + n_dev - 1) // n_dev) * n_dev
    T = ((T0 + n_dev - 1) // n_dev) * n_dev
    # padding: queries gain en=0 lanes; the table gains multiplicity-0 rows
    # whose first column part is forced to 1 so padded-row fingerprints stay
    # nonzero (denominator != alpha w.h.p.)
    query_fps = _pad_to(query_fps, Q).copy()
    query_fps[query_fps.sum(axis=1) == 0, 0] = 1
    query_en = _pad_to(query_en.astype(np.uint32), Q)
    weights = [w for w, _ in parts]
    cols = [_pad_to(limbs, T) for _, limbs in parts]
    if T > T0:
        cols[0][T0:, 0] = 1
    multiplicities = _pad_to(multiplicities, T)

    alpha_l = np.asarray(L.int_to_limbs(alpha % fr.P, 16))
    w_limbs = np.stack([L.int_to_limbs(w % fr.P, 16) for w in weights])
    en_limbs = np.zeros((Q, 16), dtype=np.uint32)
    en_limbs[:, 0] = query_en

    spec_rows = P(axes)
    spec_repl = P()

    @jax.jit
    def check(q_fps, q_en, mult, *cols):
        def local(q_fps, q_en, mult, *cols):
            # device-side table fingerprints over this shard's raw columns
            t_fps = None
            for k, col in enumerate(cols):
                w = jnp.broadcast_to(jnp.asarray(w_limbs[k]), col.shape)
                term = fr.mul(jnp, col, w)
                t_fps = term if t_fps is None else fr.add(jnp, t_fps, term)
            lhs = logup_partial_sum(jnp, q_fps, jnp.asarray(alpha_l), q_en)
            rhs = logup_partial_sum(jnp, t_fps, jnp.asarray(alpha_l), mult)
            # psum raw limbs (exact: entries < 2^16 * n_devices < 2^32)
            for a in axes:
                lhs = jax.lax.psum(lhs, a)
                rhs = jax.lax.psum(rhs, a)
            return lhs[None, :], rhs[None, :]

        lhs, rhs = shard_map(
            local, mesh=mesh,
            in_specs=(spec_rows,) * (3 + len(cols)),
            out_specs=(spec_repl, spec_repl),
        )(q_fps, q_en, mult, *cols)
        # normalize the psum'd limb sums into canonical Fr and compare
        lhs_c = fr.reduce_wide(jnp, L.carry_propagate(jnp, lhs, 17))
        rhs_c = fr.reduce_wide(jnp, L.carry_propagate(jnp, rhs, 17))
        return jnp.all(lhs_c == rhs_c)

    return bool(np.asarray(check(query_fps, en_limbs, multiplicities, *cols)))


def block_lookup_log(witness, keccak_randomness: int = 0x64):
    """Run the EVM circuit eagerly once (host) and collect, per table, the
    engine's lookup log: [(idx, en, resolved Row), ...]."""
    from ..circuits.bytecode import assign_keccak_table
    from ..dsl.cs import ConstraintSystem
    from ..evm.main import verify_steps
    from ..tables.container import Tables

    codes = [bytes(bc.code) for bc in witness.bytecodes]
    keccak_data = codes + list(getattr(witness, "sha3_preimages", []))
    kwargs = witness.tables_kwargs()
    kwargs["keccak_table"] = assign_keccak_table(keccak_data, keccak_randomness)
    if witness.copy_circuit is not None:
        from ..witness.typing import copy_circuit_to_table

        kwargs["copy_table"] = copy_circuit_to_table(witness.copy_circuit)
    if witness.exp_circuit is not None:
        from ..witness.typing import exp_circuit_to_table

        kwargs["exp_table"] = exp_circuit_to_table(witness.exp_circuit)
    if witness.ecc_circuit is not None:
        from ..circuits.ecc import ecc_table_rows

        kwargs["ecc_table"] = ecc_table_rows(witness.ecc_circuit,
                                             keccak_randomness)
    if getattr(witness, "sig_rows", None):
        # traced ecRecover calls consume the sig table (runtime/block.py
        # builds the same; a witness with precompile 0x01 steps needs it)
        kwargs["sig_table"] = [r.table_row() for r in witness.sig_rows]
    tables = Tables(**kwargs)

    log: List[tuple] = []
    orig_init = ConstraintSystem.__init__

    def patched(self, ctx):
        orig_init(self, ctx)
        self.lookup_log = log

    ConstraintSystem.__init__ = patched
    try:
        verify_steps(tables, list(witness.steps), end_with_last_step=True)
    finally:
        ConstraintSystem.__init__ = orig_init

    per_table: Dict[str, List[tuple]] = {}
    for name, idx, en, row in log:
        per_table.setdefault(name, []).append((idx, en, row))
    return tables, per_table


def verify_block_lookups_logup(witness, mesh, alpha: int = 0xA1FA,
                               keccak_randomness: int = 0x64,
                               tables_names: Tuple[str, ...] = ("rw",),
                               axes: Tuple[str, ...] = ("rows",),
                               corrupt_table=None) -> Dict[str, bool]:
    """Distributed lookup argument for a block witness.

    Queries are fingerprinted from the constraint-consumed values (host
    instrumentation); the table side is fingerprinted by each device from
    its own shard of the raw columns.  ``corrupt_table(name, parts)`` lets
    tests tamper with the device-bound table data to prove the argument is
    binding.  Returns {table: ok}.
    """
    tables, per_table = block_lookup_log(witness, keccak_randomness)

    out: Dict[str, bool] = {}
    for name in tables_names:
        if name not in per_table:
            continue
        table: Table = getattr(tables, name)
        q_fps, en = query_fingerprints_from_log(table.schema, per_table[name])
        idx = np.concatenate([i for i, _, _ in per_table[name]])
        mult_counts = np.bincount(idx[en.astype(bool)], minlength=table.n_rows)
        ctx = Ctx(np, table.n_rows, "eager")
        mult = np.asarray(F.from_ints(ctx, [int(c) for c in mult_counts], 64)
                          .widen(16).limbs)
        parts = table_parts(table)
        if corrupt_table is not None:
            corrupt_table(name, parts)
        out[name] = sharded_logup_check(q_fps, en, parts, mult, mesh, alpha,
                                        axes)
    return out
