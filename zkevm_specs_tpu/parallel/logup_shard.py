"""Distributed lookup argument: sharded tables + logUp partial sums.

This is the production distribution story for lookups (SURVEY.md §2.4 item
5): instead of replicating every table on every chip (parallel/shard.py's
round-1 approach, which caps block size at single-chip HBM), the table rows
AND the query multiset are sharded row-wise over the mesh; each device
computes the local logUp partial sums

    lhs_d = sum_{queries on d}  en_i / (alpha - q_i)
    rhs_d = sum_{rows on d}      m_j / (alpha - t_j)

and one psum over the mesh combines them — O(rows/N) work and O(1)
communication per device, riding ICI.  Fingerprints are sound full-field
Fr random-weight RLCs of the COMPLETE table row (the jit kernels already
exact-compare the queried columns of the hinted row, so binding the full
resolved row into the table multiset is what replaces replicated-table
membership).

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
    """[n_rows, 16] sound Fr fingerprints of every full table row."""
    ctx = Ctx(np, table.n_rows, "eager")
    return np.asarray(
        fingerprint_fr(ctx, table.schema, tuple(table.schema.columns), table.data))


def collect_lookups(run_eager, tables) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """Instrument an eager verification pass and collect, per table, the
    resolved row indices and enabled masks of every lookup it performed.

    ``run_eager(cs_hook)``: callable running the eager check(s); it receives
    a function to install ``lookup_log`` on each ConstraintSystem it creates
    (see verify_block_lookups_logup for the canonical use).
    """
    log: List[tuple] = []
    run_eager(log)
    out: Dict[str, List] = {}
    for name, idx, en in log:
        out.setdefault(name, ([], []))
        out[name][0].append(idx)
        out[name][1].append(en)
    return {
        name: (np.concatenate(idxs), np.concatenate(ens))
        for name, (idxs, ens) in out.items()
    }


def _pad_to(arr: np.ndarray, n: int, fill=0) -> np.ndarray:
    if arr.shape[0] == n:
        return arr
    pad = np.full((n - arr.shape[0],) + arr.shape[1:], fill, dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def sharded_logup_check(
    query_fps: np.ndarray,      # [Q, 16] resolved-row fingerprints
    query_en: np.ndarray,       # [Q] bool
    table_fps: np.ndarray,      # [T, 16]
    multiplicities: np.ndarray,  # [T, 16] Fr limbs
    mesh,
    alpha: int,
    axes: Tuple[str, ...] = ("rows",),
) -> bool:
    """Evaluate the logUp identity with BOTH sides sharded over the mesh.

    No device ever holds the full table or query set: shard_map slices the
    row axis, each device reduces its local terms, and a psum of the raw
    limb sums (entries < 2^16 * n_devices, exact in u32) combines the mesh.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    n_dev = int(np.prod([mesh.shape[a] for a in axes]))
    Q = ((query_fps.shape[0] + n_dev - 1) // n_dev) * n_dev
    T = ((table_fps.shape[0] + n_dev - 1) // n_dev) * n_dev
    # padding: queries gain en=0 lanes, the table gains multiplicity-0 rows
    # (fingerprint 1 keeps denominators nonzero w.h.p.)
    query_fps = _pad_to(query_fps, Q).copy()
    query_fps[query_fps.sum(axis=1) == 0, 0] = 1
    query_en = _pad_to(query_en.astype(np.uint32), Q)
    table_fps = _pad_to(table_fps, T).copy()
    table_fps[table_fps.sum(axis=1) == 0, 0] = 1
    multiplicities = _pad_to(multiplicities, T)

    alpha_l = np.asarray(L.int_to_limbs(alpha % fr.P, 16))
    en_limbs = np.zeros((Q, 16), dtype=np.uint32)
    en_limbs[:, 0] = query_en

    spec_rows = P(axes)
    spec_repl = P()

    @jax.jit
    def check(q_fps, q_en, t_fps, mult):
        def local(q_fps, q_en, t_fps, mult):
            lhs = logup_partial_sum(jnp, q_fps, jnp.asarray(alpha_l), q_en)
            rhs = logup_partial_sum(jnp, t_fps, jnp.asarray(alpha_l), mult)
            # psum raw limbs (exact: entries < 2^16 * n_devices < 2^32)
            for a in axes:
                lhs = jax.lax.psum(lhs, a)
                rhs = jax.lax.psum(rhs, a)
            return lhs[None, :], rhs[None, :]

        lhs, rhs = shard_map(
            local, mesh=mesh,
            in_specs=(spec_rows, spec_rows, spec_rows, spec_rows),
            out_specs=(spec_repl, spec_repl),
        )(q_fps, q_en, t_fps, mult)
        # normalize the psum'd limb sums into canonical Fr and compare
        lhs_c = fr.reduce_wide(jnp, L.carry_propagate(jnp, lhs, 17))
        rhs_c = fr.reduce_wide(jnp, L.carry_propagate(jnp, rhs, 17))
        return jnp.all(lhs_c == rhs_c)

    return bool(np.asarray(check(query_fps, en_limbs, table_fps, multiplicities)))


def verify_block_lookups_logup(witness, mesh, alpha: int = 0xA1FA,
                               keccak_randomness: int = 0x64,
                               tables_names: Tuple[str, ...] = ("rw",),
                               axes: Tuple[str, ...] = ("rows",)) -> Dict[str, bool]:
    """Distributed lookup argument for a block witness.

    Runs the EVM circuit eagerly once (host) to log which table rows every
    lookup resolves to, then proves each logged family's multiset relation
    with tables AND queries sharded over the mesh.  Returns {table: ok}.
    """
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

    per_table: Dict[str, Tuple[List, List]] = {}
    for name, idx, en in log:
        per_table.setdefault(name, ([], []))
        per_table[name][0].append(idx)
        per_table[name][1].append(en)

    out: Dict[str, bool] = {}
    for name in tables_names:
        if name not in per_table:
            continue
        table: Table = getattr(tables, name)
        t_fps = table_fingerprints(table)
        idx = np.concatenate(per_table[name][0])
        en = np.concatenate(per_table[name][1])
        q_fps = t_fps[idx]
        mult_counts = np.bincount(idx[en], minlength=table.n_rows)
        ctx = Ctx(np, table.n_rows, "eager")
        mult = np.asarray(F.from_ints(ctx, [int(c) for c in mult_counts], 64)
                          .widen(16).limbs)
        out[name] = sharded_logup_check(q_fps, en, t_fps, mult, mesh, alpha,
                                        axes)
    return out
