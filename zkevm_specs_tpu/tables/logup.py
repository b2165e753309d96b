"""Production lookup engine: logUp-style multiset fingerprint argument.

Spec mode resolves each lookup by sorted-index search (engine.py) so it can
return row values and report precise errors.  Production/distributed mode
only needs to *check* that every query tuple appears in the table; the
logUp identity does that with one field equation:

    sum_i 1/(alpha - q_i)  ==  sum_j m_j/(alpha - t_j)

where q_i / t_j are sound Fr fingerprints (random-weight RLC over the key
columns), m_j are witness multiplicities, and alpha is a random challenge.
Each shard computes partial sums locally; a single psum over the mesh
combines them — this is the ICI-friendly distribution story (SURVEY.md
§2.4 item 5): per-shard O(rows) work, O(1) communication.

Inverses are batched with the Montgomery product trick; the prefix products
run through jax.lax.associative_scan (log-depth on TPU).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..dsl.value import Ctx, F, Word
from ..ops import fr
from ..ops import limbs as L


def fingerprint_fr(ctx: Ctx, schema, subset: Tuple[str, ...], values) -> "np.ndarray":
    """Sound Fr fingerprint: sum_j w_j * col_j with fixed random weights
    (full-field; the u64 router hash in engine.py is NOT sound on its own)."""
    xp = ctx.xp
    acc = None
    for c in subset:
        v = values[c]
        spec = schema.columns[c]
        parts = (
            [("lo", v.lo), ("hi", v.hi)] if spec.kind == "word"
            else [("f", v if isinstance(v, F) else v.value())]
        )
        for part_name, fv in parts:
            w = F.const(ctx, schema.weight(c, part_name))
            term = (fv * w).widen(16).limbs
            acc = term if acc is None else fr.add(xp, acc, term)
    return acc


def batch_inverse(xp, limbs):
    """Invert a batch of nonzero Fr elements with 3N muls + 1 inversion.

    Prefix products via associative scan (log-depth under jit); the numpy
    path uses a plain loop."""
    n = limbs.shape[0]
    if xp is np:
        prefix = np.empty_like(limbs)
        acc = L.int_to_limbs(1, 16)[None, :]
        outs = []
        for i in range(n):
            acc = fr.mul(np, acc, limbs[i][None, :])
            outs.append(acc[0])
        prefix = np.stack(outs)
        total_inv = fr.inv(np, prefix[-1][None, :])
        invs = np.empty_like(limbs)
        running = total_inv
        for i in range(n - 1, 0, -1):
            invs[i] = fr.mul(np, running, prefix[i - 1][None, :])[0]
            running = fr.mul(np, running, limbs[i][None, :])
        invs[0] = running[0]
        return invs
    else:
        import jax

        prefix = jax.lax.associative_scan(lambda a, b: fr.mul(xp, a, b), limbs)
        total_inv = fr.inv(xp, prefix[-1][None, :])
        # suffix products: invs[i] = prefix[i-1] * suffix_inv[i]
        rev = limbs[::-1]
        suffix = jax.lax.associative_scan(lambda a, b: fr.mul(xp, a, b), rev)[::-1]
        # invs[i] = prefix[i-1] * total_inv * suffix[i+1]
        ones = xp.asarray(L.int_to_limbs(1, 16))[None, :]
        prefix_shift = xp.concatenate([ones, prefix[:-1]], axis=0)
        suffix_shift = xp.concatenate([suffix[1:], ones], axis=0)
        t = fr.mul(xp, prefix_shift, suffix_shift)
        return fr.mul(xp, t, xp.broadcast_to(total_inv, t.shape))


def logup_partial_sum(xp, fps, alpha_limbs, multiplicities=None):
    """sum_i m_i / (alpha - fp_i) for one shard; returns a 16-limb Fr value."""
    n = fps.shape[0]
    alpha = xp.broadcast_to(alpha_limbs, (n, 16))
    denom = fr.sub(xp, alpha, L.pad_limbs(xp, fps, 16))
    inv = batch_inverse(xp, denom)
    if multiplicities is not None:
        m = multiplicities
        inv = fr.mul(xp, inv, m)
    # tree-reduce the sum
    total = inv
    while total.shape[0] > 1:
        half = total.shape[0] // 2
        lead = fr.add(xp, total[:half], total[half: 2 * half])
        if total.shape[0] % 2:
            lead = xp.concatenate(
                [lead[:-1], fr.add(xp, lead[-1:], total[-1:])], axis=0
            )
        total = lead
    return total[0]


def multiset_check(ctx: Ctx, query_fps, table_fps, multiplicities, alpha: int) -> bool:
    """Single-shard logUp check: queries form a sub-multiset of the table
    with the witnessed multiplicities."""
    xp = ctx.xp
    alpha_l = xp.asarray(L.int_to_limbs(alpha % fr.P, 16))
    lhs = logup_partial_sum(xp, query_fps, alpha_l)
    rhs = logup_partial_sum(xp, table_fps, alpha_l, multiplicities)
    return bool(np.asarray(L.eq(np, np.asarray(lhs), np.asarray(rhs))))


def compute_multiplicities(query_fps_host: np.ndarray, table_fps_host: np.ndarray, ctx: Ctx):
    """Witness-side multiplicity counting (host): how many queries hit each
    table row."""
    from collections import Counter

    def key(row):
        return tuple(int(v) for v in row)

    counts = Counter(key(r) for r in query_fps_host)
    mult = [counts.get(key(r), 0) for r in table_fps_host]
    return F.from_ints(ctx, mult, 64).widen(16).limbs
