"""logUp production lookup engine tests: verdict parity with the spec-mode
engine + sharded partial sums composing via psum-style addition."""
import numpy as np
import pytest

from zkevm_specs_tpu.dsl import Ctx, F
from zkevm_specs_tpu.ops import fr
from zkevm_specs_tpu.ops import limbs as L
from zkevm_specs_tpu.tables.logup import (
    batch_inverse,
    compute_multiplicities,
    fingerprint_fr,
    logup_partial_sum,
    multiset_check,
)

ALPHA = 0xDEADBEEFCAFE1234567890


def fps_from_ints(vals):
    return np.asarray(L.ints_to_limbs([v % fr.P for v in vals], 16))


def test_batch_inverse():
    vals = [3, 7, 12345678901234567890, fr.P - 2, 1]
    arr = fps_from_ints(vals)
    inv = batch_inverse(np, arr)
    got = [L.limbs_to_int(r) for r in np.asarray(inv)]
    assert got == [pow(v, fr.P - 2, fr.P) for v in vals]


def test_logup_accepts_valid_multiset():
    ctx = Ctx(np, 1)
    table = fps_from_ints([10, 20, 30, 40])
    queries = fps_from_ints([20, 20, 40, 10, 10, 10])
    mult = compute_multiplicities(np.asarray(queries), np.asarray(table), ctx)
    assert multiset_check(ctx, queries, table, mult, ALPHA)


def test_logup_rejects_missing_entry():
    ctx = Ctx(np, 1)
    table = fps_from_ints([10, 20, 30, 40])
    queries = fps_from_ints([20, 99])  # 99 not in table
    mult = compute_multiplicities(np.asarray(queries), np.asarray(table), ctx)
    assert not multiset_check(ctx, queries, table, mult, ALPHA)


def test_logup_rejects_wrong_multiplicities():
    ctx = Ctx(np, 1)
    table = fps_from_ints([10, 20, 30, 40])
    queries = fps_from_ints([20, 20])
    mult = F.from_ints(ctx, [0, 1, 0, 0], 64).widen(16).limbs  # claims one hit
    assert not multiset_check(ctx, queries, table, mult, ALPHA)


def test_logup_shard_partials_compose():
    # partial sums over query shards must add to the full sum (the psum path)
    queries = fps_from_ints([11, 22, 33, 44, 55, 66])
    alpha_l = np.asarray(L.int_to_limbs(ALPHA % fr.P, 16))
    full = logup_partial_sum(np, queries, alpha_l)
    a = logup_partial_sum(np, queries[:3], alpha_l)
    b = logup_partial_sum(np, queries[3:], alpha_l)
    combined = fr.add(np, a[None, :], b[None, :])[0]
    assert L.limbs_to_int(np.asarray(full)) == L.limbs_to_int(np.asarray(combined))


def test_logup_jax_matches_numpy():
    import jax.numpy as jnp

    queries = fps_from_ints([7, 8, 9, 10, 11])
    alpha_l_np = np.asarray(L.int_to_limbs(ALPHA % fr.P, 16))
    s_np = logup_partial_sum(np, queries, alpha_l_np)
    s_j = logup_partial_sum(jnp, jnp.asarray(queries), jnp.asarray(alpha_l_np))
    assert L.limbs_to_int(np.asarray(s_np)) == L.limbs_to_int(np.asarray(s_j))
