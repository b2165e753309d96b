"""Tests of the columnar table + sorted-fingerprint lookup engine against the
reference's linear-scan lookup semantics (reference table.py:864-885)."""
import numpy as np
import pytest

from zkevm_specs_tpu.dsl import Ctx, F, Word, ConstraintSystem
from zkevm_specs_tpu.tables.engine import Col, Schema, Table
from zkevm_specs_tpu.tables.fixed import FixedTables
from zkevm_specs_tpu.tables.schemas import FixedTableTag


SCHEMA = Schema(
    "test",
    {
        "a": Col("f", 32),
        "b": Col("f", 64),
        "w": Col("word"),
    },
)


def make_table(ctx, rows):
    return Table.from_rows(ctx, SCHEMA, rows)


def test_lookup_hit_returns_row():
    ctx = Ctx(np, 3)
    t = make_table(ctx, [
        {"a": 1, "b": 10, "w": 100},
        {"a": 2, "b": 20, "w": 200 << 128},
        {"a": 3, "b": 30, "w": 300},
    ])
    cs = ConstraintSystem(ctx)
    row = t.lookup(cs, {"a": F.from_ints(ctx, [1, 2, 3], 32), "b": None, "w": None})
    assert not np.asarray(cs.fail).any()
    assert row.b.to_ints() == [10, 20, 30]
    assert row.w.to_ints() == [100, 200 << 128, 300]


def test_lookup_miss_flags_lane():
    ctx = Ctx(np, 3)
    t = make_table(ctx, [{"a": 1, "b": 10, "w": 0}, {"a": 2, "b": 20, "w": 0}])
    cs = ConstraintSystem(ctx)
    t.lookup(cs, {"a": F.from_ints(ctx, [1, 9, 2], 32), "b": None, "w": None})
    assert list(np.asarray(cs.fail)) == [False, True, False]
    msgs = cs.first_failure_message()
    assert msgs[0] is None and "unsatisfied" in msgs[1]


def test_lookup_ambiguous():
    ctx = Ctx(np, 2)
    t = make_table(ctx, [
        {"a": 1, "b": 10, "w": 0},
        {"a": 1, "b": 11, "w": 0},
        {"a": 2, "b": 20, "w": 0},
    ])
    cs = ConstraintSystem(ctx)
    t.lookup(cs, {"a": F.from_ints(ctx, [1, 2], 32), "b": None, "w": None})
    assert list(np.asarray(cs.fail)) == [True, False]
    assert "ambiguous" in cs.first_failure_message()[0]


def test_lookup_word_key():
    ctx = Ctx(np, 2)
    t = make_table(ctx, [
        {"a": 1, "b": 10, "w": (5 << 128) + 7},
        {"a": 2, "b": 20, "w": 9},
    ])
    cs = ConstraintSystem(ctx)
    row = t.lookup(cs, {"a": None, "b": None, "w": Word.from_ints(ctx, [(5 << 128) + 7, 9])})
    assert not np.asarray(cs.fail).any()
    assert row.a.to_ints() == [1, 2]


def test_lookup_masked_lanes_unconstrained():
    ctx = Ctx(np, 2)
    t = make_table(ctx, [{"a": 1, "b": 10, "w": 0}])
    cs = ConstraintSystem(ctx)
    t.lookup(
        cs,
        {"a": F.from_ints(ctx, [7, 1], 32), "b": None, "w": None},
        enabled=np.array([False, True]),
    )
    assert not np.asarray(cs.fail).any()


def test_duplicate_rows_collapse():
    ctx = Ctx(np, 1)
    t = make_table(ctx, [{"a": 1, "b": 10, "w": 3}, {"a": 1, "b": 10, "w": 3}])
    assert t.n_rows == 1
    cs = ConstraintSystem(ctx)
    t.lookup(cs, {"a": F.from_ints(ctx, [1], 32), "b": None, "w": None})
    assert not np.asarray(cs.fail).any()


# -- fixed-table predicates -------------------------------------------------

def fx():
    ft = FixedTables()
    ft.register_set(FixedTableTag.ResponsibleOpcode, [5 * 2048 * 256 + 1 * 2048 + 0])
    return ft


@pytest.mark.parametrize(
    "tag,triples,expect",
    [
        (FixedTableTag.Range256, [(255, 0, 0), (256, 0, 0), (3, 1, 0)], [True, False, False]),
        (FixedTableTag.Range5, [(4, 0, 0), (5, 0, 0), (0, 0, 0)], [True, False, True]),
        (FixedTableTag.SignByte, [(0x80, 0xFF, 0), (0x7F, 0, 0), (0x80, 0, 0)], [True, True, False]),
        (FixedTableTag.BitwiseAnd, [(0xF0, 0x3C, 0x30), (5, 3, 1), (5, 3, 2)], [True, True, False]),
        (FixedTableTag.BitwiseOr, [(0xF0, 0x3C, 0xFC), (1, 2, 3), (1, 2, 0)], [True, True, False]),
        (FixedTableTag.BitwiseXor, [(0xF0, 0x3C, 0xCC), (5, 3, 6), (5, 3, 7)], [True, True, False]),
        (FixedTableTag.Pow2, [(0, 1, 0), (127, 1 << 127, 0), (128, 0, 1), (255, 0, 1 << 127), (12, 4096, 0), (12, 4095, 0)], [True, True, True, True, True, False]),
    ],
)
def test_fixed_predicates(tag, triples, expect):
    ctx = Ctx(np, len(triples))
    cs = ConstraintSystem(ctx)
    v0 = F.from_ints(ctx, [t[0] for t in triples], 254)
    v1 = F.from_ints(ctx, [t[1] for t in triples], 254)
    v2 = F.from_ints(ctx, [t[2] for t in triples], 254)
    fx().lookup(cs, tag, v0, v1, v2)
    assert list(~np.asarray(cs.fail)) == expect


def test_responsible_opcode_set():
    ctx = Ctx(np, 2)
    cs = ConstraintSystem(ctx)
    ft = fx()
    ft.lookup(
        cs,
        FixedTableTag.ResponsibleOpcode,
        F.from_ints(ctx, [5, 5], 8),
        F.from_ints(ctx, [1, 2], 8),
        F.from_ints(ctx, [0, 0], 8),
    )
    assert list(np.asarray(cs.fail)) == [False, True]
