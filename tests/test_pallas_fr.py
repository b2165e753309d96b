"""Pallas Fr-mul kernel vs the reference XLA/numpy path (interpret mode on
CPU; the real TPU lowering is exercised by bench.py BENCH_MODE=frmul)."""
import random
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))

from zkevm_specs_tpu.ops import fr
from zkevm_specs_tpu.ops.pallas_fr import fr_mul_pallas

P = fr.P
rng = random.Random(1234)


def test_pallas_fr_mul_matches_spec():
    vals_a = [0, 1, P - 1, P - 2, 2**255 % P, rng.randrange(P)] + [
        rng.randrange(P) for _ in range(58)
    ]
    vals_b = [1, P - 1, 0, 2, rng.randrange(P), rng.randrange(P)] + [
        rng.randrange(P) for _ in range(58)
    ]
    a = fr.from_ints(np, vals_a)
    b = fr.from_ints(np, vals_b)
    out = np.asarray(fr_mul_pallas(a, b, tile=32, interpret=True))
    got = fr.to_ints(out)
    want = [(x * y) % P for x, y in zip(vals_a, vals_b)]
    assert got == want


def test_pallas_fr_mul_odd_batch_padding():
    vals_a = [rng.randrange(P) for _ in range(13)]
    vals_b = [rng.randrange(P) for _ in range(13)]
    a = fr.from_ints(np, vals_a)
    b = fr.from_ints(np, vals_b)
    out = np.asarray(fr_mul_pallas(a, b, tile=8, interpret=True))
    assert fr.to_ints(out) == [(x * y) % P for x, y in zip(vals_a, vals_b)]
