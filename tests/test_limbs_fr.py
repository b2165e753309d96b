"""Unit tests of the limb bignum and BN254-Fr field layers against Python int
ground truth (the reference uses py_ecc bigints for the same field:
reference src/zkevm_specs/util/arithmetic.py:41-63)."""
import random

import numpy as np
import pytest

from zkevm_specs_tpu.ops import limbs as L
from zkevm_specs_tpu.ops import fr

rng = random.Random(0xC0FFEE)


def rand_ints(n, bits):
    return [rng.getrandbits(bits) for _ in range(n)]


def test_int_roundtrip():
    vals = rand_ints(50, 256)
    arr = L.ints_to_limbs(vals, 16)
    assert L.limbs_to_ints(arr) == vals


@pytest.mark.parametrize("xp", [np])
def test_add_sub_cmp(xp):
    a_i = rand_ints(64, 250)
    b_i = rand_ints(64, 250)
    a = xp.asarray(L.ints_to_limbs(a_i, 16))
    b = xp.asarray(L.ints_to_limbs(b_i, 16))
    s = L.add(xp, a, b, 17)
    assert L.limbs_to_ints(s) == [x + y for x, y in zip(a_i, b_i)]
    d, borrow = L.sub(xp, a, b)
    for i, (x, y) in enumerate(zip(a_i, b_i)):
        exp = (x - y) % (1 << 256)
        assert L.limbs_to_int(np.asarray(d)[i]) == exp
        assert int(np.asarray(borrow)[i]) == (1 if x < y else 0)
    assert list(np.asarray(L.lt(xp, a, b))) == [x < y for x, y in zip(a_i, b_i)]
    assert list(np.asarray(L.eq(xp, a, a))) == [True] * 64


@pytest.mark.parametrize("xp", [np])
def test_mul(xp):
    a_i = rand_ints(32, 254) + [0, 1, fr.P - 1]
    b_i = rand_ints(32, 254) + [fr.P - 1, fr.P - 1, fr.P - 1]
    a = xp.asarray(L.ints_to_limbs(a_i, 16))
    b = xp.asarray(L.ints_to_limbs(b_i, 16))
    prod = L.mul(xp, a, b)
    assert L.limbs_to_ints(prod) == [x * y for x, y in zip(a_i, b_i)]


@pytest.mark.parametrize("xp", [np])
def test_divmod_small(xp):
    a_i = rand_ints(40, 200)
    a = xp.asarray(L.ints_to_limbs(a_i, 16))
    for d in (32, 512, 3, 65535):
        q, r = L.divmod_small(xp, a, d)
        assert L.limbs_to_ints(q) == [x // d for x in a_i]
        assert [int(v) for v in np.asarray(r)] == [x % d for x in a_i]


@pytest.mark.parametrize("xp", [np])
def test_divmod_pow2(xp):
    a_i = rand_ints(40, 256)
    a = xp.asarray(L.ints_to_limbs(a_i, 16))
    for bits in (1, 7, 16, 64, 128, 130, 255):
        q, r = L.divmod_pow2(xp, a, bits)
        assert L.limbs_to_ints(q) == [x >> bits for x in a_i], bits
        assert L.limbs_to_ints(r) == [x % (1 << bits) for x in a_i], bits


@pytest.mark.parametrize("xp", [np])
def test_fr_ops(xp):
    a_i = [v % fr.P for v in rand_ints(48, 256)] + [0, 1, fr.P - 1, fr.P - 2]
    b_i = [v % fr.P for v in rand_ints(48, 256)] + [fr.P - 1, 0, fr.P - 1, 2]
    a = xp.asarray(L.ints_to_limbs(a_i, 16))
    b = xp.asarray(L.ints_to_limbs(b_i, 16))
    assert fr.to_ints(fr.add(xp, a, b)) == [(x + y) % fr.P for x, y in zip(a_i, b_i)]
    assert fr.to_ints(fr.sub(xp, a, b)) == [(x - y) % fr.P for x, y in zip(a_i, b_i)]
    assert fr.to_ints(fr.neg(xp, a)) == [(-x) % fr.P for x in a_i]
    assert fr.to_ints(fr.mul(xp, a, b)) == [(x * y) % fr.P for x, y in zip(a_i, b_i)]


@pytest.mark.parametrize("xp", [np])
def test_fr_inv(xp):
    a_i = [v % fr.P for v in rand_ints(8, 256)] + [1, fr.P - 1]
    a = xp.asarray(L.ints_to_limbs(a_i, 16))
    got = fr.to_ints(fr.inv(xp, a))
    assert got == [pow(x, fr.P - 2, fr.P) for x in a_i]


def test_fr_jax_matches_numpy():
    import jax.numpy as jnp

    a_i = [v % fr.P for v in rand_ints(16, 256)]
    b_i = [v % fr.P for v in rand_ints(16, 256)]
    a_np = np.asarray(L.ints_to_limbs(a_i, 16))
    b_np = np.asarray(L.ints_to_limbs(b_i, 16))
    a_j, b_j = jnp.asarray(a_np), jnp.asarray(b_np)
    for op in (fr.add, fr.sub, fr.mul):
        got_np = fr.to_ints(op(np, a_np, b_np))
        got_j = fr.to_ints(np.asarray(op(jnp, a_j, b_j)))
        assert got_np == got_j
