"""BN254 scalar-field (Fr) arithmetic on 16-bit limb tensors.

The reference spec does all circuit arithmetic in the BN254 *scalar* field
(reference: src/zkevm_specs/util/arithmetic.py:41-63, modulus =
bn128.curve_order).  Here the same field is implemented as vectorized limb
arithmetic (see ops/limbs.py) with Barrett reduction, usable under numpy
(eager) and jax.numpy (jit/TPU) alike.

Layout: a field element batch is ``[..., 16] uint32`` — sixteen 16-bit
limbs, little-endian.  All values are kept canonical (< p) at all times;
magnitude-aware fast paths for narrow values live one level up in
``dsl/value.py``.
"""
from __future__ import annotations

import numpy as np

from . import limbs as L

# BN254 curve order (the scalar field modulus "r", called FQ's modulus in the
# reference spec).
P = 21888242871839275222246405745257275088548364400416034343698204186575808495617
P_BITS = 254
NL = 16  # limbs per canonical field element
BARRETT_K = 512  # mu = floor(2^512 / p)
MU = (1 << BARRETT_K) // P

P_LIMBS = L.int_to_limbs(P, NL)
P_LIMBS_17 = L.int_to_limbs(P, 17)
MU_LIMBS = L.int_to_limbs(MU, 17)  # 259 bits -> 17 limbs
TWO_P_LIMBS = L.int_to_limbs(2 * P, 17)

# Constant used by the reference's field-division-by-2^128 in mul_add_words
# (reference: src/zkevm_specs/evm_circuit/instruction.py:613).
INV_2_128 = pow(1 << 128, P - 2, P)
INV_2_128_LIMBS = L.int_to_limbs(INV_2_128, NL)


def _const(xp, host_arr):
    return xp.asarray(host_arr)


def reduce_wide(xp, x):
    """Barrett-reduce x (< p^2, up to 32 limbs) to a canonical 16-limb value.

    Standard Barrett with b=2^16, k=16 (HAC 14.42):
      q1 = x >> 240 ; q2 = q1*mu ; q3 = q2 >> 272
      r  = (x mod 2^272) - (q3*p mod 2^272), corrected into [0, p).
    """
    x = L.pad_limbs(xp, x, 32)
    q1 = x[..., 15:]  # x >> 240, 17 limbs
    q2 = L.mul(xp, q1, _const(xp, MU_LIMBS))  # 34 limbs
    q3 = q2[..., 17:]  # q2 >> 272, 17 limbs
    r1 = x[..., :17]
    r2 = L.mul(xp, q3, _const(xp, P_LIMBS), out_n=17)  # mod 2^272
    r, borrow = L.sub(xp, r1, r2)
    # If borrowed, the true difference was negative mod 2^272 — cannot happen
    # for Barrett (0 <= x - q3*p < 3p < 2^272), so borrow is always 0.
    # Conditionally subtract p twice.
    for _ in range(2):
        d, b2 = L.sub(xp, r, _const(xp, P_LIMBS_17))
        r = L.select(xp, b2 == 0, d, r)
    return r[..., :NL]


def reduce_once(xp, x):
    """Reduce a 16/17-limb value known < 2p into [0, p)."""
    n = x.shape[-1]
    p = _const(xp, P_LIMBS if n == NL else P_LIMBS_17)
    d, borrow = L.sub(xp, x, p)
    return L.select(xp, borrow == 0, d, x)[..., :NL]


def add(xp, a, b):
    """(a + b) mod p for canonical 16-limb inputs."""
    s = L.add(xp, L.pad_limbs(xp, a, NL), L.pad_limbs(xp, b, NL), 17)
    return reduce_once(xp, s)


def sub(xp, a, b):
    """(a - b) mod p for canonical 16-limb inputs."""
    a = L.pad_limbs(xp, a, NL)
    b = L.pad_limbs(xp, b, NL)
    d, borrow = L.sub(xp, a, b)
    # where borrowed, add p back
    d_plus_p = L.add(xp, d, _const(xp, P_LIMBS), NL)  # mod 2^256 add is exact here
    return L.select(xp, borrow == 0, d, d_plus_p)


def neg(xp, a):
    """(-a) mod p."""
    a = L.pad_limbs(xp, a, NL)
    d, _ = L.sub(xp, _const(xp, P_LIMBS), a)
    return L.select(xp, L.is_zero(xp, a), a, d)


def mul(xp, a, b):
    """(a * b) mod p for canonical inputs of any limb width <= 16."""
    prod = L.mul(xp, a, b)
    if prod.shape[-1] <= NL:
        # product fits 256 bits; still may exceed p only if >= 254 bits —
        # callers with static narrow bounds skip reduction at the dsl layer,
        # here we reduce unconditionally for safety.
        return reduce_wide(xp, prod)
    return reduce_wide(xp, prod)


def mul_noreduce(xp, a, b, out_n=None):
    return L.mul(xp, a, b, out_n=out_n)


def pow_const(xp, a, e: int):
    """a ** e mod p for a static Python-int exponent (square & multiply)."""
    result = None
    base = a
    while e > 0:
        if e & 1:
            result = base if result is None else mul(xp, result, base)
        e >>= 1
        if e:
            base = mul(xp, base, base)
    if result is None:
        shape = a.shape[:-1] + (NL,)
        one = np.zeros((NL,), dtype=L.DTYPE)
        one[0] = 1
        return xp.broadcast_to(_const(xp, one), shape)
    return L.pad_limbs(xp, result, NL)


_INV_EXP_BITS = np.array([(P - 2) >> i & 1 for i in range(P_BITS)][::-1],
                         dtype=np.uint32)  # MSB first


def inv(xp, a):
    """a^(p-2) mod p — Fermat inverse (returns 0 for 0, like the reference's
    prime_field_inv wrapper behavior is never hit on 0 in practice).

    Under jax the square-and-multiply ladder runs as a lax.scan over the
    (static) exponent bits so the compiled graph holds ONE square+mul body
    instead of ~400 unrolled field muls."""
    if xp is np:
        return pow_const(xp, a, P - 2)
    import jax

    a16 = L.pad_limbs(xp, a, NL)
    # derive the initial carry from the input so its sharding/varying axes
    # match inside shard_map bodies
    one = (a16 * 0).at[..., 0].set(1)

    def body(acc, bit):
        sq = mul(xp, acc, acc)
        withmul = mul(xp, sq, a16)
        out = L.select(xp, xp.broadcast_to(bit.astype(bool), acc.shape[:-1]),
                       withmul, sq)
        return out, None

    acc, _ = jax.lax.scan(body, one, xp.asarray(_INV_EXP_BITS))
    return acc


def from_ints(xp, values):
    """Host helper: Python ints -> canonical device/host limb array."""
    return xp.asarray(L.ints_to_limbs([v % P for v in values], NL))


def to_ints(arr):
    return L.limbs_to_ints(np.asarray(arr))
