"""Vectorized multi-precision integer arithmetic on 16-bit limb tensors.

This is the computational foundation of the TPU-native zkEVM engine.  Big
integers (up to 512+ bits) are stored as little-endian arrays of 16-bit
limbs held in ``uint32`` lanes: shape ``[..., n_limbs]``.  Every function is
written against an array namespace ``xp`` that is either ``numpy`` (eager
host / spec mode) or ``jax.numpy`` (jit / TPU mode), so there is exactly one
implementation of the arithmetic used by both paths.

Why 16-bit limbs in u32 lanes: a product of two limbs fits exactly in u32
(no overflow), and after splitting each product into its 16-bit lo/hi
halves, column accumulations of up to ~2000 terms stay below 2^32.  All limb
loops are over *static* limb counts, so XLA unrolls them into straight-line
vector code on the VPU.

Replaces the role of py_ecc's Python bigints in the reference
(reference: src/zkevm_specs/util/arithmetic.py:41-63).
"""
from __future__ import annotations

from typing import Any, Tuple

import numpy as np

LIMB_BITS = 16
LIMB_BASE = 1 << LIMB_BITS
LIMB_MASK = LIMB_BASE - 1
DTYPE = np.uint32


# ---------------------------------------------------------------------------
# Host-side conversions (always numpy; used for constants and witness IO)
# ---------------------------------------------------------------------------

def int_to_limbs(value: int, n_limbs: int) -> np.ndarray:
    """Convert a Python int to a little-endian 16-bit limb vector."""
    assert value >= 0
    assert value < (1 << (LIMB_BITS * n_limbs)), (
        f"value needs more than {n_limbs} limbs"
    )
    return np.array(
        [(value >> (LIMB_BITS * i)) & LIMB_MASK for i in range(n_limbs)],
        dtype=DTYPE,
    )


def ints_to_limbs(values, n_limbs: int) -> np.ndarray:
    """Convert a sequence of Python ints to a [len, n_limbs] limb array.

    Fast path: when every value fits in u64 (the common case for witness
    columns) the split is fully vectorized."""
    vals = list(values)
    if all(0 <= v < (1 << 63) for v in map(int, vals)):
        arr = np.asarray(vals, dtype=np.uint64)
        out = np.zeros((len(vals), n_limbs), dtype=DTYPE)
        for k in range(min(4, n_limbs)):
            out[:, k] = ((arr >> np.uint64(LIMB_BITS * k)) & np.uint64(LIMB_MASK)).astype(DTYPE)
        assert n_limbs >= 4 or not (arr >> np.uint64(LIMB_BITS * n_limbs)).any(), (
            f"values need more than {n_limbs} limbs"
        )
        return out
    out = np.empty((len(vals), n_limbs), dtype=DTYPE)
    for i, v in enumerate(vals):
        out[i] = int_to_limbs(int(v), n_limbs)
    return out


def limbs_to_int(limbs) -> int:
    """Convert a 1-D limb vector back to a Python int."""
    arr = np.asarray(limbs)
    assert arr.ndim == 1
    value = 0
    for i in range(arr.shape[0] - 1, -1, -1):
        value = (value << LIMB_BITS) | int(arr[i])
    return value


def limbs_to_ints(limbs) -> list:
    """Convert a [..., n_limbs] limb array to a nested list of Python ints."""
    arr = np.asarray(limbs)
    if arr.ndim == 1:
        return limbs_to_int(arr)
    return [limbs_to_ints(a) for a in arr]


# ---------------------------------------------------------------------------
# Shape helpers
# ---------------------------------------------------------------------------

def nlimbs(a) -> int:
    return a.shape[-1]


def pad_limbs(xp, a, n: int):
    """Zero-pad the limb axis of ``a`` up to ``n`` limbs."""
    cur = a.shape[-1]
    if cur == n:
        return a
    assert cur < n
    pad = [(0, 0)] * (a.ndim - 1) + [(0, n - cur)]
    return xp.pad(a, pad)


def trunc_limbs(a, n: int):
    """Keep only the low ``n`` limbs (value mod 2^(16n))."""
    return a[..., :n]


# ---------------------------------------------------------------------------
# Carry propagation
# ---------------------------------------------------------------------------

def carry_propagate(xp, cols, out_n: int):
    """Normalize accumulated columns into canonical 16-bit limbs.

    ``cols``: [..., m] uint32, each entry < 2^32 with enough headroom that
    carries (< 2^16) never overflow when added.  Returns [..., out_n]
    canonical limbs.  The caller guarantees the true value fits in out_n
    limbs (any residual carry out of the top limb is dropped).
    """
    m = cols.shape[-1]
    outs = []
    carry = None
    for k in range(out_n):
        v = cols[..., k] if k < m else xp.zeros(cols.shape[:-1], dtype=DTYPE)
        if carry is not None:
            v = v + carry
        outs.append(v & LIMB_MASK)
        carry = v >> LIMB_BITS
    return xp.stack(outs, axis=-1)


# ---------------------------------------------------------------------------
# Addition / subtraction / comparison
# ---------------------------------------------------------------------------

def add(xp, a, b, out_n: int):
    """(a + b) as an out_n-limb value; caller guarantees it fits."""
    n = max(a.shape[-1], b.shape[-1])
    a = pad_limbs(xp, a, n)
    b = pad_limbs(xp, b, n)
    return carry_propagate(xp, a + b, out_n)


def sub(xp, a, b) -> Tuple[Any, Any]:
    """(a - b) mod 2^(16n) plus a borrow flag (1 where a < b)."""
    n = max(a.shape[-1], b.shape[-1])
    a = pad_limbs(xp, a, n)
    b = pad_limbs(xp, b, n)
    outs = []
    borrow = xp.zeros(xp.broadcast_shapes(a.shape[:-1], b.shape[:-1]), dtype=DTYPE)
    for k in range(n):
        # Add 2^16 before subtracting so the arithmetic never wraps in u32.
        v = LIMB_BASE + a[..., k] - b[..., k] - borrow
        outs.append(v & LIMB_MASK)
        borrow = 1 - (v >> LIMB_BITS)
    return xp.stack(outs, axis=-1), borrow


def lt(xp, a, b):
    """Boolean a < b (unsigned), elementwise over the batch."""
    n = max(a.shape[-1], b.shape[-1])
    a = pad_limbs(xp, a, n)
    b = pad_limbs(xp, b, n)
    shape = xp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    res = xp.zeros(shape, dtype=bool)
    eq = xp.ones(shape, dtype=bool)
    for k in range(n - 1, -1, -1):
        res = res | (eq & (a[..., k] < b[..., k]))
        eq = eq & (a[..., k] == b[..., k])
    return res


def eq(xp, a, b):
    """Boolean a == b, elementwise over the batch."""
    n = max(a.shape[-1], b.shape[-1])
    a = pad_limbs(xp, a, n)
    b = pad_limbs(xp, b, n)
    return xp.all(a == b, axis=-1)


def is_zero(xp, a):
    return xp.all(a == 0, axis=-1)


# ---------------------------------------------------------------------------
# Multiplication
# ---------------------------------------------------------------------------

def mul(xp, a, b, out_n: int = None):
    """Schoolbook product of limb vectors.

    a: [..., na], b: [..., nb] -> [..., out_n] (default na+nb).
    Each limb product fits u32; lo/hi halves are accumulated per output
    column and carry-propagated once at the end.  na+nb is assumed small
    enough (< ~2000 terms/column) that columns never overflow u32 — true for
    everything up to the 34-limb Barrett intermediates used here.
    """
    na, nb = a.shape[-1], b.shape[-1]
    if out_n is None:
        out_n = na + nb
    # prod[..., i, j] = a_i * b_j  (exact in u32)
    prod = a[..., :, None] * b[..., None, :]
    lo = prod & LIMB_MASK
    hi = prod >> LIMB_BITS
    ncols = min(na + nb, out_n)
    batch = xp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    cols = xp.zeros(batch + (ncols,), dtype=DTYPE)
    for i in range(na):
        # lo parts land at column i+j, hi parts at i+j+1
        lo_n = min(nb, ncols - i)
        if lo_n > 0:
            seg = xp.broadcast_to(lo[..., i, :lo_n], batch + (lo_n,))
            pad = [(0, 0)] * len(batch) + [(i, ncols - i - lo_n)]
            cols = cols + xp.pad(seg, pad)
        hi_n = min(nb, ncols - i - 1)
        if hi_n > 0:
            seg = xp.broadcast_to(hi[..., i, :hi_n], batch + (hi_n,))
            pad = [(0, 0)] * len(batch) + [(i + 1, ncols - i - 1 - hi_n)]
            cols = cols + xp.pad(seg, pad)
    return carry_propagate(xp, cols, out_n)


def mul_small(xp, a, k: int, out_n: int):
    """Multiply by a small Python-int scalar k < 2^16."""
    assert 0 <= k < LIMB_BASE
    prod = a * DTYPE(k)
    lo = prod & LIMB_MASK
    hi = prod >> LIMB_BITS
    n = a.shape[-1]
    cols = pad_limbs(xp, lo, min(n + 1, out_n))
    pad = [(0, 0)] * (a.ndim - 1) + [(1, max(0, out_n - n - 1))]
    cols = cols + xp.pad(hi[..., : out_n - 1], pad)
    return carry_propagate(xp, cols, out_n)


# ---------------------------------------------------------------------------
# Division by small constants (vectorized long division)
# ---------------------------------------------------------------------------

def divmod_small(xp, a, d: int):
    """(a // d, a % d) for a scalar constant 0 < d < 2^16.

    Vectorized schoolbook long division from the top limb down:
    the running remainder r < d, so r*2^16 + limb < 2^32 never overflows.
    """
    assert 0 < d < LIMB_BASE
    n = a.shape[-1]
    r = xp.zeros(a.shape[:-1], dtype=DTYPE)
    q = []
    for k in range(n - 1, -1, -1):
        cur = (r << LIMB_BITS) | a[..., k]
        q.append(cur // DTYPE(d))
        r = cur % DTYPE(d)
    q.reverse()
    return xp.stack(q, axis=-1), r


def divmod_pow2(xp, a, bits: int, out_n: int = None):
    """(a >> bits, a mod 2^bits) for a static bit count."""
    k, rem_bits = divmod(bits, LIMB_BITS)
    n = a.shape[-1]
    if out_n is None:
        out_n = max(1, n - k)
    if rem_bits == 0:
        qq = a[..., k:] if k < n else xp.zeros(a.shape[:-1] + (1,), dtype=DTYPE)
        q = pad_limbs(xp, qq[..., : max(1, out_n)], out_n) if qq.shape[-1] >= 1 else qq
        q = pad_limbs(xp, trunc_limbs(qq, out_n) if qq.shape[-1] > out_n else qq, out_n)
    else:
        shifted = a[..., k:]
        m = shifted.shape[-1]
        lo_parts = shifted >> DTYPE(rem_bits)
        hi_parts = (shifted & ((1 << rem_bits) - 1)) << DTYPE(LIMB_BITS - rem_bits)
        outs = []
        for i in range(m):
            v = lo_parts[..., i]
            if i + 1 < m:
                v = v | hi_parts[..., i + 1]
            outs.append(v)
        q = xp.stack(outs, axis=-1)
        q = pad_limbs(xp, trunc_limbs(q, out_n) if q.shape[-1] > out_n else q, out_n)
    # remainder: low k limbs plus rem_bits of limb k
    rem_n = k + (1 if rem_bits else 0)
    if rem_n == 0:
        r = xp.zeros(a.shape[:-1] + (1,), dtype=DTYPE)
    else:
        parts = [a[..., i] for i in range(min(k, n))]
        while len(parts) < k:
            parts.append(xp.zeros(a.shape[:-1], dtype=DTYPE))
        if rem_bits:
            top = a[..., k] & ((1 << rem_bits) - 1) if k < n else xp.zeros(a.shape[:-1], dtype=DTYPE)
            parts.append(top)
        r = xp.stack(parts, axis=-1)
    return q, r


def select(xp, cond, a, b):
    """Elementwise limb select: cond ? a : b.  cond: bool[...]."""
    n = max(a.shape[-1], b.shape[-1])
    a = pad_limbs(xp, a, n)
    b = pad_limbs(xp, b, n)
    return xp.where(cond[..., None], a, b)
