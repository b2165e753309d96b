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
    # wide path: int.to_bytes is C-speed; one frombuffer splits all limbs
    # at once (the per-element int_to_limbs loop dominated build profiles)
    nbytes = n_limbs * (LIMB_BITS // 8)
    try:
        buf = b"".join(int(v).to_bytes(nbytes, "little") for v in vals)
    except OverflowError:
        raise AssertionError(f"values need more than {n_limbs} limbs")
    return (np.frombuffer(buf, dtype="<u2")
            .reshape(len(vals), n_limbs).astype(DTYPE))


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
    if xp is np:
        # np.pad's generality costs ~30us/call; zeros+assign is ~10x cheaper
        # and this is the hottest allocation in the eager hint pass
        out = np.zeros(a.shape[:-1] + (n,), dtype=a.dtype)
        out[..., :cur] = a
        return out
    pad = [(0, 0)] * (a.ndim - 1) + [(0, n - cur)]
    return xp.pad(a, pad)


def trunc_limbs(a, n: int):
    """Keep only the low ``n`` limbs (value mod 2^(16n))."""
    return a[..., :n]


# ---------------------------------------------------------------------------
# Carry propagation
# ---------------------------------------------------------------------------

def _shift_up(xp, hi):
    """Shift a limb array up one position (dropping the top entry)."""
    if xp is np:
        out = np.zeros_like(hi)
        out[..., 1:] = hi[..., :-1]
        return out
    pad = [(0, 0)] * (hi.ndim - 1) + [(1, 0)]
    return xp.pad(hi[..., :-1], pad)


_CHUNK = 16  # limbs per packed carry-resolution word (bits 0..16 of u32)

# precomputed bit-weight / bit-index vectors per chunk width (numpy views;
# jnp callers re-wrap them via xp.asarray which is free for small constants)
_PW = {w: np.array([1 << k for k in range(w)], dtype=DTYPE)
       for w in range(1, _CHUNK + 1)}
_KIDX = {w: np.arange(w, dtype=DTYPE) for w in range(1, _CHUNK + 1)}


def _resolve_carries(xp, v):
    """Exact carry resolution for entries bounded by 2^16 (inclusive).

    Packs per-limb generate (v == 2^16) and propagate (v == 2^16-1) flags
    into u32 bitmask words and resolves arbitrarily long carry chains with
    one integer addition per 16-limb chunk — the classic carry-lookahead-
    via-adder trick: carries = B | ((A+B) ^ A ^ B) with A = propagate bits,
    B = generate bits shifted up one.  O(1) vector ops per chunk instead of
    a sequential per-limb ripple, which is what keeps both the XLA graph
    and the TPU critical path small.
    """
    n = v.shape[-1]
    out = []
    c_in = xp.zeros(v.shape[:-1], dtype=DTYPE)
    for s in range(0, n, _CHUNK):
        w = min(_CHUNK, n - s)
        chunk = v[..., s:s + w]
        if xp is np:
            # eager fast path: C-speed flag packing/unpacking via
            # packbits/unpackbits instead of the mul-sum / shift-gather
            # (this function is the #2 cost of the build-time eager pass)
            gb = np.packbits(chunk >= LIMB_BASE, axis=-1, bitorder="little")
            pb = np.packbits(chunk == LIMB_MASK, axis=-1, bitorder="little")
            if gb.shape[-1] == 1:
                A = pb[..., 0].astype(DTYPE)
                B = gb[..., 0].astype(DTYPE)
            else:
                A = pb[..., 0].astype(DTYPE) | (pb[..., 1].astype(DTYPE) << 8)
                B = gb[..., 0].astype(DTYPE) | (gb[..., 1].astype(DTYPE) << 8)
            B = (B << 1) | c_in
            S = A + B
            c = B | (S ^ A ^ B)                          # carry into limb k
            cb16 = (c & LIMB_MASK).astype("<u2")
            cbits = np.unpackbits(
                cb16.view(np.uint8).reshape(cb16.shape + (2,)),
                axis=-1, bitorder="little", count=w)
            out.append(((chunk & LIMB_MASK) + cbits) & LIMB_MASK)
            c_in = (c >> w) & 1
            continue
        g = (chunk >> LIMB_BITS).astype(DTYPE)          # 0/1 per limb
        p = (chunk == LIMB_MASK).astype(DTYPE)
        pw = xp.asarray(_PW[w])
        A = (p * pw).sum(axis=-1, dtype=DTYPE)
        B = ((g * pw).sum(axis=-1, dtype=DTYPE) << 1) | c_in
        S = A + B
        c = B | (S ^ A ^ B)                              # carry into limb k
        kidx = xp.asarray(_KIDX[w])
        cbits = ((c[..., None] >> kidx) & 1).astype(DTYPE)
        out.append(((chunk & LIMB_MASK) + cbits) & LIMB_MASK)
        c_in = (c >> w) & 1
    res = out[0] if len(out) == 1 else xp.concatenate(out, axis=-1)
    return res, c_in


def carry_propagate(xp, cols, out_n: int, max_entry_bits: int = 32):
    """Normalize accumulated columns into canonical 16-bit limbs.

    ``cols``: [..., m] uint32, each entry < 2^32 with enough headroom that
    carries (< 2^16) never overflow when added.  Returns [..., out_n]
    canonical limbs.  The caller guarantees the true value fits in out_n
    limbs (any residual carry out of the top limb is dropped).

    ``max_entry_bits``: static bound on entry magnitudes; callers whose
    columns are already <= 2^17 (e.g. plain two-operand adds) skip one
    ripple pass.
    """
    m = cols.shape[-1]
    if m > out_n:
        cols = cols[..., :out_n]
    elif m < out_n:
        cols = pad_limbs(xp, cols, out_n)
    x = cols
    # ripple passes bound entries: <2^32 -> <2^17 -> <=2^16
    if max_entry_bits > 17:
        x = (x & LIMB_MASK) + _shift_up(xp, x >> LIMB_BITS)
    if max_entry_bits > 16:
        x = (x & LIMB_MASK) + _shift_up(xp, x >> LIMB_BITS)
    res, _ = _resolve_carries(xp, x)
    return res


# ---------------------------------------------------------------------------
# Addition / subtraction / comparison
# ---------------------------------------------------------------------------

def add(xp, a, b, out_n: int):
    """(a + b) as an out_n-limb value; caller guarantees it fits."""
    n = max(a.shape[-1], b.shape[-1])
    a = pad_limbs(xp, a, n)
    b = pad_limbs(xp, b, n)
    return carry_propagate(xp, a + b, out_n, max_entry_bits=17)


def sub(xp, a, b) -> Tuple[Any, Any]:
    """(a - b) mod 2^(16n) plus a borrow flag (1 where a < b).

    Two's-complement form: a + (~b) + 1 over n limbs, with the packed
    carry-lookahead resolving the chain; the missing carry out of the top
    limb is the borrow."""
    n = max(a.shape[-1], b.shape[-1])
    a = pad_limbs(xp, a, n)
    b = pad_limbs(xp, b, n)
    x = a + (LIMB_MASK - b)                    # entries <= 2^17-2
    one = np.zeros((n + 1,), dtype=DTYPE)
    one[0] = 1
    x = pad_limbs(xp, x, n + 1) + xp.asarray(one)  # +1 at limb 0 (<= 2^17-1)
    x = (x & LIMB_MASK) + _shift_up(xp, x >> LIMB_BITS)
    d, _ = _resolve_carries(xp, x)
    carry_out = d[..., n]                      # the 2^(16n) bit of a+~b+1
    return d[..., :n], (1 - carry_out).astype(DTYPE)


def lt(xp, a, b):
    """Boolean a < b (unsigned), elementwise over the batch."""
    _, borrow = sub(xp, a, b)
    return borrow.astype(bool)


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
    ncols = min(na + nb, out_n)
    batch = xp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    if xp is np:
        # eager fast path: one (batch, nb) product row per limb of a,
        # accumulated with in-place slice adds.  Avoids materializing the
        # 3-D prod/lo/hi tensors entirely (batch x na x nb u32 each — 74 MB
        # per temp at 64k lanes), which made the build-time eager pass
        # memory-bandwidth bound; measured 2.9x faster at 64k lanes.
        a_bc = np.broadcast_to(a, batch + (na,))
        b_bc = np.broadcast_to(b, batch + (nb,))
        cols = np.zeros(batch + (ncols,), dtype=DTYPE)
        for i in range(na):
            p = a_bc[..., i, None] * b_bc
            lo_n = min(nb, ncols - i)
            if lo_n > 0:
                cols[..., i:i + lo_n] += p[..., :lo_n] & LIMB_MASK
            hi_n = min(nb, ncols - i - 1)
            if hi_n > 0:
                cols[..., i + 1:i + 1 + hi_n] += p[..., :hi_n] >> LIMB_BITS
        return carry_propagate(xp, cols, out_n)
    # prod[..., i, j] = a_i * b_j  (exact in u32); XLA fuses these, so the
    # 3-D intermediate never materializes on the jit path
    prod = a[..., :, None] * b[..., None, :]
    lo = prod & LIMB_MASK
    hi = prod >> LIMB_BITS
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
