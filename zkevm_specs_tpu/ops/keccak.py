"""Keccak-256 — host implementation plus a vectorized keccak-f[1600] kernel.

The reference uses pycryptodome's keccak (reference:
src/zkevm_specs/util/hash.py:7-15); that dependency is not available here,
so the permutation is implemented from the Keccak specification.  The
``keccak_f_lanes`` form operates on batched u32 lane-pair tensors and runs
under numpy or jax.numpy — it is the compute core of the keccak circuit and
of witness-side hashing.
"""
from __future__ import annotations

from typing import List

import numpy as np

# rotation offsets r[x][y] and round constants per Keccak spec
_ROT = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]
_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

_MASK64 = (1 << 64) - 1


def _rotl(x: int, n: int) -> int:
    n %= 64
    return ((x << n) | (x >> (64 - n))) & _MASK64


def keccak_f(state: List[int]) -> List[int]:
    """One Keccak-f[1600] permutation over 25 u64 lanes (host ints)."""
    a = [[state[x + 5 * y] for y in range(5)] for x in range(5)]
    for rc in _RC:
        # theta
        c = [a[x][0] ^ a[x][1] ^ a[x][2] ^ a[x][3] ^ a[x][4] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rotl(c[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                a[x][y] ^= d[x]
        # rho + pi
        b = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                b[y][(2 * x + 3 * y) % 5] = _rotl(a[x][y], _ROT[x][y])
        # chi
        for x in range(5):
            for y in range(5):
                a[x][y] = b[x][y] ^ ((~b[(x + 1) % 5][y]) & b[(x + 2) % 5][y])
        # iota
        a[0][0] ^= rc
    return [a[x][y] for y in range(5) for x in range(5)]


def keccak256(data: bytes) -> bytes:
    """Keccak-256 (the Ethereum hash; pad 0x01, NOT sha3's 0x06).

    Dispatches to the native C implementation when available (witness
    generation hashes on every bytecode/tx; see runtime/native.py)."""
    from ..runtime.native import keccak256_native

    native = keccak256_native(data)
    if native is not None:
        return native
    return _keccak256_py(data)


def _keccak256_py(data: bytes) -> bytes:
    rate = 136  # bytes, for capacity 512
    # pad10*1 with domain byte 0x01
    padded = bytearray(data)
    pad_len = rate - (len(padded) % rate)
    padded += b"\x01" + b"\x00" * (pad_len - 2) + b"\x80" if pad_len >= 2 else b"\x81"
    state = [0] * 25
    for block_start in range(0, len(padded), rate):
        block = padded[block_start:block_start + rate]
        for i in range(rate // 8):
            state[i] ^= int.from_bytes(block[8 * i:8 * i + 8], "little")
        state = keccak_f(state)
    out = b"".join(state[i].to_bytes(8, "little") for i in range(4))
    return out


EMPTY_HASH = int.from_bytes(keccak256(b""), "big")
EMPTY_CODE_HASH = EMPTY_HASH
EMPTY_TRIE_HASH = int.from_bytes(
    keccak256(bytes.fromhex("80")), "big"
)


# ---------------------------------------------------------------------------
# Vectorized keccak-f over batched lanes (u32 hi/lo pairs), numpy/jnp
# ---------------------------------------------------------------------------

# rho+pi as one static lane permutation + per-lane rotation: lane s = x+5y
# rotates by _ROT[x][y] and lands at d = y + 5*((2x+3y) % 5)
_PI_SRC = np.zeros(25, dtype=np.int32)   # _PI_SRC[d] = s
_ROT_PER_DST = np.zeros(25, dtype=np.int32)
for _x in range(5):
    for _y in range(5):
        _d = _y + 5 * ((2 * _x + 3 * _y) % 5)
        _PI_SRC[_d] = _x + 5 * _y
        _ROT_PER_DST[_d] = _ROT[_x][_y] % 64
_RC_LO = np.array([rc & 0xFFFFFFFF for rc in _RC], dtype=np.uint32)
_RC_HI = np.array([rc >> 32 for rc in _RC], dtype=np.uint32)


def _rotl64_pairs(xp, lo, hi, n):
    """Rotate-left 64-bit lanes stored as u32 (lo, hi) pairs by per-lane
    static amounts ``n`` (int array broadcastable to the lane axis)."""
    n = np.asarray(n)
    swap = (n % 64) >= 32
    m = (n % 32).astype(np.uint32)
    # rotate each 32-bit pair by m (shift-by-32 avoided via the m==0 select)
    m_ = xp.asarray(m)
    inv = xp.asarray(((32 - m) % 32).astype(np.uint32))
    lo1 = xp.where(m_ == 0, lo, (lo << m_) | (hi >> inv))
    hi1 = xp.where(m_ == 0, hi, (hi << m_) | (lo >> inv))
    swap_x = xp.asarray(swap)
    return (xp.where(swap_x, hi1, lo1).astype(lo.dtype),
            xp.where(swap_x, lo1, hi1).astype(hi.dtype))


def keccak_round(xp, lo, hi, rc_lo, rc_hi):
    """One keccak-f round over stacked [..., 25] u32 lane halves.

    Written as a single ~25-op tensor function so the 24 rounds can run
    under ``lax.scan`` with an O(1)-size compiled graph (the round-unrolled
    form made XLA:CPU compiles take minutes)."""
    shape = lo.shape[:-1]
    a_lo = lo.reshape(shape + (5, 5))   # [..., y, x]
    a_hi = hi.reshape(shape + (5, 5))
    # theta
    c_lo = a_lo[..., 0, :] ^ a_lo[..., 1, :] ^ a_lo[..., 2, :] ^ a_lo[..., 3, :] ^ a_lo[..., 4, :]
    c_hi = a_hi[..., 0, :] ^ a_hi[..., 1, :] ^ a_hi[..., 2, :] ^ a_hi[..., 3, :] ^ a_hi[..., 4, :]
    r_lo, r_hi = _rotl64_pairs(xp, xp.roll(c_lo, -1, axis=-1),
                               xp.roll(c_hi, -1, axis=-1), np.ones(5, np.int32))
    d_lo = xp.roll(c_lo, 1, axis=-1) ^ r_lo
    d_hi = xp.roll(c_hi, 1, axis=-1) ^ r_hi
    lo = (a_lo ^ d_lo[..., None, :]).reshape(shape + (25,))
    hi = (a_hi ^ d_hi[..., None, :]).reshape(shape + (25,))
    # rho + pi (static gather + per-lane rotation)
    src = xp.asarray(_PI_SRC)
    b_lo, b_hi = _rotl64_pairs(xp, lo[..., src], hi[..., src], _ROT_PER_DST)
    # chi: A[x][y] = B[x][y] ^ (~B[x+1][y] & B[x+2][y]) — roll along x
    b_lo = b_lo.reshape(shape + (5, 5))
    b_hi = b_hi.reshape(shape + (5, 5))
    lo = b_lo ^ (~xp.roll(b_lo, -1, axis=-1) & xp.roll(b_lo, -2, axis=-1))
    hi = b_hi ^ (~xp.roll(b_hi, -1, axis=-1) & xp.roll(b_hi, -2, axis=-1))
    lo = lo.reshape(shape + (25,))
    hi = hi.reshape(shape + (25,))
    # iota
    iota = xp.zeros((25,), dtype=lo.dtype)
    lo = lo ^ xp.where(xp.arange(25) == 0, rc_lo, iota)
    hi = hi ^ xp.where(xp.arange(25) == 0, rc_hi, iota)
    return lo, hi


def keccak_f_lanes(xp, lanes_lo, lanes_hi):
    """Batched keccak-f[1600].

    lanes_lo/hi: [..., 25] uint32 arrays (little-endian 64-bit lanes split
    into 32-bit halves).  Returns permuted (lo, hi).  All bitwise ops map
    directly onto the TPU VPU's u32 units.  Under jax the 24 rounds run as
    one ``lax.scan`` body; under numpy as a host loop.
    """
    if xp is np:
        lo, hi = lanes_lo, lanes_hi
        for r in range(24):
            lo, hi = keccak_round(np, lo, hi, _RC_LO[r], _RC_HI[r])
        return lo, hi
    import jax

    def body(state, rcs):
        lo, hi = keccak_round(xp, state[0], state[1], rcs[0], rcs[1])
        return (lo, hi), None

    (lo, hi), _ = jax.lax.scan(
        body, (lanes_lo, lanes_hi), (xp.asarray(_RC_LO), xp.asarray(_RC_HI)))
    return lo, hi


def keccak256_batch_fixed_blocks(xp, blocks_u32):
    """Hash a batch of inputs that each occupy a whole number of rate blocks.

    blocks_u32: [B, n_blocks, 34] uint32 — each block is 136 bytes as 34
    little-endian u32 words (caller pads per the keccak pad10*1 rule).
    Returns [B, 8] uint32 — the 256-bit digests as u32 words.
    """
    B, n_blocks, _ = blocks_u32.shape
    lo = xp.zeros((B, 25), dtype=xp.uint32)
    hi = xp.zeros((B, 25), dtype=xp.uint32)
    for blk in range(n_blocks):
        block = blocks_u32[:, blk, :]
        xor_lo = []
        xor_hi = []
        for lane in range(17):
            xor_lo.append(block[:, 2 * lane])
            xor_hi.append(block[:, 2 * lane + 1])
        for lane in range(17, 25):
            xor_lo.append(xp.zeros((B,), dtype=xp.uint32))
            xor_hi.append(xp.zeros((B,), dtype=xp.uint32))
        lo = lo ^ xp.stack(xor_lo, axis=-1)
        hi = hi ^ xp.stack(xor_hi, axis=-1)
        lo, hi = keccak_f_lanes(xp, lo, hi)
    out = []
    for lane in range(4):
        out.append(lo[:, lane])
        out.append(hi[:, lane])
    return xp.stack(out, axis=-1)
