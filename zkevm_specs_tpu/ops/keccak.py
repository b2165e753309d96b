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

def keccak_f_lanes(xp, lanes_lo, lanes_hi):
    """Batched keccak-f[1600].

    lanes_lo/hi: [..., 25] uint32 arrays (little-endian 64-bit lanes split
    into 32-bit halves).  Returns permuted (lo, hi).  All bitwise ops map
    directly onto the TPU VPU's u32 units.
    """
    def rotl(lo, hi, n):
        n %= 64
        if n == 0:
            return lo, hi
        if n == 32:
            return hi, lo
        if n < 32:
            nlo = ((lo << n) | (hi >> (32 - n)))
            nhi = ((hi << n) | (lo >> (32 - n)))
        else:
            m = n - 32
            nlo = ((hi << m) | (lo >> (32 - m)))
            nhi = ((lo << m) | (hi >> (32 - m)))
        return nlo.astype(lo.dtype), nhi.astype(hi.dtype)

    A_lo = [[lanes_lo[..., x + 5 * y] for y in range(5)] for x in range(5)]
    A_hi = [[lanes_hi[..., x + 5 * y] for y in range(5)] for x in range(5)]
    for rc in _RC:
        c_lo = [A_lo[x][0] ^ A_lo[x][1] ^ A_lo[x][2] ^ A_lo[x][3] ^ A_lo[x][4] for x in range(5)]
        c_hi = [A_hi[x][0] ^ A_hi[x][1] ^ A_hi[x][2] ^ A_hi[x][3] ^ A_hi[x][4] for x in range(5)]
        for x in range(5):
            r_lo, r_hi = rotl(c_lo[(x + 1) % 5], c_hi[(x + 1) % 5], 1)
            d_lo = c_lo[(x - 1) % 5] ^ r_lo
            d_hi = c_hi[(x - 1) % 5] ^ r_hi
            for y in range(5):
                A_lo[x][y] = A_lo[x][y] ^ d_lo
                A_hi[x][y] = A_hi[x][y] ^ d_hi
        B_lo = [[None] * 5 for _ in range(5)]
        B_hi = [[None] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                r_lo, r_hi = rotl(A_lo[x][y], A_hi[x][y], _ROT[x][y])
                B_lo[y][(2 * x + 3 * y) % 5] = r_lo
                B_hi[y][(2 * x + 3 * y) % 5] = r_hi
        for x in range(5):
            for y in range(5):
                A_lo[x][y] = B_lo[x][y] ^ (~B_lo[(x + 1) % 5][y] & B_lo[(x + 2) % 5][y])
                A_hi[x][y] = B_hi[x][y] ^ (~B_hi[(x + 1) % 5][y] & B_hi[(x + 2) % 5][y])
        A_lo[0][0] = A_lo[0][0] ^ np.uint32(rc & 0xFFFFFFFF)
        A_hi[0][0] = A_hi[0][0] ^ np.uint32(rc >> 32)
    out_lo = xp.stack([A_lo[x][y] for y in range(5) for x in range(5)], axis=-1)
    out_hi = xp.stack([A_hi[x][y] for y in range(5) for x in range(5)], axis=-1)
    return out_lo, out_hi


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
