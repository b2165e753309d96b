"""Keccak circuit — a real keccak-f[1600] constraint kernel.

The reference only models the keccak table abstraction and recomputes
hashes with pycryptodome (SURVEY.md §2.3: "the new build needs a real
keccak-f permutation constraint kernel" — reference util/tables.py:10-33);
this module provides it: given the witnessed preimages, the circuit

  1. recomputes the running byte-RLC and constrains it against the table's
     ``input_rlc`` commitment,
  2. absorbs the padded blocks with the *batched* keccak-f lane kernel
     (u32 ops on the TPU VPU, ops/keccak.py) and constrains the digest
     against the table's ``output`` word,

for every enabled keccak-table row at once.
"""
from __future__ import annotations

from typing import List

import numpy as np

from ..dsl.cs import ConstraintSystem
from ..dsl.value import Ctx, F, Word
from ..ops.keccak import keccak256_batch_fixed_blocks
from ..ops.fr import P

RATE = 136


def _pad(data: bytes) -> bytes:
    padded = bytearray(data)
    pad_len = RATE - (len(padded) % RATE)
    if pad_len == 1:
        padded += b"\x81"
    else:
        padded += b"\x01" + b"\x00" * (pad_len - 2) + b"\x80"
    return bytes(padded)


def verify_keccak_circuit(preimages: List[bytes], keccak_rows: List[dict],
                          keccak_randomness: int, success: bool = True, xp=np):
    """Verify every enabled keccak-table row against its witnessed preimage.

    ``keccak_rows``: the shared keccak table rows ({state_tag, input_rlc,
    input_len, output}); enabled rows (state_tag == 2) must match the
    preimages positionally.
    """
    enabled = [r for r in keccak_rows if r["state_tag"] == 2]
    assert len(enabled) == len(preimages), "one preimage per enabled keccak row"
    if not enabled:
        return

    n = len(preimages)
    ctx = Ctx(xp, n, "eager")
    cs = ConstraintSystem(ctx)

    padded = [_pad(d) for d in preimages]
    max_blocks = max(len(p) // RATE for p in padded)

    # [n, max_blocks, 34] u32 block words (zero blocks beyond each length)
    blocks = np.zeros((n, max_blocks, RATE // 4), dtype=np.uint32)
    for i, p in enumerate(padded):
        arr = np.frombuffer(p, dtype="<u4").reshape(-1, RATE // 4)
        blocks[i, : arr.shape[0]] = arr
    blocks_x = xp.asarray(blocks)

    # 1. byte-RLC recomputation: acc = acc * r + byte over the raw preimage
    max_len = max((len(d) for d in preimages), default=0)
    byte_mat = np.zeros((n, max(max_len, 1)), dtype=np.uint32)
    len_arr = np.array([len(d) for d in preimages])
    for i, d in enumerate(preimages):
        byte_mat[i, : len(d)] = np.frombuffer(d, dtype=np.uint8)
    r_f = F.const(ctx, keccak_randomness)
    acc = F.const(ctx, 0)
    byte_mat_x = xp.asarray(byte_mat)
    for j in range(max_len):
        byte_f = F(ctx, byte_mat_x[:, j][..., None].astype(np.uint32), 8)
        active = xp.asarray(j < len_arr)
        nxt = acc * r_f + byte_f
        acc = nxt.select(active, acc)
    input_rlc = F.from_ints(ctx, [r["input_rlc"] for r in enabled])
    cs.check(acc.eq_mask(input_rlc), lambda: "keccak input_rlc mismatch")

    input_len = F.from_ints(ctx, [r["input_len"] for r in enabled], 64)
    cs.check(
        input_len.eq_mask(F.from_ints(ctx, [int(v) for v in len_arr], 64)),
        lambda: "keccak input_len mismatch",
    )

    # 2. absorb with the batched lane kernel; select the digest at each
    # row's block count
    n_blocks = np.array([len(p) // RATE for p in padded])
    from ..ops.keccak import keccak_f_lanes

    lo = xp.zeros((n, 25), dtype=xp.uint32)
    hi = xp.zeros((n, 25), dtype=xp.uint32)
    digest = xp.zeros((n, 8), dtype=xp.uint32)
    for blk in range(max_blocks):
        block = blocks_x[:, blk, :]
        xor_lo = [block[:, 2 * l] for l in range(17)] + [xp.zeros((n,), dtype=xp.uint32)] * 8
        xor_hi = [block[:, 2 * l + 1] for l in range(17)] + [xp.zeros((n,), dtype=xp.uint32)] * 8
        # only absorb while within this row's block count
        active = xp.asarray(blk < n_blocks)[:, None]
        new_lo = lo ^ xp.where(active, xp.stack(xor_lo, axis=-1), 0)
        new_hi = hi ^ xp.where(active, xp.stack(xor_hi, axis=-1), 0)
        p_lo, p_hi = keccak_f_lanes(xp, new_lo, new_hi)
        lo = xp.where(active, p_lo, lo)
        hi = xp.where(active, p_hi, hi)
        done = xp.asarray(blk == n_blocks - 1)[:, None]
        out = []
        for lane in range(4):
            out.append(lo[:, lane])
            out.append(hi[:, lane])
        digest = xp.where(done, xp.stack(out, axis=-1), digest)

    # digest words (little-endian u32) -> 256-bit big-endian output word
    digest_np = np.asarray(digest)
    digests = [
        int.from_bytes(b"".join(int(v).to_bytes(4, "little") for v in digest_np[i]), "big")
        for i in range(n)
    ]
    output = Word.from_ints(ctx, [r["output"] for r in enabled])
    computed = Word.from_ints(ctx, digests)
    cs.check(output.eq_mask(computed), lambda: "keccak output mismatch")

    fail = np.asarray(cs.fail)
    if success:
        if fail.any():
            i = int(np.argmax(fail))
            raise AssertionError(f"keccak row {i}: {cs.first_failure_message()[i]}")
    else:
        assert fail.any(), "expected keccak circuit to fail"
