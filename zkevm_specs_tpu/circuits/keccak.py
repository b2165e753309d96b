"""Keccak circuit — a real keccak-f[1600] constraint kernel.

The reference only models the keccak table abstraction and recomputes
hashes with pycryptodome (SURVEY.md §2.3: "the new build needs a real
keccak-f permutation constraint kernel" — reference util/tables.py:10-33);
this module provides it: given the witnessed preimages, the circuit

  1. recomputes the running byte-RLC (a Horner scan — `lax.scan` under jit
     so the compiled graph is O(1) in the preimage length) and constrains
     it against the table's ``input_rlc`` commitment,
  2. absorbs the padded blocks with the *batched* keccak-f lane kernel
     (u32 ops on the TPU VPU, ops/keccak.py) and constrains the digest
     against the table's ``output`` word,

for every enabled keccak-table row at once.  The same constraint body runs
eagerly (spec mode) and compiled (production, via runtime/kernels).
"""
from __future__ import annotations

from typing import List

import numpy as np

from ..dsl.cs import ConstraintSystem
from ..utils.typing import is_circuit_code
from ..dsl.value import Ctx, F, Word
from ..ops import fr
from ..ops import limbs as L
from ..ops.keccak import keccak_f_lanes

RATE = 136


def _pad(data: bytes) -> bytes:
    padded = bytearray(data)
    pad_len = RATE - (len(padded) % RATE)
    if pad_len == 1:
        padded += b"\x81"
    else:
        padded += b"\x01" + b"\x00" * (pad_len - 2) + b"\x80"
    return bytes(padded)


def _horner_rlc(ctx: Ctx, byte_cols, active_cols, r: int):
    """acc = acc * r + byte over [T, n] byte columns, masked by active.

    Returns the final [n, 16]-limb Fr accumulator.  Eager mode loops on the
    host; jit mode uses lax.scan so the compiled graph has one body."""
    xp = ctx.xp
    n = byte_cols.shape[1]
    r = r % fr.P
    r_width = max((r.bit_length() + 15) // 16, 1)
    out_n = 16 + r_width + 1  # acc (<2^256) * r fits 16 + r_width limbs
    r_limbs = xp.asarray(L.int_to_limbs(r, r_width)[None, :])

    def step(acc, inputs):
        byte_col, active = inputs
        prod = L.mul(xp, acc, r_limbs, out_n=out_n)
        byte_limbs = L.pad_limbs(xp, byte_col[:, None].astype(np.uint32), out_n)
        nxt = fr.reduce_wide(xp, L.add(xp, prod, byte_limbs, out_n + 1))
        return xp.where(active[:, None], nxt, acc)

    acc = xp.zeros((n, 16), dtype=xp.uint32)
    if ctx.eager:
        for j in range(byte_cols.shape[0]):
            acc = step(acc, (byte_cols[j], active_cols[j]))
        return acc
    import jax

    def body(acc, inputs):
        return step(acc, inputs), None

    acc, _ = jax.lax.scan(body, acc, (byte_cols, active_cols))
    return acc


def _bswap16(xp, v):
    """Byte-swap the low 16 bits of a u32 array."""
    return ((v & 0xFF) << 8) | ((v >> 8) & 0xFF)


def _digest_to_word(ctx: Ctx, digest) -> Word:
    """[n, 8] little-endian u32 digest words -> the big-endian 256-bit output
    Word (lo/hi 128-bit halves as 16-bit limb F's)."""
    xp = ctx.xp
    # the output int is the big-endian reading of the 32 digest bytes; its
    # little-endian 16-bit limbs come from the words in reverse order, each
    # contributing (bswap16(hi half), bswap16(lo half))
    def limbs_of(words):  # words: list of [n] u32, most-significant first
        out = []
        for w in reversed(words):
            out.append(_bswap16(xp, (w >> 16) & 0xFFFF))
            out.append(_bswap16(xp, w & 0xFFFF))
        return xp.stack(out, axis=-1).astype(xp.uint32)

    lo = F(ctx, limbs_of([digest[:, k] for k in range(4, 8)]), 128)
    hi = F(ctx, limbs_of([digest[:, k] for k in range(0, 4)]), 128)
    return Word(lo, hi)


def build_keccak_inputs(preimages: List[bytes], enabled_rows: List[dict]):
    """Columns (table commitments) + extra arrays (byte/block matrices) for
    the constraint body."""
    n = len(preimages)
    ctx = Ctx(np, n, "eager")
    cols = {
        "input_rlc": F.from_ints(ctx, [r["input_rlc"] for r in enabled_rows]),
        "input_len": F.from_ints(ctx, [r["input_len"] for r in enabled_rows], 64),
        "output": Word.from_ints(ctx, [r["output"] for r in enabled_rows]),
    }
    padded = [_pad(d) for d in preimages]
    max_blocks = max(len(p) // RATE for p in padded)
    blocks = np.zeros((n, max_blocks, RATE // 4), dtype=np.uint32)
    for i, p in enumerate(padded):
        arr = np.frombuffer(p, dtype="<u4").reshape(-1, RATE // 4)
        blocks[i, : arr.shape[0]] = arr
    len_arr = np.array([len(d) for d in preimages], dtype=np.int32)
    max_len = max(int(len_arr.max()), 1) if n else 1
    byte_cols = np.zeros((max_len, n), dtype=np.uint8)
    for i, d in enumerate(preimages):
        byte_cols[: len(d), i] = np.frombuffer(d, dtype=np.uint8)
    active_cols = np.arange(max_len, dtype=np.int32)[:, None] < len_arr[None, :]
    n_blocks = np.array([len(p) // RATE for p in padded], dtype=np.int32)
    extra = {
        "blocks": blocks,
        "n_blocks": n_blocks,
        "len_arr": len_arr,
        "byte_cols": byte_cols,
        "active_cols": active_cols,
    }
    return ctx, cols, extra


@is_circuit_code
def check_keccak(ctx: Ctx, cs: ConstraintSystem, cols, tables, static, extra):
    """The keccak-circuit constraint body — eager (spec) and jit alike."""
    xp = ctx.xp
    n = ctx.batch
    blocks = xp.asarray(extra["blocks"])
    n_blocks = xp.asarray(extra["n_blocks"])
    max_blocks = blocks.shape[1]

    # 1. byte-RLC recomputation over the raw preimages
    acc = _horner_rlc(ctx, xp.asarray(extra["byte_cols"]),
                      xp.asarray(extra["active_cols"]), static["r"])
    cs.check(F(ctx, acc, 254).eq_mask(cols["input_rlc"]),
             lambda: "keccak input_rlc mismatch")
    # canonical 16-bit limb split: a >=64KiB preimage (large contract
    # bytecode) overflows a single limb
    len_arr = xp.asarray(extra["len_arr"]).astype(xp.uint32)
    len_limbs = xp.stack([len_arr & 0xFFFF, (len_arr >> 16) & 0xFFFF],
                         axis=-1)
    cs.check(
        cols["input_len"].eq_mask(F(ctx, len_limbs, 32)),
        lambda: "keccak input_len mismatch",
    )

    # 2. sponge: absorb blocks with the batched keccak-f lane kernel, take
    # the digest at each row's block count
    lo = xp.zeros((n, 25), dtype=xp.uint32)
    hi = xp.zeros((n, 25), dtype=xp.uint32)
    digest = xp.zeros((n, 8), dtype=xp.uint32)
    zeros = xp.zeros((n,), dtype=xp.uint32)
    for blk in range(max_blocks):
        block = blocks[:, blk, :]
        xor_lo = [block[:, 2 * l] for l in range(17)] + [zeros] * 8
        xor_hi = [block[:, 2 * l + 1] for l in range(17)] + [zeros] * 8
        active = (blk < n_blocks)[:, None]
        new_lo = lo ^ xp.where(active, xp.stack(xor_lo, axis=-1), 0)
        new_hi = hi ^ xp.where(active, xp.stack(xor_hi, axis=-1), 0)
        p_lo, p_hi = keccak_f_lanes(xp, new_lo, new_hi)
        lo = xp.where(active, p_lo, lo)
        hi = xp.where(active, p_hi, hi)
        done = (blk == n_blocks - 1)[:, None]
        out = []
        for lane in range(4):
            out.append(lo[:, lane])
            out.append(hi[:, lane])
        digest = xp.where(done, xp.stack(out, axis=-1), digest)

    computed = _digest_to_word(ctx, digest)
    cs.check(cols["output"].eq_mask(computed), lambda: "keccak output mismatch")


def verify_keccak_circuit(preimages: List[bytes], keccak_rows: List[dict],
                          keccak_randomness: int, success: bool = True, xp=np):
    """Spec-mode (eager) driver with reference verdict semantics.

    ``keccak_rows``: the shared keccak table rows ({state_tag, input_rlc,
    input_len, output}); enabled rows (state_tag == 2) must match the
    preimages positionally.
    """
    from ..runtime.kernels import run_spec

    enabled = [r for r in keccak_rows if r["state_tag"] == 2]
    assert len(enabled) == len(preimages), "one preimage per enabled keccak row"
    if not enabled:
        return
    ctx, cols, extra = build_keccak_inputs(preimages, enabled)
    if xp is not np:
        ctx = Ctx(xp, ctx.batch, "eager")
        cols = {k: (v.to_backend(ctx) if isinstance(v, (F, Word)) else v)
                for k, v in cols.items()}
    run_spec("keccak", check_keccak, cols, None, {"r": keccak_randomness},
             extra, success=success)


def keccak_kernel(preimages: List[bytes], keccak_rows: List[dict],
                  keccak_randomness: int):
    """Production path: the same constraint body compiled to one XLA kernel."""
    from ..runtime.kernels import CircuitKernel

    enabled = [r for r in keccak_rows if r["state_tag"] == 2]
    assert len(enabled) == len(preimages), "one preimage per enabled keccak row"
    if not enabled:
        return None
    _, cols, extra = build_keccak_inputs(preimages, enabled)
    return CircuitKernel("keccak", check_keccak, cols, None,
                         {"r": keccak_randomness}, extra)
