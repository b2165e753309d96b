"""Pallas TPU kernel for batched BN254-Fr modular multiplication.

The XLA path (ops/fr.py) expresses the schoolbook product + Barrett
reduction as a long chain of elementwise ops over ``[B, 16]`` limb arrays;
XLA fuses much of it, but intermediates (the 16x16 partial-product cube, the
34-limb Barrett products) can spill to HBM between fusions.  This kernel
keeps the entire mul->reduce pipeline resident in VMEM, in a *limb-major*
layout: a tile is ``[16 limbs (sublanes), TILE_B lanes]`` so the batch
occupies the 128-wide lane dimension at full utilization and each limb row
is one VPU vector.  Partial products become 256 u32 vector multiplies whose
columns are accumulated in registers/VMEM, never materializing the cube.

Semantics match ops/fr.mul exactly (canonical inputs < p, canonical output),
which in turn replaces the reference's py_ecc scalar FQ.__mul__
(reference: src/zkevm_specs/util/arithmetic.py:41-63).
"""
from __future__ import annotations

import functools

import numpy as np

from . import fr
from . import limbs as L

LIMB_BITS = L.LIMB_BITS
MASK = np.uint32(L.LIMB_MASK)
NL = fr.NL  # 16

# static per-limb Python-int constants (become immediates in the kernel)
_MU17 = [int(v) for v in fr.MU_LIMBS]
_P17 = [int(v) for v in fr.P_LIMBS_17]


def _mul_limbs(jnp, a, b, out_n):
    """Schoolbook product of two limb lists (each entry a [T] u32 vector),
    columns accumulated then carry-propagated.  b entries may be Python-int
    constants."""
    na, nb = len(a), len(b)
    ncols = min(na + nb, out_n)
    cols = [None] * ncols

    def acc(k, v):
        cols[k] = v if cols[k] is None else cols[k] + v

    for i in range(na):
        for j in range(nb):
            if i + j >= ncols:
                continue
            bj = b[j]
            if isinstance(bj, int):
                if bj == 0:
                    continue
                p = a[i] * np.uint32(bj)
            else:
                p = a[i] * bj
            acc(i + j, p & MASK)
            if i + j + 1 < ncols:
                acc(i + j + 1, p >> LIMB_BITS)
    # carry propagate
    out = []
    carry = None
    zero = jnp.zeros_like(a[0])
    for k in range(out_n):
        v = cols[k] if k < ncols and cols[k] is not None else zero
        if carry is not None:
            v = v + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    return out


def _sub_limbs(jnp, a, b):
    """a - b over limb lists; returns (diff limbs, borrow vector)."""
    n = len(a)
    out = []
    borrow = jnp.zeros_like(a[0])
    base = np.uint32(1 << LIMB_BITS)
    for k in range(n):
        bk = b[k] if k < len(b) else 0
        if isinstance(bk, int):
            v = base + a[k] - np.uint32(bk) - borrow
        else:
            v = base + a[k] - bk - borrow
        out.append(v & MASK)
        borrow = 1 - (v >> LIMB_BITS)
    return out, borrow


def _fr_mul_block(jnp, a, b):
    """Full modular mul on limb-major blocks a,b: [16, T] -> [16, T]."""
    al = [a[i] for i in range(NL)]
    bl = [b[i] for i in range(NL)]
    x = _mul_limbs(jnp, al, bl, 32)             # a*b, 512-bit
    q1 = x[15:32]                                # >> 240, 17 limbs
    q2 = _mul_limbs(jnp, q1, _MU17, 34)          # q1 * mu
    q3 = q2[17:34]                               # >> 272, 17 limbs
    r1 = x[:17]
    r2 = _mul_limbs(jnp, q3, _P17, 17)           # q3*p mod 2^272
    r, _ = _sub_limbs(jnp, r1, r2)
    for _i in range(2):                          # r < 3p: subtract p <= twice
        d, bor = _sub_limbs(jnp, r, _P17)
        ok = bor == 0
        r = [jnp.where(ok, dd, rr) for dd, rr in zip(d, r)]
    return jnp.stack(r[:NL], axis=0)


def _mul_kernel(a_ref, b_ref, o_ref):
    import jax.numpy as jnp

    o_ref[:] = _fr_mul_block(jnp, a_ref[:], b_ref[:])


@functools.lru_cache(maxsize=None)
def _padded_fn():
    import jax

    return jax.jit(_fr_mul_padded_impl, static_argnames=("tile", "interpret"))


def _fr_mul_padded_impl(a_t, b_t, tile: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    try:
        from jax.experimental.pallas import tpu as pltpu
        vmem = pltpu.VMEM
    except Exception:  # pragma: no cover - CPU-only environments
        vmem = None

    n = a_t.shape[1]
    grid = (n // tile,)
    spec = pl.BlockSpec((NL, tile), lambda i: (0, i),
                        **({"memory_space": vmem} if vmem is not None else {}))
    return pl.pallas_call(
        _mul_kernel,
        out_shape=jax.ShapeDtypeStruct((NL, n), jnp.uint32),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(a_t, b_t)


def fr_mul_pallas(a, b, tile: int = 512, interpret: bool = None):
    """(a * b) mod p for canonical ``[B, 16]`` u32 limb arrays via the Pallas
    kernel.  Drop-in equivalent of ``fr.mul(jnp, a, b)`` (modulo layout
    transposes, which XLA fuses into neighbors)."""
    import jax
    import jax.numpy as jnp

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    a = jnp.asarray(a, dtype=jnp.uint32)
    b = jnp.asarray(b, dtype=jnp.uint32)
    assert a.shape == b.shape and a.shape[-1] == NL
    batch_shape = a.shape[:-1]
    B = int(np.prod(batch_shape)) if batch_shape else 1
    a2 = a.reshape(B, NL).T  # [16, B] limb-major
    b2 = b.reshape(B, NL).T
    pad = (-B) % tile
    if pad:
        a2 = jnp.pad(a2, ((0, 0), (0, pad)))
        b2 = jnp.pad(b2, ((0, 0), (0, pad)))
    out = _padded_fn()(a2, b2, tile, interpret)
    return out[:, :B].T.reshape(batch_shape + (NL,))
