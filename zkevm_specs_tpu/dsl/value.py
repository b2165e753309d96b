"""Batched field-element and 256-bit word values for the constraint DSL.

``F`` is the tensorized analog of the reference's ``FQ``
(reference: src/zkevm_specs/util/arithmetic.py:41-63): one *batch* of BN254-Fr
elements stored as ``[B, n_limbs] uint32`` 16-bit limbs, carrying a *static*
magnitude bound (``bits``).  The bound enables narrow fast paths: bytes, gas
counters and u64/u128 limbs — the vast majority of circuit values — never
touch full-width Barrett reduction.  All values are canonical (< p) at all
times, so equality and range checks are plain limb comparisons.

``Word`` mirrors the reference's lo/hi 128-bit split word
(reference: src/zkevm_specs/util/arithmetic.py:99-168).

Everything works identically under numpy (eager spec mode) and jax.numpy
(jit TPU mode) via the ``Ctx.xp`` namespace.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import numpy as np

from ..ops import limbs as L
from ..ops import fr

WIDTHS = (1, 2, 4, 8, 16)


def width_for_bits(bits: int) -> int:
    n = (bits + L.LIMB_BITS - 1) // L.LIMB_BITS
    for w in WIDTHS:
        if n <= w:
            return w
    raise ValueError(f"bound of {bits} bits exceeds field width")


class Ctx:
    """Evaluation context: array namespace + batch size + mode.

    mode "eager": numpy host evaluation; concrete values may be read
    (data-dependent branching, exact failure messages).
    mode "jit": jax tracing; reading values is forbidden, branch decisions
    come from a static signature (see evm/instruction.py).
    """

    def __init__(self, xp, batch: int, mode: str = "eager"):
        self.xp = xp
        self.batch = batch
        self.mode = mode
        self._const_cache = {}

    @property
    def eager(self) -> bool:
        return self.mode == "eager"

    def const_limbs(self, value: int, width: int):
        key = (value, width)
        arr = self._const_cache.get(key)
        if arr is None:
            arr = self.xp.asarray(L.int_to_limbs(value, width)[None, :])
            self._const_cache[key] = arr
        return arr


IntOrF = Union[int, "F"]


class F:
    """A batch of canonical BN254-Fr elements with a static magnitude bound."""

    __slots__ = ("ctx", "limbs", "bits")

    def __init__(self, ctx: Ctx, limbs, bits: int):
        self.ctx = ctx
        self.limbs = limbs  # [B or 1, w] uint32, canonical
        self.bits = min(bits, 254)

    # -- constructors ------------------------------------------------------

    @staticmethod
    def const(ctx: Ctx, value: int) -> "F":
        value = int(value) % fr.P
        bits = max(value.bit_length(), 1)
        return F(ctx, ctx.const_limbs(value, width_for_bits(bits)), bits)

    @staticmethod
    def from_ints(ctx: Ctx, values: Sequence[int], bits: int = 254) -> "F":
        """Build from host ints with a *declared* bound.

        Well-formed witnesses respect the bound (shape-stable for jit);
        malformed ones (negative-test vectors) auto-widen instead of
        crashing, so range constraints can reject them."""
        P = fr.P
        # skip the big-int mod for already-canonical ints (the witness-build
        # hot path: millions of values per block)
        vals = [v if (type(v) is int and 0 <= v < P) else int(v) % P
                for v in values]
        w = width_for_bits(bits)
        try:
            arr = L.ints_to_limbs(vals, w)
        except AssertionError:
            arr = L.ints_to_limbs(vals, width_for_bits(254))
        # exact real bound from the limb array (vectorized — the per-value
        # Python bit_length() scan dominated from_ints profiles)
        nz = np.flatnonzero(arr.any(axis=0))
        if nz.size == 0:
            real_bits = 1
        else:
            k = int(nz[-1])
            real_bits = k * L.LIMB_BITS + int(arr[:, k].max()).bit_length()
        bits = max(bits, real_bits)
        w = width_for_bits(bits)
        if arr.shape[1] > w:
            arr = arr[:, :w]
        elif arr.shape[1] < w:
            arr = L.pad_limbs(np, arr, w)
        return F(ctx, ctx.xp.asarray(arr), bits)

    @staticmethod
    def from_bool(ctx: Ctx, mask) -> "F":
        return F(ctx, mask.astype(L.DTYPE)[..., None], 1)

    def to_backend(self, ctx: Ctx) -> "F":
        return F(ctx, ctx.xp.asarray(np.asarray(self.limbs)), self.bits)

    @staticmethod
    def zeros(ctx: Ctx) -> "F":
        return F.const(ctx, 0)

    def _coerce(self, other: IntOrF) -> "F":
        if isinstance(other, F):
            return other
        return F.const(self.ctx, other)

    # -- helpers -----------------------------------------------------------

    def widen(self, width: int) -> "F":
        if self.limbs.shape[-1] >= width:
            return self
        return F(self.ctx, L.pad_limbs(self.ctx.xp, self.limbs, width), self.bits)

    @property
    def width(self) -> int:
        return self.limbs.shape[-1]

    def expr(self) -> "F":
        return self

    # -- arithmetic --------------------------------------------------------

    def __add__(self, other: IntOrF) -> "F":
        other = self._coerce(other)
        xp = self.ctx.xp
        nb = max(self.bits, other.bits) + 1
        if nb <= 253:
            w = width_for_bits(nb)
            out = L.add(xp, self.limbs, other.limbs, w)
            return F(self.ctx, out, nb)
        return F(self.ctx, fr.add(xp, self.widen(16).limbs, other.widen(16).limbs), 254)

    __radd__ = __add__

    def __sub__(self, other: IntOrF) -> "F":
        other = self._coerce(other)
        xp = self.ctx.xp
        # no-borrow fast path: a scalar lhs whose value dominates the rhs's
        # static bound cannot wrap mod p (e.g. the ubiquitous `1 - flag`),
        # so the difference keeps the narrow width and bound.  Exact under
        # the bound contract (bits is a hard bound for canonical values).
        if self.limbs.shape[0] == 1 and self.bits <= 32 and other.bits <= self.bits:
            try:  # concrete arrays only — jit tracers fall through to mod-p
                v = int(self.limbs[0, 0]) + (
                    (int(self.limbs[0, 1]) << L.LIMB_BITS) if self.width > 1 else 0)
            except Exception:
                v = -1
            if v >= (1 << other.bits) - 1:
                w = width_for_bits(self.bits)
                d, _ = L.sub(xp, self.widen(w).limbs, other.widen(w).limbs)
                return F(self.ctx, d, self.bits)
        return F(self.ctx, fr.sub(xp, self.widen(16).limbs, other.widen(16).limbs), 254)

    def __rsub__(self, other: IntOrF) -> "F":
        return self._coerce(other).__sub__(self)

    def __mul__(self, other: IntOrF) -> "F":
        other = self._coerce(other)
        xp = self.ctx.xp
        # flag fast path: a 1-bit operand is 0/1 by the bound contract, so
        # the product is an elementwise select — no limb convolution, no
        # Barrett reduction.  This covers the pervasive `sel * expr`
        # boolean-algebra patterns in the gadget layer.
        if self.bits == 1 or other.bits == 1:
            flag, val = (self, other) if self.bits == 1 else (other, self)
            out = val.limbs * flag.limbs[..., :1]
            return F(self.ctx, out, val.bits)
        nb = self.bits + other.bits
        if nb <= 253:
            out = L.mul(xp, self.limbs, other.limbs, width_for_bits(nb))
            return F(self.ctx, out, nb)
        prod = L.mul(xp, self.widen(16).limbs, other.widen(16).limbs)
        return F(self.ctx, fr.reduce_wide(xp, prod), 254)

    __rmul__ = __mul__

    def __neg__(self) -> "F":
        return F(self.ctx, fr.neg(self.ctx.xp, self.widen(16).limbs), 254)

    def fdiv_const(self, denom: int) -> "F":
        """Field division by a static constant (multiply by its inverse).

        Mirrors the reference's ``expr / 2**128`` field divisions
        (reference: src/zkevm_specs/evm_circuit/instruction.py:613)."""
        inv = pow(int(denom) % fr.P, fr.P - 2, fr.P)
        return self * F.const(self.ctx, inv)

    def double(self) -> "F":
        return self + self

    # -- predicates (raw bool arrays over the batch) ----------------------

    def is_zero_mask(self):
        return L.is_zero(self.ctx.xp, self.limbs)

    def eq_mask(self, other: IntOrF):
        other = self._coerce(other)
        return L.eq(self.ctx.xp, self.limbs, other.limbs)

    def lt_mask(self, other: IntOrF):
        other = self._coerce(other)
        return L.lt(self.ctx.xp, self.limbs, other.limbs)

    def le_bits_mask(self, n_bits: int):
        """value < 2^n_bits, as a bool mask."""
        xp = self.ctx.xp
        k, rem = divmod(n_bits, L.LIMB_BITS)
        w = self.width
        ok = xp.ones(self.limbs.shape[:-1], dtype=bool)
        for i in range(k, w):
            if i == k and rem:
                ok = ok & (self.limbs[..., i] < (1 << rem))
            else:
                ok = ok & (self.limbs[..., i] == 0)
        if k >= w:
            return xp.ones(self.limbs.shape[:-1], dtype=bool)
        return ok

    def is_bool_mask(self):
        xp = self.ctx.xp
        ok = self.limbs[..., 0] <= 1
        for i in range(1, self.width):
            ok = ok & (self.limbs[..., i] == 0)
        return ok

    # -- data movement -----------------------------------------------------

    def select(self, mask, other: "F") -> "F":
        """mask ? self : other (elementwise over the batch)."""
        xp = self.ctx.xp
        out = L.select(xp, mask, self.limbs, self._coerce(other).limbs)
        return F(self.ctx, out, max(self.bits, self._coerce(other).bits))

    def gather(self, idx) -> "F":
        """Gather rows of the batch by integer index array."""
        lim = self.limbs
        if lim.shape[0] == 1:
            return self
        return F(self.ctx, lim[idx], self.bits)

    def broadcast(self) -> "F":
        """Materialize a constant row to full batch size."""
        xp = self.ctx.xp
        if self.limbs.shape[0] == self.ctx.batch:
            return self
        return F(
            self.ctx,
            xp.broadcast_to(self.limbs, (self.ctx.batch, self.width)),
            self.bits,
        )

    # -- eager-mode host access -------------------------------------------

    def to_ints(self) -> list:
        assert self.ctx.eager, "reading values is only allowed in eager mode"
        out = L.limbs_to_ints(np.asarray(self.limbs))
        return out if isinstance(out, list) else [out]

    def to_int_scalar(self) -> int:
        vals = self.to_ints()
        assert all(v == vals[0] for v in vals)
        return vals[0]

    # -- bit/byte decomposition (values must satisfy their bound) ---------

    def le_bytes(self, n_bytes: int) -> list:
        """Split into n_bytes little-endian byte-valued F's (no checks)."""
        xp = self.ctx.xp
        out = []
        for b in range(n_bytes):
            limb = b // 2
            if limb < self.width:
                v = self.limbs[..., limb]
                v = (v >> 8) if (b % 2) else (v & 0xFF)
                v = v & 0xFF
            else:
                v = xp.zeros(self.limbs.shape[:-1], dtype=L.DTYPE)
            out.append(F(self.ctx, v[..., None], 8))
        return out

    def split_pow2(self, bits: int, hi_bits: int) -> Tuple["F", "F"]:
        """Return (self >> bits, self mod 2^bits) with hi bound hi_bits."""
        xp = self.ctx.xp
        q, r = L.divmod_pow2(xp, self.limbs, bits)
        qf = F(self.ctx, trim(q, width_for_bits(hi_bits)), hi_bits)
        rf = F(self.ctx, trim(r, width_for_bits(bits)), bits)
        return qf, rf

    def __repr__(self):
        if self.ctx.eager:
            vals = self.to_ints()
            s = vals[0] if len(vals) == 1 else vals[: min(len(vals), 4)]
            return f"F({s})"
        return f"F(bits={self.bits}, width={self.width})"


def trim(arr, width: int):
    """Truncate or keep a limb array at the given width (high limbs must be
    zero by the caller's bound)."""
    if arr.shape[-1] <= width:
        return L.pad_limbs(np if isinstance(arr, np.ndarray) else _jnp(), arr, width)
    return arr[..., :width]


def _jnp():
    import jax.numpy as jnp

    return jnp


class Word:
    """A 256-bit EVM word as lo/hi 128-bit field elements.

    Mirrors reference Word (src/zkevm_specs/util/arithmetic.py:99-168)."""

    __slots__ = ("lo", "hi")

    def __init__(self, lo: F, hi: F):
        self.lo = lo
        self.hi = hi

    @staticmethod
    def const(ctx: Ctx, value: int) -> "Word":
        assert 0 <= value < (1 << 256)
        return Word(F.const(ctx, value & ((1 << 128) - 1)), F.const(ctx, value >> 128))

    @staticmethod
    def from_lo(lo: F) -> "Word":
        return Word(lo, F.const(lo.ctx, 0))

    @staticmethod
    def from_ints(ctx: Ctx, values: Sequence[int]) -> "Word":
        mask = (1 << 128) - 1
        return Word(
            F.from_ints(ctx, [v & mask for v in values], 128),
            F.from_ints(ctx, [v >> 128 for v in values], 128),
        )

    def to_lo_hi(self) -> Tuple[F, F]:
        return self.lo, self.hi

    def to_backend(self, ctx: Ctx) -> "Word":
        return Word(self.lo.to_backend(ctx), self.hi.to_backend(ctx))

    def to_64s(self) -> Tuple[F, F, F, F]:
        lo_q, lo_r = self.lo.split_pow2(64, 64)
        hi_q, hi_r = self.hi.split_pow2(64, 64)
        return (lo_r, lo_q, hi_r, hi_q)

    def to_le_bytes(self) -> list:
        return self.lo.le_bytes(16) + self.hi.le_bytes(16)

    def add_lanes(self, other: "Word") -> "Word":
        """Lane-wise add of lo/hi (NOT 256-bit addition) — mirrors reference
        Word.__add__ used with select (util/arithmetic.py:143-146)."""
        return Word(self.lo + other.lo, self.hi + other.hi)

    def select_scale(self, selector: F) -> "Word":
        return Word(selector * self.lo, selector * self.hi)

    def select(self, mask, other: "Word") -> "Word":
        return Word(self.lo.select(mask, other.lo), self.hi.select(mask, other.hi))

    def gather(self, idx) -> "Word":
        return Word(self.lo.gather(idx), self.hi.gather(idx))

    def eq_mask(self, other: "Word"):
        return self.lo.eq_mask(other.lo) & self.hi.eq_mask(other.hi)

    def is_zero_mask(self):
        return self.lo.is_zero_mask() & self.hi.is_zero_mask()

    def to_ints(self) -> list:
        los, his = self.lo.to_ints(), self.hi.to_ints()
        if len(los) == 1 and len(his) > 1:
            los = los * len(his)
        if len(his) == 1 and len(los) > 1:
            his = his * len(los)
        return [lo + (hi << 128) for lo, hi in zip(los, his)]

    def __repr__(self):
        return f"Word({self.lo!r},{self.hi!r})"


class WordOrValue(Word):
    """A word or a single field value in the lo lane — mirrors reference
    WordOrValue (util/arithmetic.py:171-195)."""

    __slots__ = ("is_word",)

    def __init__(self, value: Union[Word, F]):
        if isinstance(value, Word):
            super().__init__(value.lo, value.hi)
            self.is_word = True
        else:
            super().__init__(value, F.const(value.ctx, 0))
            self.is_word = False

    def value(self) -> F:
        return self.lo
