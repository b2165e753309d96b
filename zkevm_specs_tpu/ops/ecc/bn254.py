"""BN254 (alt_bn128) curve arithmetic including the optimal-ate pairing.

The reference uses py_ecc for these (reference: src/zkevm_specs/util/ec.py:
120-199, ecc_circuit.py); that dependency is absent here, so the curve,
its degree-12 extension tower and the pairing are implemented directly —
standard Miller loop over the 6t+2 ate count with naive final
exponentiation.  Used by the ecc circuit (precompiles 0x06-0x08).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

# base field and curve order
P = 21888242871839275222246405745257275088696311157297823662689037894645226208583
R = 21888242871839275222246405745257275088548364400416034343698204186575808495617
B = 3
ATE_LOOP_COUNT = 29793968203157093288
LOG_ATE_LOOP_COUNT = 63

G1 = (1, 2)


def _inv(a: int) -> int:
    return pow(a, P - 2, P)


# -- polynomial extension fields (py_ecc-style tower) -----------------------

class Poly:
    """Element of F_p[x]/(modulus); coefficients little-endian."""

    __slots__ = ("c",)
    DEGREE = 0
    MOD_COEFFS: Tuple[int, ...] = ()

    def __init__(self, coeffs):
        assert len(coeffs) == self.DEGREE
        self.c = [x % P for x in coeffs]

    @classmethod
    def one(cls):
        return cls([1] + [0] * (cls.DEGREE - 1))

    @classmethod
    def zero(cls):
        return cls([0] * cls.DEGREE)

    def __eq__(self, other):
        return self.c == other.c

    def __add__(self, other):
        return type(self)([a + b for a, b in zip(self.c, other.c)])

    def __sub__(self, other):
        return type(self)([a - b for a, b in zip(self.c, other.c)])

    def __neg__(self):
        return type(self)([-a for a in self.c])

    def scalar_mul(self, k: int):
        return type(self)([a * k for a in self.c])

    def __mul__(self, other):
        if isinstance(other, int):
            return self.scalar_mul(other)
        d = self.DEGREE
        prod = [0] * (2 * d - 1)
        for i, a in enumerate(self.c):
            if a == 0:
                continue
            for j, b in enumerate(other.c):
                prod[i + j] += a * b
        # reduce by x^d = -MOD_COEFFS
        for i in range(2 * d - 2, d - 1, -1):
            top = prod[i]
            if top == 0:
                continue
            prod[i] = 0
            for j, m in enumerate(self.MOD_COEFFS):
                prod[i - d + j] -= top * m
        return type(self)([x % P for x in prod[:d]])

    def inv(self):
        # extended euclid over F_p[x]
        d = self.DEGREE
        lm, hm = [1] + [0] * d, [0] * (d + 1)
        low = list(self.c) + [0]
        high = list(self.MOD_COEFFS) + [1]

        def deg(poly):
            for i in range(len(poly) - 1, -1, -1):
                if poly[i]:
                    return i
            return 0

        def poly_div(a, b):
            dega, degb = deg(a), deg(b)
            temp = [x for x in a]
            out = [0] * len(a)
            inv_b = _inv(b[degb])
            for i in range(dega - degb, -1, -1):
                out[i] = temp[degb + i] * inv_b % P
                for j in range(degb + 1):
                    temp[i + j] -= out[i] * b[j]
                temp = [x % P for x in temp]
            return [x % P for x in out]

        while deg(low):
            q = poly_div(high, low)
            nm = [x for x in hm]
            new = [x for x in high]
            for i in range(d + 1):
                for j in range(d + 1 - i):
                    nm[i + j] -= lm[i] * q[j]
                    new[i + j] -= low[i] * q[j]
            nm = [x % P for x in nm]
            new = [x % P for x in new]
            lm, low, hm, high = nm, new, lm, low
        inv_low0 = _inv(low[0])
        return type(self)([x * inv_low0 % P for x in lm[:d]])

    def __truediv__(self, other):
        if isinstance(other, int):
            return self.scalar_mul(_inv(other))
        return self * other.inv()

    def is_zero(self):
        return all(x == 0 for x in self.c)

    def __repr__(self):
        return f"{type(self).__name__}({self.c})"


class FQ2(Poly):
    DEGREE = 2
    MOD_COEFFS = (1, 0)  # u^2 = -1


class FQ12(Poly):
    DEGREE = 12
    MOD_COEFFS = (82, 0, 0, 0, 0, 0, -18, 0, 0, 0, 0, 0)  # w^12 - 18w^6 + 82


# -- G1 (over F_p) -----------------------------------------------------------

PointG1 = Optional[Tuple[int, int]]


def g1_is_on_curve(pt: PointG1) -> bool:
    if pt is None:
        return True
    x, y = pt
    return (y * y - x * x * x - B) % P == 0


def g1_add(p1: PointG1, p2: PointG1) -> PointG1:
    from ...runtime.native import bn254_g1_add_native

    native = bn254_g1_add_native(p1, p2)
    if native is not False:
        return native
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if (y1 + y2) % P == 0:
            return None
        lam = 3 * x1 * x1 * _inv(2 * y1) % P
    else:
        lam = (y2 - y1) * _inv((x2 - x1) % P) % P
    x3 = (lam * lam - x1 - x2) % P
    y3 = (lam * (x1 - x3) - y1) % P
    return (x3, y3)


def g1_mul(pt: PointG1, k: int) -> PointG1:
    from ...runtime.native import bn254_g1_mul_native

    if 0 <= k < 2**256:
        native = bn254_g1_mul_native(pt, k)
        if native is not False:
            return native
    result: PointG1 = None
    addend = pt
    while k:
        if k & 1:
            result = g1_add(result, addend)
        addend = g1_add(addend, addend)
        k >>= 1
    return result


# -- G2 (over F_p2) ----------------------------------------------------------

PointG2 = Optional[Tuple[FQ2, FQ2]]

B2 = FQ2([3, 0]) / FQ2([9, 1])  # b / (9 + u)

G2: PointG2 = (
    FQ2([
        10857046999023057135944570762232829481370756359578518086990519993285655852781,
        11559732032986387107991004021392285783925812861821192530917403151452391805634,
    ]),
    FQ2([
        8495653923123431417604973247489272438418190587263600148770280649306958101930,
        4082367875863433681332203403145435568316851327593401208105741076214120093531,
    ]),
)


def g2_is_on_curve(pt: PointG2) -> bool:
    if pt is None:
        return True
    x, y = pt
    return (y * y - x * x * x - B2).is_zero()


def g2_add(p1: PointG2, p2: PointG2) -> PointG2:
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if (y1 + y2).is_zero():
            return None
        lam = (x1 * x1).scalar_mul(3) / (y1.scalar_mul(2))
    else:
        lam = (y2 - y1) / (x2 - x1)
    x3 = lam * lam - x1 - x2
    y3 = lam * (x1 - x3) - y1
    return (x3, y3)


def g2_mul(pt: PointG2, k: int) -> PointG2:
    if k == R and pt is not None:
        # the circuit's subgroup check (`g2_mul(pt, R) is None`): answer it
        # natively; fall through to Python only for the rare non-member
        from ...runtime.native import bn254_g2_subgroup_native

        x, y = pt
        native = bn254_g2_subgroup_native(x.c[0], x.c[1], y.c[0], y.c[1])
        if native:
            return None
    result: PointG2 = None
    addend = pt
    while k:
        if k & 1:
            result = g2_add(result, addend)
        addend = g2_add(addend, addend)
        k >>= 1
    return result


def g2_in_subgroup(pt: PointG2) -> bool:
    """Order-r subgroup membership (needed by the ecPairing precompile)."""
    return g2_mul(pt, R) is None


# -- pairing -----------------------------------------------------------------

W = FQ12([0, 1] + [0] * 10)
W2 = W * W
W3 = W2 * W


def _twist(pt: PointG2):
    """Map a G2 point into E(F_p12) (untwist)."""
    if pt is None:
        return None
    x, y = pt
    # coefficients in the 1, u basis -> embed via w^2, w^3
    xc = [x.c[0] - 9 * x.c[1], x.c[1]]
    yc = [y.c[0] - 9 * y.c[1], y.c[1]]
    nx = FQ12([xc[0]] + [0] * 5 + [xc[1]] + [0] * 5)
    ny = FQ12([yc[0]] + [0] * 5 + [yc[1]] + [0] * 5)
    return (nx * W2, ny * W3)


def _cast_g1(pt: PointG1):
    if pt is None:
        return None
    x, y = pt
    return (FQ12([x] + [0] * 11), FQ12([y] + [0] * 11))


def _linefunc(p1, p2, t):
    x1, y1 = p1
    x2, y2 = p2
    xt, yt = t
    if not (x1 == x2):
        m = (y2 - y1) / (x2 - x1)
        return m * (xt - x1) - (yt - y1)
    elif y1 == y2:
        m = (x1 * x1).scalar_mul(3) / y1.scalar_mul(2)
        return m * (xt - x1) - (yt - y1)
    else:
        return xt - x1


def _fq12_add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if (y1 + y2).is_zero():
            return None
        lam = (x1 * x1).scalar_mul(3) / y1.scalar_mul(2)
    else:
        lam = (y2 - y1) / (x2 - x1)
    x3 = lam * lam - x1 - x2
    y3 = lam * (x1 - x3) - y1
    return (x3, y3)


def _miller_loop(Q, Pt) -> FQ12:
    if Q is None or Pt is None:
        return FQ12.one()
    Rq = Q
    f = FQ12.one()
    for i in range(LOG_ATE_LOOP_COUNT, -1, -1):
        f = f * f * _linefunc(Rq, Rq, Pt)
        Rq = _fq12_add(Rq, Rq)
        if ATE_LOOP_COUNT & (2**i):
            f = f * _linefunc(Rq, Q, Pt)
            Rq = _fq12_add(Rq, Q)
    # Frobenius endomorphism terms
    Q1 = (_fq12_pow_p(Rq_x(Q)), _fq12_pow_p(Rq_y(Q)))
    nQ2 = (_fq12_pow_p(Q1[0]), -_fq12_pow_p(Q1[1]))
    f = f * _linefunc(Rq, Q1, Pt)
    Rq = _fq12_add(Rq, Q1)
    f = f * _linefunc(Rq, nQ2, Pt)
    return f


def Rq_x(q):
    return q[0]


def Rq_y(q):
    return q[1]


def _fq12_pow_p(x: FQ12) -> FQ12:
    return fq12_pow(x, P)


def fq12_pow(x: FQ12, n: int) -> FQ12:
    result = FQ12.one()
    base = x
    while n:
        if n & 1:
            result = result * base
        base = base * base
        n >>= 1
    return result


def final_exponentiate(f: FQ12) -> FQ12:
    return fq12_pow(f, (P**12 - 1) // R)


def pairing(Q: PointG2, Pt: PointG1) -> FQ12:
    """e(P, Q) — NOT final-exponentiated (compose products first)."""
    assert g1_is_on_curve(Pt)
    assert g2_is_on_curve(Q)
    return _miller_loop(_twist(Q), _cast_g1(Pt))


def pairing_check(pairs: List[Tuple[PointG1, PointG2]]) -> bool:
    """prod e(P_i, Q_i) == 1 — the ecPairing precompile predicate."""
    from ...runtime.native import bn254_pairing_check_native

    native = bn254_pairing_check_native(
        [(pt, None if q is None else ((q[0].c[0], q[0].c[1]),
                                      (q[1].c[0], q[1].c[1])))
         for pt, q in pairs])
    if native is not None:
        return native
    f = FQ12.one()
    for Pt, Q in pairs:
        f = f * pairing(Q, Pt)
    return final_exponentiate(f) == FQ12.one()
