"""Native runtime library tests (csrc/keccak.c via ctypes)."""
import pytest

from zkevm_specs_tpu.ops.keccak import _keccak256_py, keccak256
from zkevm_specs_tpu.runtime.native import (
    keccak256_batch_native,
    keccak256_native,
    native_available,
)


@pytest.mark.skipif(not native_available(), reason="native lib not built")
def test_native_keccak_matches_python():
    for d in (b"", b"abc", b"\x00" * 136, b"q" * 137, bytes(range(256)) * 3):
        assert keccak256_native(d) == _keccak256_py(d)


@pytest.mark.skipif(not native_available(), reason="native lib not built")
def test_native_keccak_batch():
    datas = [b"", b"a", b"b" * 135, b"c" * 136, b"d" * 500]
    assert keccak256_batch_native(datas) == [_keccak256_py(d) for d in datas]


def test_keccak_dispatch_consistent():
    # public entry point must agree with the pure-python reference either way
    assert keccak256(b"dispatch") == _keccak256_py(b"dispatch")


# -- native secp256k1 (csrc/ec_secp256k1.c) ---------------------------------

def test_native_secp256k1_double_mul_matches_python():
    import random

    from zkevm_specs_tpu.ops.ecc import secp256k1 as s
    from zkevm_specs_tpu.runtime.native import (
        native_available,
        secp256k1_double_mul_native,
    )

    if not native_available():
        import pytest

        pytest.skip("native library unavailable")
    rng = random.Random(42)
    for _ in range(10):
        u1, u2 = rng.randrange(0, s.N), rng.randrange(0, s.N)
        pk = s.mul(s.G, rng.randrange(1, s.N))
        want = s.add(s.mul(s.G, u1), s.mul(pk, u2))
        assert secp256k1_double_mul_native(u1, u2, pk[0], pk[1]) == want


def test_native_secp256k1_verify_batch_parity():
    import random

    from zkevm_specs_tpu.ops.ecc import secp256k1 as s

    rng = random.Random(43)
    rows = []
    for i in range(12):
        sk = rng.randrange(1, s.N)
        pk = s.mul(s.G, sk)
        h = rng.randrange(1, s.N)
        v, r, sig_s = s.sign(h, sk, rng.randrange(1, s.N))
        if i % 3 == 0:
            sig_s = (sig_s + 1) % s.N  # corrupt
        rows.append((h, r, sig_s, pk))
    # batch (native when available) must agree with scalar verify
    assert s.verify_batch(rows) == [s.verify(*row) for row in rows]


# -- native bn254 (csrc/ec_bn254.c) ------------------------------------------

def _py_g1_add(p1, p2):
    """Pure-Python affine add (ground truth, bypassing the native path)."""
    from zkevm_specs_tpu.ops.ecc import bn254 as b

    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if (y1 + y2) % b.P == 0:
            return None
        lam = 3 * x1 * x1 * b._inv(2 * y1) % b.P
    else:
        lam = (y2 - y1) * b._inv((x2 - x1) % b.P) % b.P
    x3 = (lam * lam - x1 - x2) % b.P
    return (x3, (lam * (x1 - x3) - y1) % b.P)


def _py_g1_mul(pt, k):
    result, addend = None, pt
    while k:
        if k & 1:
            result = _py_g1_add(result, addend)
        addend = _py_g1_add(addend, addend)
        k >>= 1
    return result


def test_native_bn254_g1_matches_python():
    import random

    from zkevm_specs_tpu.ops.ecc import bn254 as b
    from zkevm_specs_tpu.runtime.native import (
        bn254_g1_add_native, bn254_g1_msm_native, bn254_g1_mul_native,
        native_available,
    )

    if not native_available():
        import pytest

        pytest.skip("native library unavailable")
    rng = random.Random(7)
    for k in [0, 1, 2, b.R - 1, b.R, rng.getrandbits(254)]:
        assert bn254_g1_mul_native(b.G1, k) == _py_g1_mul(b.G1, k)
    p = _py_g1_mul(b.G1, 31337)
    assert bn254_g1_add_native(b.G1, p) == _py_g1_add(b.G1, p)
    assert bn254_g1_add_native(p, (p[0], b.P - p[1])) is None  # P + (-P)
    assert bn254_g1_add_native(None, p) == p
    pts = [_py_g1_mul(b.G1, i + 2) for i in range(4)]
    ks = [rng.getrandbits(128) for _ in range(4)]
    want = None
    for q, k in zip(pts, ks):
        want = _py_g1_add(want, _py_g1_mul(q, k))
    assert bn254_g1_msm_native(pts, ks) == want


def test_native_bn254_pairing_bilinear():
    from zkevm_specs_tpu.ops.ecc import bn254 as b
    from zkevm_specs_tpu.runtime.native import native_available

    if not native_available():
        import pytest

        pytest.skip("native library unavailable")
    G1, G2 = b.G1, b.G2
    neg_g1 = (G1[0], b.P - G1[1])
    # e(P,Q) e(-P,Q) == 1
    assert b.pairing_check([(G1, G2), (neg_g1, G2)])
    # bilinearity: e(aP,Q) e(-P,aQ) == 1
    a = 9876543210
    aP = _py_g1_mul(G1, a)
    aQ = b.g2_mul(G2, a)
    assert b.pairing_check([(aP, G2), (neg_g1, aQ)])
    # non-unit product rejected
    assert not b.pairing_check([(G1, G2), (G1, G2)])
    # infinity factors are identity; empty product is 1
    assert b.pairing_check([])
    assert b.pairing_check([(None, G2), (G1, None)])


def test_native_bn254_g2_subgroup():
    from zkevm_specs_tpu.ops.ecc import bn254 as b
    from zkevm_specs_tpu.runtime.native import (
        bn254_g2_subgroup_native, native_available,
    )

    if not native_available():
        import pytest

        pytest.skip("native library unavailable")
    q = b.g2_mul(b.G2, 12345)
    assert bn254_g2_subgroup_native(q[0].c[0], q[0].c[1],
                                    q[1].c[0], q[1].c[1]) is True
    assert b.g2_in_subgroup(q)
