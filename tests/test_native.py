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
