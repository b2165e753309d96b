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
