"""Loader for the native runtime library (csrc/libzkevm_native.so).

The native keccak backs the witness-generation hot path (every bytecode and
tx payload is hashed); the library is built on demand with the system C
compiler and the Python implementation remains as fallback, so nothing
breaks on a machine without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import List, Optional

_CSRC = Path(__file__).resolve().parent.parent.parent / "csrc"
_LIB_PATH = _CSRC / "libzkevm_native.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_CSRC)], check=True,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.zkevm_keccak256.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_char_p,
        ]
        lib.zkevm_keccak256_batch.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_uint64, ctypes.c_char_p,
        ]
        lib.zkevm_secp256k1_double_mul.argtypes = [ctypes.c_char_p] * 6
        lib.zkevm_secp256k1_double_mul.restype = ctypes.c_int
        lib.zkevm_secp256k1_verify_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_uint64, ctypes.c_char_p,
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def keccak256_native(data: bytes) -> Optional[bytes]:
    lib = _load()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(32)
    lib.zkevm_keccak256(data, len(data), out)
    return out.raw


def secp256k1_double_mul_native(u1: int, u2: int, px: int, py: int):
    """u1*G + u2*(px,py) on secp256k1; returns the affine point, None for
    infinity, or False when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return False
    outx = ctypes.create_string_buffer(32)
    outy = ctypes.create_string_buffer(32)
    ok = lib.zkevm_secp256k1_double_mul(
        u1.to_bytes(32, "big"), u2.to_bytes(32, "big"),
        px.to_bytes(32, "big"), py.to_bytes(32, "big"), outx, outy)
    if not ok:
        return None
    return (int.from_bytes(outx.raw, "big"), int.from_bytes(outy.raw, "big"))


def secp256k1_verify_batch_native(rows) -> Optional[List[bool]]:
    """Batch ECDSA verify: rows = [(msg_hash, r, s, (px, py))]."""
    lib = _load()
    if lib is None:
        return None
    n = len(rows)
    msg = b"".join((h % (1 << 256)).to_bytes(32, "big") for h, _, _, _ in rows)
    rr = b"".join((r % (1 << 256)).to_bytes(32, "big") for _, r, _, _ in rows)
    ss = b"".join((s % (1 << 256)).to_bytes(32, "big") for _, _, s, _ in rows)
    px = b"".join(pk[0].to_bytes(32, "big") for _, _, _, pk in rows)
    py = b"".join(pk[1].to_bytes(32, "big") for _, _, _, pk in rows)
    out = ctypes.create_string_buffer(n)
    lib.zkevm_secp256k1_verify_batch(msg, rr, ss, px, py, n, out)
    return [bool(b) for b in out.raw]


def keccak256_batch_native(datas: List[bytes]) -> Optional[List[bytes]]:
    lib = _load()
    if lib is None:
        return None
    blob = b"".join(datas)
    offsets = [0]
    for d in datas:
        offsets.append(offsets[-1] + len(d))
    arr = (ctypes.c_uint64 * len(offsets))(*offsets)
    out = ctypes.create_string_buffer(32 * len(datas))
    lib.zkevm_keccak256_batch(blob, arr, len(datas), out)
    return [out.raw[32 * i: 32 * i + 32] for i in range(len(datas))]
