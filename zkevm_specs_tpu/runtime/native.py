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
        lib.zkevm_bn254_g1_add.argtypes = [ctypes.c_char_p] * 6
        lib.zkevm_bn254_g1_add.restype = ctypes.c_int
        lib.zkevm_bn254_g1_mul.argtypes = [ctypes.c_char_p] * 5
        lib.zkevm_bn254_g1_mul.restype = ctypes.c_int
        lib.zkevm_bn254_g1_msm.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_uint64, ctypes.c_char_p, ctypes.c_char_p,
        ]
        lib.zkevm_bn254_g1_msm.restype = ctypes.c_int
        lib.zkevm_bn254_g2_subgroup_check.argtypes = [ctypes.c_char_p] * 4
        lib.zkevm_bn254_g2_subgroup_check.restype = ctypes.c_int
        lib.zkevm_bn254_pairing_check.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_uint64,
        ]
        lib.zkevm_bn254_pairing_check.restype = ctypes.c_int
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


def _b32(x: int) -> bytes:
    return (x % (1 << 256)).to_bytes(32, "big")


def bn254_g1_add_native(p1, p2):
    """(x1,y1)+(x2,y2) on bn254 G1; points as int pairs, None = infinity.
    Returns the affine sum, None for infinity, False if no native lib."""
    lib = _load()
    if lib is None:
        return False
    ax, ay = (0, 0) if p1 is None else p1
    bx, by = (0, 0) if p2 is None else p2
    ox = ctypes.create_string_buffer(32)
    oy = ctypes.create_string_buffer(32)
    ok = lib.zkevm_bn254_g1_add(_b32(ax), _b32(ay), _b32(bx), _b32(by), ox, oy)
    if not ok:
        return None
    return (int.from_bytes(ox.raw, "big"), int.from_bytes(oy.raw, "big"))


def bn254_g1_mul_native(pt, k: int):
    lib = _load()
    if lib is None:
        return False
    px, py = (0, 0) if pt is None else pt
    ox = ctypes.create_string_buffer(32)
    oy = ctypes.create_string_buffer(32)
    ok = lib.zkevm_bn254_g1_mul(_b32(px), _b32(py), _b32(k), ox, oy)
    if not ok:
        return None
    return (int.from_bytes(ox.raw, "big"), int.from_bytes(oy.raw, "big"))


def bn254_g1_msm_native(points, scalars):
    """sum_i k_i * P_i; points as int pairs (None = infinity)."""
    lib = _load()
    if lib is None:
        return False
    xs = b"".join(_b32(0 if p is None else p[0]) for p in points)
    ys = b"".join(_b32(0 if p is None else p[1]) for p in points)
    ks = b"".join(_b32(k) for k in scalars)
    ox = ctypes.create_string_buffer(32)
    oy = ctypes.create_string_buffer(32)
    ok = lib.zkevm_bn254_g1_msm(xs, ys, ks, len(points), ox, oy)
    if not ok:
        return None
    return (int.from_bytes(ox.raw, "big"), int.from_bytes(oy.raw, "big"))


def bn254_g2_subgroup_native(x0: int, x1: int, y0: int, y1: int):
    """Order-r subgroup membership for a G2 point ((x0,x1),(y0,y1));
    None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    return bool(lib.zkevm_bn254_g2_subgroup_check(
        _b32(x0), _b32(x1), _b32(y0), _b32(y1)))


def bn254_pairing_check_native(pairs):
    """prod e(P_i, Q_i) == 1; pairs = [(g1_pt, g2_pt)] with g1 int pairs and
    g2 FQ2 coefficient pairs ((x0,x1),(y0,y1)); None points = infinity."""
    lib = _load()
    if lib is None:
        return None
    g1s, g2s = b"", b""
    for pt, q in pairs:
        px, py = (0, 0) if pt is None else pt
        g1s += _b32(px) + _b32(py)
        if q is None:
            g2s += b"\x00" * 128
        else:
            qx, qy = q
            g2s += _b32(qx[0]) + _b32(qx[1]) + _b32(qy[0]) + _b32(qy[1])
    return bool(lib.zkevm_bn254_pairing_check(g1s, g2s, len(pairs)))


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
