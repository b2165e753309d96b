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
