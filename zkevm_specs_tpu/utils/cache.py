"""Per-machine XLA persistent-cache location.

XLA:CPU serializes AOT executables specialized to the *compiling* host's CPU
features; jax's persistent-cache key does not include them, so a cache
directory shared between machines (this repo's ``.jax_cache`` travels with
the checkout) can hand a host an executable compiled for different machine
features — the loader logs ``cpu_aot_loader.cc`` feature-mismatch errors and
can SIGILL/SIGSEGV (the round-3 whole-suite crash inside
``compile-cache executable load``).  Keying the directory by a host
fingerprint makes foreign entries invisible instead of fatal.
"""
from __future__ import annotations

import hashlib
import os
import platform


def machine_fingerprint() -> str:
    """Stable 12-hex id of this host's CPU feature set."""
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    raw = f"{platform.machine()}/{feats}"
    return hashlib.sha256(raw.encode()).hexdigest()[:12]


def machine_cache_dir(base: str) -> str:
    """``<base>/<machine fingerprint>`` (created if missing)."""
    path = os.path.join(base, machine_fingerprint())
    os.makedirs(path, exist_ok=True)
    return path


def install_cache_write_guard(max_compile_seconds: float = 60.0) -> None:
    """Skip persistent-cache WRITES for giant XLA:CPU executables.

    jaxlib's ``executable.serialize()`` SIGSEGVs on the largest CPU programs
    this framework compiles (observed twice: round-3 suite crash, and
    ``jax._src.compilation_cache.put_executable_and_time`` in this round's
    logs).  Programs that took longer than ``max_compile_seconds`` to
    compile are exactly the crashy giants — skip caching them; everything
    else keeps the fast warm path.  TPU executables serialize fine and are
    unaffected."""
    from jax._src import compilation_cache as cc

    if getattr(cc, "_zkevm_tpu_write_guard", False):
        return
    orig = cc.put_executable_and_time

    def guarded(cache_key, module_name, executable, backend, compile_time):
        platform = getattr(backend, "platform", "")
        if platform == "cpu" and compile_time > max_compile_seconds:
            return
        return orig(cache_key, module_name, executable, backend, compile_time)

    cc.put_executable_and_time = guarded
    cc._zkevm_tpu_write_guard = True
