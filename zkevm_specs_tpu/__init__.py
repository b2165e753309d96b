"""zkevm_specs_tpu — a TPU-native zkEVM constraint-checking framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
privacy-scaling-explorations/zkevm-specs: columnar witness tables, batched
constraint kernels per execution state, sorted-fingerprint lookup arguments,
and BN254-Fr limb arithmetic, running identically under eager numpy (spec
conformance mode) and jit (TPU production mode).
"""

try:  # u64 fingerprints in the lookup engine need x64 under jax
    import jax as _jax

    _jax.config.update("jax_enable_x64", True)
except Exception:  # pragma: no cover - jax always present in target env
    pass

__version__ = "0.1.0"
