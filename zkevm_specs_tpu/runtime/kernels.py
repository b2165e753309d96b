"""Generic device compilation for standalone circuits.

Every standalone circuit in this framework is written as a *batched
constraint body*: build columns (`F`/`Word`) over an array namespace ``xp``,
record constraints into a ``ConstraintSystem``, return per-lane failure
bits.  The same body therefore runs

  * eagerly on numpy (spec mode — exact failure messages, host), and
  * compiled by XLA on the TPU (production mode), via this module.

``CircuitKernel`` packs a circuit's columns and lookup tables into flat
limb-array pytrees, records the static metadata (bit bounds, row counts,
prebuilt lookup indexes) the traced kernel needs, and jits one fused XLA
program returning the failure-bit vector.  Compiled executables are cached
process-wide by the static metadata, so verifying many witnesses of the
same shape compiles once.

This is the production path the reference never had: its circuits are
per-row Python asserts (e.g. reference src/zkevm_specs/bytecode_circuit.py:37,
copy_circuit.py:92, exp_circuit.py:88).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple, Union

import numpy as np

from ..dsl.cs import ConstraintSystem
from ..dsl.value import Ctx, F, Word
from ..tables.engine import Table


def pack_value(v: Union[F, Word]):
    """Serialize an F/Word into (arrays, static bits) for the jit boundary."""
    if isinstance(v, Word):
        return ({"lo": np.asarray(v.lo.limbs), "hi": np.asarray(v.hi.limbs)},
                ("word", v.lo.bits, v.hi.bits))
    return {"f": np.asarray(v.limbs)}, ("f", v.bits)


def unpack_value(ctx: Ctx, arrs, meta) -> Union[F, Word]:
    if meta[0] == "word":
        return Word(F(ctx, arrs["lo"], meta[1]), F(ctx, arrs["hi"], meta[2]))
    return F(ctx, arrs["f"], meta[1])


def pack_values(values: Dict[str, Union[F, Word]]):
    tree, meta = {}, {}
    for k, v in values.items():
        tree[k], meta[k] = pack_value(v)
    return tree, meta


def unpack_values(ctx: Ctx, tree, meta) -> Dict[str, Union[F, Word]]:
    return {k: unpack_value(ctx, tree[k], meta[k]) for k in tree}


def pack_table(t: Table):
    """Serialize an eagerly-built Table (columns + any prebuilt sorted
    indexes; index max-spans stay static)."""
    cols_tree, cols_meta = pack_values(t.data)
    idx_tree = {"/".join(s): {"fps": np.asarray(fps), "order": np.asarray(order)}
                for s, (fps, order, _) in t._indexes.items()}
    spans = {"/".join(s): span for s, (_, _, span) in t._indexes.items()}
    meta = {"schema": t.schema, "n_rows": t.n_rows, "cols": cols_meta,
            "spans": spans}
    return {"cols": cols_tree, "idx": idx_tree}, meta


def unpack_table(ctx: Ctx, tree, meta) -> Table:
    data = unpack_values(ctx, tree["cols"], meta["cols"])
    t = Table(ctx, meta["schema"], data, meta["n_rows"])
    for key, d in tree["idx"].items():
        t._indexes[tuple(key.split("/"))] = (d["fps"], d["order"],
                                             meta["spans"][key])
    return t


def _freeze(obj):
    if isinstance(obj, dict):
        return tuple(sorted((k, _freeze(v)) for k, v in obj.items()))
    if isinstance(obj, (list, tuple)):
        return tuple(_freeze(v) for v in obj)
    if hasattr(obj, "columns") and hasattr(obj, "name"):  # Schema
        return (obj.name, tuple(sorted((c, s.kind, s.bits)
                                       for c, s in obj.columns.items())))
    return obj


_CIRCUIT_KERNEL_CACHE: Dict[tuple, object] = {}


class CircuitKernel:
    """One compiled standalone-circuit check.

    ``check``: fn(ctx, cs, cols: dict[str, F|Word], tables: dict[str, Table],
    static: dict) -> None, recording constraints into cs.  ``cols`` columns
    must share the batch dimension (= the circuit's row count); tables are
    read-only lookup sides.
    """

    def __init__(self, name: str, check: Callable,
                 cols: Dict[str, Union[F, Word]],
                 tables: Optional[Dict[str, Table]] = None,
                 static: Optional[dict] = None,
                 extra: Optional[dict] = None):
        import jax

        tables = tables or {}
        static = static or {}
        self.name = name
        self.n = next(iter(cols.values())).lo.ctx.batch if isinstance(
            next(iter(cols.values())), Word) else next(iter(cols.values())).ctx.batch
        cols_tree, cols_meta = pack_values(cols)
        tbl_tree, tbl_meta = {}, {}
        for tname, t in tables.items():
            tbl_tree[tname], tbl_meta[tname] = pack_table(t)
        # extra: raw arrays passed through untyped (e.g. u32 keccak blocks)
        extra_tree = {k: np.asarray(v) for k, v in (extra or {}).items()}
        self.args = (cols_tree, tbl_tree, extra_tree)
        n = self.n

        key = (name, n, _freeze(cols_meta), _freeze(tbl_meta), _freeze(static),
               tuple(sorted((k, v.shape, str(v.dtype))
                            for k, v in extra_tree.items())))
        self._jit = _CIRCUIT_KERNEL_CACHE.get(key)
        if self._jit is None:
            def fn(cols_tree, tbl_tree, extra_tree):
                import jax.numpy as jnp

                jctx = Ctx(jnp, n, "jit")
                jcs = ConstraintSystem(jctx)
                jcols = unpack_values(jctx, cols_tree, cols_meta)
                jtables = {k: unpack_table(jctx, v, tbl_meta[k])
                           for k, v in tbl_tree.items()}
                check(jctx, jcs, jcols, jtables, static, extra_tree)
                return jcs.fail

            self._jit = jax.jit(fn)
            _CIRCUIT_KERNEL_CACHE[key] = self._jit

    def device_args(self):
        import jax

        return jax.device_put(self.args)

    def __call__(self, args=None):
        return self._jit(*(args if args is not None else self.args))


def run_spec(name: str, check: Callable, cols, tables=None, static=None,
             extra=None, success: bool = True, label: str = "row"):
    """Eager (numpy) evaluation of the same constraint body, with the
    reference's verdict semantics (earliest failing lane raises)."""
    ctx = (next(iter(cols.values())).lo.ctx if isinstance(
        next(iter(cols.values())), Word) else next(iter(cols.values())).ctx)
    cs = ConstraintSystem(ctx)
    extra_np = {k: np.asarray(v) for k, v in (extra or {}).items()}
    check(ctx, cs, cols, tables or {}, static or {}, extra_np)
    fail = np.asarray(cs.fail)
    if success:
        if fail.any():
            i = int(np.argmax(fail))
            raise AssertionError(f"{name} {label} {i}: {cs.first_failure_message()[i]}")
    else:
        assert fail.any(), f"expected {name} circuit to fail"
