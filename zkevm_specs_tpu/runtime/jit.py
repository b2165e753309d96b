"""Production (jit/TPU) execution path for the EVM circuit.

Spec mode evaluates gadget groups eagerly on numpy; this module compiles the
same gadget code with jax.jit for the TPU:

1. an eager *trace pass* over a representative group captures the gadget's
   control signature (branch decisions) and the static magnitude bounds of
   every step column;
2. a jitted kernel is built that replays the signature, evaluates all
   constraints/lookups as one fused XLA program over the whole batch, and
   returns the per-lane failure bits;
3. tables travel across the jit boundary as a flat pytree of limb arrays
   (sorted lookup indexes are prebuilt eagerly and shipped along).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..dsl.cs import ConstraintSystem, LaneSplit
from ..dsl.value import Ctx, F, Word
from ..evm.execution import EXECUTION_STATE_IMPL
from ..evm.instruction import Instruction
from ..evm.main import verify_step
from ..evm.step import StepState, StepStateBatch
from ..tables.container import Tables
from ..tables.engine import Schema, Table


# -- tables across the jit boundary ----------------------------------------

_TABLE_NAMES = (
    "block", "tx", "withdrawal", "bytecode", "rw", "copy",
    "keccak", "exp", "sig", "ecc", "mpt",
)


def tables_to_pytree(tables: Tables):
    tree = {}
    for name in _TABLE_NAMES:
        t: Table = getattr(tables, name)
        cols = {}
        for cname, v in t.data.items():
            if isinstance(v, Word):
                cols[cname] = {"lo": v.lo.limbs, "hi": v.hi.limbs}
            else:
                cols[cname] = {"f": v.limbs}
        # lookup indexes do NOT cross the jit boundary: compiled kernels
        # replay lookups as hinted gathers (tables/engine.py), so only the
        # raw columns ship
        tree[name] = {"cols": cols}
    return tree


def tables_meta(tables: Tables):
    meta = {}
    for name in _TABLE_NAMES:
        t: Table = getattr(tables, name)
        bits = {}
        for cname, v in t.data.items():
            if isinstance(v, Word):
                bits[cname] = (v.lo.bits, v.hi.bits)
            else:
                bits[cname] = v.bits
        meta[name] = {"n_rows": t.n_rows, "schema": t.schema, "bits": bits}
    return meta


def tables_from_pytree(ctx: Ctx, tree, meta) -> Tables:
    out = object.__new__(Tables)
    out.ctx = ctx
    from ..tables.container import fixed_tables

    out.fixed = fixed_tables()
    for name in _TABLE_NAMES:
        m = meta[name]
        cols = {}
        for cname, arrs in tree[name]["cols"].items():
            b = m["bits"][cname]
            if "lo" in arrs:
                cols[cname] = Word(F(ctx, arrs["lo"], b[0]), F(ctx, arrs["hi"], b[1]))
            else:
                cols[cname] = F(ctx, arrs["f"], b)
        t = Table(ctx, m["schema"], cols, m["n_rows"])
        setattr(out, name, t)
    return out


# -- compiled group verifier ------------------------------------------------

def _freeze(obj):
    """Recursively hashable view of meta/bits structures for cache keys."""
    if isinstance(obj, dict):
        return tuple(sorted((k, _freeze(v)) for k, v in obj.items()))
    if isinstance(obj, (list, tuple)):
        return tuple(_freeze(v) for v in obj)
    if isinstance(obj, Schema):
        return (obj.name, tuple(sorted((c, s.kind, s.bits)
                                       for c, s in obj.columns.items())))
    return obj


# process-level cache of jitted group kernels: the traced graph depends only
# on (state, flags, signature, batch, column/hint bit bounds, table meta) —
# NOT on table contents, which ship as runtime arguments — so verifiers built
# for different witnesses of the same shape share one compiled executable.
_KERNEL_CACHE: Dict[tuple, object] = {}


def _slice_lanes(tree, lane_idx):
    """Gather the leading (lane) axis of every array leaf."""
    if isinstance(tree, dict):
        return {k: _slice_lanes(v, lane_idx) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(_slice_lanes(v, lane_idx) for v in tree)
    return np.asarray(tree)[lane_idx]


class CompiledGroupVerifier:
    """Compiles one (execution_state, signature) group of the EVM circuit."""

    def __init__(self, tables_np: Tables, state, steps: List[StepState],
                 next_steps: List[StepState], is_first=False, is_last=False):
        self.state = state
        self.is_first = is_first
        self.is_last = is_last

        # 1. eager trace pass: capture signature + column bounds + indexes +
        #    the witness-hint stream itself (reused by prepare_inputs for the
        #    same steps, so the per-block host work is ONE eager pass)
        ctx = Ctx(np, len(steps), "eager")
        cs = ConstraintSystem(ctx)
        cs.hint_record, cs.hint_bits = [], []
        curr = StepStateBatch(ctx, steps, state)
        nxt = StepStateBatch(ctx, next_steps)
        self._tables_np = tables_np
        inst = Instruction(ctx, cs, tables_np.with_ctx(ctx), curr, nxt, is_first, is_last)
        verify_step(inst)  # raises LaneSplit if the group isn't uniform
        self.signature = list(cs.decisions)
        self.hint_bits = list(cs.hint_bits)
        self.curr_bits = curr.column_bits()
        self.next_bits = nxt.column_bits()
        self.tables_tree_np = tables_to_pytree(tables_np)
        self.meta = tables_meta(tables_np)
        # hint/column reuse for the build-time steps (identity-keyed)
        self._built_inputs = (steps, next_steps,
                              (curr.to_columns(), nxt.to_columns(),
                               self.tables_tree_np, list(cs.hint_record)))
        self.n_constraints = len(cs.records)
        self._build_jit(len(steps))

    @classmethod
    def from_trace(cls, tables_np: Tables, state, steps: List[StepState],
                   next_steps: List[StepState], is_first, is_last,
                   signature, trace: dict, lane_idx) -> "CompiledGroupVerifier":
        """Build WITHOUT re-running the gadget eagerly: slice the columns +
        hint stream a prior full-group pass captured (the block builder's
        signature-partition pass) down to this chunk's lanes (``lane_idx``
        indexes into the traced group's lanes; padding repeats a lane)."""
        self = object.__new__(cls)
        self.state = state
        self.is_first = is_first
        self.is_last = is_last
        self._tables_np = tables_np
        self.signature = list(signature)
        self.hint_bits = list(trace["hint_bits"])
        self.curr_bits = trace["curr_bits"]
        self.next_bits = trace["next_bits"]
        self.tables_tree_np = trace["tables_tree"]
        self.meta = trace["meta"]
        lane_idx = np.asarray(lane_idx, dtype=np.int64)
        self._built_inputs = (steps, next_steps,
                              (_slice_lanes(trace["curr_cols"], lane_idx),
                               _slice_lanes(trace["next_cols"], lane_idx),
                               self.tables_tree_np,
                               _slice_lanes(trace["hint_record"], lane_idx)))
        self.n_constraints = trace["n_constraints"]
        self._build_jit(len(steps))
        return self

    def _build_jit(self, n_steps: int):
        import jax

        sig = self.signature
        hint_bits = self.hint_bits
        meta = self.meta
        curr_bits, next_bits = self.curr_bits, self.next_bits
        st, isf, isl = self.state, self.is_first, self.is_last

        cache_key = (int(st), isf, isl, n_steps, tuple(sig),
                     _freeze(hint_bits), _freeze(curr_bits),
                     _freeze(next_bits), _freeze(meta))
        self._jit = _KERNEL_CACHE.get(cache_key)
        if self._jit is None:
            def fn(curr_cols, next_cols, tables_tree, hints):
                import jax.numpy as jnp

                batch = next(iter(curr_cols.values())).shape[0]
                jctx = Ctx(jnp, batch, "jit")
                jcs = ConstraintSystem(jctx)
                jcs.decisions = list(sig)
                jcs.hint_replay = hints
                jcs.hint_bits = hint_bits
                jtables = tables_from_pytree(jctx, tables_tree, meta)
                jcurr = StepStateBatch.from_columns(jctx, curr_cols, st, curr_bits)
                jnxt = StepStateBatch.from_columns(jctx, next_cols, None, next_bits)
                jinst = Instruction(jctx, jcs, jtables, jcurr, jnxt, isf, isl)
                verify_step(jinst)
                return jcs.fail

            self._jit = jax.jit(fn)
            _KERNEL_CACHE[cache_key] = self._jit
        self.n_hints = len(self.hint_bits)

    def prepare_inputs(self, steps: List[StepState], next_steps: List[StepState]):
        """Host hint pass: witness-hint arrays (quotients, inverses,
        keccaks …) for the batch, shipped to the device alongside the step
        columns.  For the steps the verifier was built on, the build-time
        trace pass already computed them — reuse instead of replaying the
        gadget eagerly a second time (the round-3 host-bound critical path)."""
        built_steps, built_next, built = self._built_inputs
        if steps is built_steps and next_steps is built_next:
            return built
        ctx = Ctx(np, len(steps), "eager")
        cs = ConstraintSystem(ctx)
        cs.decisions = list(self.signature)
        cs.hint_record, cs.hint_bits = [], []
        curr = StepStateBatch(ctx, steps, self.state)
        nxt = StepStateBatch(ctx, next_steps)
        inst = Instruction(ctx, cs, self._tables_np.with_ctx(ctx), curr, nxt,
                           self.is_first, self.is_last)
        verify_step(inst)
        assert len(cs.hint_record) == self.n_hints, (
            f"hint stream diverged: {len(cs.hint_record)} != {self.n_hints}")
        assert cs.hint_bits == self.hint_bits, (
            "hint magnitude bounds diverged from the compiled trace "
            "(malformed witness? verify it in spec mode instead)")
        return curr.to_columns(), nxt.to_columns(), self.tables_tree_np, cs.hint_record

    def __call__(self, curr_cols, next_cols, tables_tree, hints):
        return self._jit(curr_cols, next_cols, tables_tree, hints)
