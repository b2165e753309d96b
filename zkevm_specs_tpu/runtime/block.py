"""Compiled whole-block verification — the production super circuit.

``verify_super_circuit`` (circuits/super_circuit.py) checks a block witness
eagerly on numpy (spec mode).  ``CompiledBlockVerifier`` lowers the same
check onto the TPU:

1. steps are grouped by (execution_state, is_first, is_last) exactly as in
   evm/main.verify_steps;
2. each group is partitioned into *signature-uniform* subgroups with the
   same LaneSplit mechanism the eager runner uses (dsl/cs.py), so every
   subgroup compiles to one fused XLA kernel via CompiledGroupVerifier;
3. subgroups are padded (lane 0 replicated) to power-of-2 batch sizes to
   bound the number of distinct compiled shapes;
4. the state circuit proving the rw table runs as its own jitted kernel
   (circuits/state.pack_state_inputs / make_state_check_fn);
5. verdicts come back as per-lane failure bits; `verify()` raises on any.

The host-side hint pass (CompiledGroupVerifier.prepare_inputs) regenerates
witness hints per batch; ``run_device()`` times the device-only part so the
bench can report both end-to-end and device-kernel throughput.

Reference parity: the verdict is identical to evm/main.verify_steps +
circuits/state.verify_state_rows over the same witness (tests/test_block_jit.py).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..circuits.bytecode import assign_keccak_table
from ..circuits.state import (
    assign_state_circuit,
    make_state_check_fn,
    mpt_table_from_ops,
    pack_state_inputs,
)
from ..circuits.super_circuit import rw_rows_to_state_ops
from ..dsl.cs import ConstraintSystem, LaneSplit
from ..dsl.value import Ctx
from ..evm.execution import EXECUTION_STATE_IMPL
from ..evm.instruction import Instruction
from ..evm.main import DUMMY_STEP_STATE, verify_step
from ..evm.step import StepState, StepStateBatch
from ..tables.container import Tables
from ..witness.tracer import BlockWitness


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _partition_by_signature(
    tables: Tables,
    steps: List[StepState],
    state,
    is_first: bool,
    is_last: bool,
    idxs: List[int],
    decisions: List[bool],
    out: List[Tuple[List[int], List[bool]]],
    depth: int = 0,
) -> None:
    """Split a (state, flags) group into signature-uniform lane subsets by
    replaying the eager trace and recursing on LaneSplit (mirrors
    evm/main._run_group's control flow, but only collects the partition)."""
    assert depth <= 64, "lane-split recursion exceeded bound"
    ctx = Ctx(np, len(idxs), "eager")
    cs = ConstraintSystem(ctx)
    cs.decisions = list(decisions)
    curr = StepStateBatch(ctx, [steps[i] for i in idxs], state)
    nxt = StepStateBatch(ctx, [steps[i + 1] for i in idxs])
    inst = Instruction(ctx, cs, tables.with_ctx(ctx), curr, nxt, is_first, is_last)
    try:
        verify_step(inst)
    except LaneSplit as split:
        taken = [i for i, m in zip(idxs, split.mask) if m]
        not_taken = [i for i, m in zip(idxs, split.mask) if not m]
        prefix = list(cs.decisions[: cs._decision_idx])
        _partition_by_signature(tables, steps, state, is_first, is_last,
                                taken, prefix, out, depth + 1)
        _partition_by_signature(tables, steps, state, is_first, is_last,
                                not_taken, prefix, out, depth + 1)
        return
    out.append((idxs, list(cs.decisions)))


class CompiledBlockVerifier:
    """Whole-block witness verification compiled to XLA kernels.

    Covers the EVM circuit (all step groups) and the state circuit proving
    the rw table — the row-dominant sub-circuits.  The remaining producer
    circuits (bytecode/keccak/copy/exp/tx) are checked by
    circuits/super_circuit.verify_super_circuit in spec mode; use both for
    full coverage until those kernels are compiled too.
    """

    def __init__(
        self,
        witness: BlockWitness,
        keccak_randomness: int = 0x64,
        pad_pow2: bool = True,
        end_with_last_step: bool = True,
    ):
        from ..runtime.jit import CompiledGroupVerifier

        self.witness = witness
        kwargs = witness.tables_kwargs()
        kwargs["keccak_table"] = assign_keccak_table(
            [bytes(bc.code) for bc in witness.bytecodes], keccak_randomness)
        self.tables = Tables(**kwargs)

        steps = list(witness.steps)
        if end_with_last_step:
            steps.append(DUMMY_STEP_STATE)
        self._steps = steps
        n_pairs = len(steps) - 1

        groups: Dict[Tuple[object, bool, bool], List[int]] = {}
        for i in range(n_pairs):
            key = (steps[i].execution_state, False,
                   end_with_last_step and i == n_pairs - 1)
            groups.setdefault(key, []).append(i)

        # signature-uniform subgroups, then one compiled verifier per
        # (state, flags, signature, padded batch size)
        self.groups: List[dict] = []
        for (state, is_first, is_last), idxs in groups.items():
            if state not in EXECUTION_STATE_IMPL:
                raise NotImplementedError(f"no gadget for {state!r}")
            parts: List[Tuple[List[int], List[bool]]] = []
            _partition_by_signature(self.tables, steps, state, is_first,
                                    is_last, idxs, [], parts)
            for sub_idxs, signature in parts:
                n_real = len(sub_idxs)
                n_padded = _next_pow2(n_real) if pad_pow2 else n_real
                padded = sub_idxs + [sub_idxs[0]] * (n_padded - n_real)
                curr = [steps[i] for i in padded]
                nxt = [steps[i + 1] for i in padded]
                verifier = CompiledGroupVerifier(
                    self.tables, state, curr, nxt, is_first, is_last)
                self.groups.append({
                    "state": state, "is_first": is_first, "is_last": is_last,
                    "idxs": sub_idxs, "curr": curr, "next": nxt,
                    "signature": signature, "verifier": verifier,
                })

        # state circuit over the rw table
        ops = rw_rows_to_state_ops(witness.rw.rws)
        self._state_rows = assign_state_circuit(ops)
        self._state_mpt = mpt_table_from_ops(ops)

    # -- two-phase execution -------------------------------------------------

    def prepare(self):
        """Host pass: hint regeneration for every group + state-circuit
        packing; ships everything to the device."""
        import jax

        prepared = []
        for g in self.groups:
            args = g["verifier"].prepare_inputs(g["curr"], g["next"])
            prepared.append(jax.device_put(args))
        cols, mpt_tree, meta = pack_state_inputs(self._state_rows, self._state_mpt)
        state_fn = jax.jit(make_state_check_fn(meta))
        state_args = jax.device_put((cols, mpt_tree))
        return {"groups": prepared, "state_fn": state_fn, "state_args": state_args}

    def run_device(self, prepared):
        """Device-only pass: every compiled kernel over its shipped inputs.
        Returns {step_index | ('state', row): failed} for real lanes."""
        outs = []
        for g, args in zip(self.groups, prepared["groups"]):
            outs.append(g["verifier"](*args))
        state_out = prepared["state_fn"](*prepared["state_args"])

        failures: Dict[object, bool] = {}
        for g, out in zip(self.groups, outs):
            fail = np.asarray(out)
            for lane, i in enumerate(g["idxs"]):  # padding lanes ignored
                if fail[lane]:
                    failures[i] = True
        sfail = np.asarray(state_out)
        for r in np.nonzero(sfail)[0]:
            failures[("state", int(r))] = True
        return failures

    def verify(self) -> None:
        failures = self.run_device(self.prepare())
        if failures:
            step_fails = sorted(k for k in failures if isinstance(k, int))
            row_fails = sorted(k[1] for k in failures if isinstance(k, tuple))
            raise AssertionError(
                f"block verification failed: steps {step_fails[:8]}, "
                f"state rows {row_fails[:8]}")

    @property
    def n_constraints(self) -> int:
        return sum(g["verifier"].n_constraints * len(g["idxs"]) for g in self.groups)
