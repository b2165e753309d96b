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


_UNPACK_CACHE: Dict[tuple, object] = {}
_STATE_FN_CACHE: Dict[tuple, object] = {}
_COMBINED_CACHE: Dict[tuple, object] = {}


def _ship_leaves(leaves: List[object]) -> List[object]:
    """Ship many host arrays to the device as ONE buffer per dtype.

    Remote backends (the axon TPU tunnel) charge a full round trip per
    array in device_put — hundreds of small leaves cost seconds while the
    actual bytes are ~MBs.  Concatenate per dtype on the host, upload the
    few megabuffers, and slice them back apart with a jitted unpacker
    (compiled once per static layout, cached): the outputs are ordinary
    device arrays.
    """
    import jax
    import jax.numpy as jnp

    buffers: Dict[str, list] = {}
    layout = []  # (buffer dtype key, offset, shape, widen-to dtype | None)
    for a in leaves:
        a = np.asarray(a)
        widen = None
        # canonical 16-bit limbs (and many index/flag columns) live in u32
        # slots: ship them at their actual magnitude and widen back inside
        # the jitted unpacker.  On the remote TPU tunnel the upload is
        # bandwidth-bound (~hundreds of MB per large block), so the 2-4x
        # byte cut is a direct cut to prepare wall time.
        if a.dtype == np.uint32 and a.size:
            m = int(a.max())
            if m < (1 << 8):
                widen, a = "uint32", a.astype(np.uint8)
            elif m < (1 << 16):
                widen, a = "uint32", a.astype(np.uint16)
        key = str(a.dtype)
        parts = buffers.setdefault(key, [])
        off = sum(p.size for p in parts)
        layout.append((key, off, a.shape, widen))
        parts.append(a.ravel())
    concat = {k: np.concatenate(v) for k, v in buffers.items()}

    sig = tuple(layout) + tuple(sorted((k, v.size) for k, v in concat.items()))
    fn = _UNPACK_CACHE.get(sig)
    if fn is None:
        lay = list(layout)

        def unpack(bufs):
            out = []
            for key, off, shape, widen in lay:
                n = int(np.prod(shape)) if shape else 1
                piece = jax.lax.dynamic_slice(bufs[key], (off,), (n,))
                if widen is not None:
                    piece = piece.astype(widen)
                out.append(piece.reshape(shape))
            return tuple(out)

        fn = jax.jit(unpack)
        _UNPACK_CACHE[sig] = fn
    dev_bufs = {k: jax.device_put(v) for k, v in concat.items()}
    return list(fn(dev_bufs))


def _partition_by_signature(
    tables: Tables,
    steps: List[StepState],
    state,
    is_first: bool,
    is_last: bool,
    idxs: List[int],
    decisions: List[bool],
    out: List[Tuple[List[int], List[bool], dict]],
    depth: int = 0,
) -> None:
    """Split a (state, flags) group into signature-uniform lane subsets by
    replaying the eager trace and recursing on LaneSplit (mirrors
    evm/main._run_group's control flow).  The successful run of each
    uniform subset is CAPTURED (columns + hint stream + bounds) so the
    chunked CompiledGroupVerifiers never replay the gadget eagerly — the
    whole per-block host cost for a group is this single pass."""
    assert depth <= 64, "lane-split recursion exceeded bound"
    ctx = Ctx(np, len(idxs), "eager")
    cs = ConstraintSystem(ctx)
    cs.decisions = list(decisions)
    cs.hint_record, cs.hint_bits = [], []
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
    trace = {
        "hint_record": list(cs.hint_record),
        "hint_bits": list(cs.hint_bits),
        "curr_cols": curr.to_columns(),
        "next_cols": nxt.to_columns(),
        "curr_bits": curr.column_bits(),
        "next_bits": nxt.column_bits(),
        "n_constraints": len(cs.records),
    }
    out.append((idxs, list(cs.decisions), trace))


class CompiledBlockVerifier:
    """Whole-block witness verification compiled to XLA kernels.

    Covers every sub-circuit of the super circuit
    (reference specs/super_circuit.md:1-41): the EVM circuit (all step
    groups), the state circuit proving the rw table, and the producer
    circuits — bytecode, keccak, copy, exp, tx, sig, pi, withdrawal, ecc —
    each compiled through runtime/kernels.CircuitKernel.  Host-side crypto
    (ECDSA, bn254 pairing) runs once at build time and ships verdict-bit
    hints, mirroring the reference's py_ecc/eth_keys chip boundary.
    """

    def __init__(
        self,
        witness: BlockWitness,
        keccak_randomness: Optional[int] = None,
        pad_pow2: bool = True,
        end_with_last_step: bool = True,
        copy_circuit=None,
        exp_circuit=None,
        signed_txs=None,
        tx_circuit_params: Optional[Tuple[int, int, int]] = None,
        k_bytecode: Optional[int] = None,
        config=None,
        min_jit_lanes: int = 4,
        max_group_lanes: int = 1 << 16,
    ):
        from ..config import DEFAULT_CONFIG
        from ..runtime.jit import CompiledGroupVerifier

        config = config or DEFAULT_CONFIG
        keccak_randomness = (config.keccak_randomness if keccak_randomness is None
                             else keccak_randomness)
        if k_bytecode is None:
            # grow k to fit the block's unrolled bytecodes (config.bytecode_k
            # is the floor; the circuit needs 2^k > total rows incl. the
            # trailing Header)
            n_rows = sum(len(bc.code) + 1 for bc in witness.bytecodes) + 1
            k_bytecode = max(config.bytecode_k, n_rows.bit_length())

        self.witness = witness
        codes = [bytes(bc.code) for bc in witness.bytecodes]
        # bytecode hashes plus any SHA3 preimages hashed during execution
        keccak_data = codes + list(getattr(witness, "sha3_preimages", []))
        keccak_rows = assign_keccak_table(keccak_data, keccak_randomness)
        copy_circuit = copy_circuit if copy_circuit is not None else witness.copy_circuit
        exp_circuit = exp_circuit if exp_circuit is not None else witness.exp_circuit
        signed_txs = signed_txs if signed_txs is not None else witness.signed_txs
        if signed_txs is not None and tx_circuit_params is None:
            # default params scale to the block (config values are floors)
            max_txs, max_cd, chain_id = config.tx_circuit_params()
            tx_circuit_params = (
                max(max_txs, len(signed_txs)),
                max(max_cd, sum(len(t.data) for t in signed_txs)),
                chain_id)

        kwargs = witness.tables_kwargs()
        if copy_circuit is not None:
            from ..witness.typing import copy_circuit_to_table

            kwargs["copy_table"] = copy_circuit_to_table(copy_circuit)
        if exp_circuit is not None:
            from ..witness.typing import exp_circuit_to_table

            kwargs["exp_table"] = exp_circuit_to_table(exp_circuit)
        if witness.ecc_circuit is not None:
            from ..circuits.ecc import ecc_table_rows

            kwargs["ecc_table"] = ecc_table_rows(witness.ecc_circuit,
                                                 keccak_randomness)
        if getattr(witness, "sig_rows", None):
            kwargs["sig_table"] = [r.table_row() for r in witness.sig_rows]
        kwargs["keccak_table"] = keccak_rows
        self.tables = Tables(**kwargs)

        # -- producer-circuit kernels (one fused XLA program each) ----------
        from ..circuits.bytecode import assign_bytecode_circuit, bytecode_kernel, unroll
        from ..circuits.copy import copy_kernel
        from ..circuits.exp import exp_kernel
        from ..circuits.keccak import keccak_kernel
        from ..circuits.super_circuit import prologue_kernel

        self.circuit_kernels: List[Tuple[str, object]] = []

        def add_kernel(name, k):
            if k is not None:
                self.circuit_kernels.append((name, k))

        # in-circuit prologue: pins rw counters 1..K to the canonical setup
        # writes and binds root values to the tx/bytecode tables
        add_kernel("prologue", prologue_kernel(witness, self.tables))

        bc_rows = assign_bytecode_circuit(
            k_bytecode, [unroll(c) for c in codes], keccak_randomness)
        add_kernel("bytecode", bytecode_kernel(bc_rows, keccak_rows,
                                               keccak_randomness))
        add_kernel("keccak", keccak_kernel(keccak_data, keccak_rows,
                                           keccak_randomness))
        if copy_circuit is not None:
            add_kernel("copy", copy_kernel(copy_circuit, self.tables,
                                           keccak_randomness))
        if exp_circuit is not None:
            add_kernel("exp", exp_kernel(exp_circuit))
        if signed_txs is not None:
            from ..circuits.sig import sig_kernel
            from ..circuits.super_circuit import sig_witness_from_txs
            from ..circuits.tx import tx_kernel, txs2witness

            max_txs, max_calldata, chain_id = tx_circuit_params
            tx_witness = txs2witness(signed_txs, chain_id, max_txs,
                                     max_calldata, keccak_randomness)
            add_kernel("tx", tx_kernel(
                tx_witness, max_txs, keccak_randomness,
                evm_callers=[tx.caller_address for tx in witness.txs]))
            add_kernel("sig", sig_kernel(
                sig_witness_from_txs(signed_txs, chain_id, keccak_randomness),
                keccak_randomness))
        if witness.ecc_circuit is not None:
            from ..circuits.ecc import ecc_kernel

            add_kernel("ecc", ecc_kernel(witness.ecc_circuit, keccak_randomness))
        if getattr(witness, "sig_rows", None):
            # sig rows from traced ecRecover precompile calls
            from ..circuits.sig import KeccakTable as SigKeccakTable
            from ..circuits.sig import Witness as SigWitness, sig_kernel
            from ..ops.ecc import secp256k1

            kt = SigKeccakTable()
            for r in witness.sig_rows:
                kt.add(secp256k1.pubkey_bytes(r.pub_key), keccak_randomness)
            add_kernel("sig_trace", sig_kernel(
                SigWitness(list(witness.sig_rows), kt), keccak_randomness))
        # pi + withdrawal run for EVERY block (reference pi_circuit.py:338
        # commits all public data unconditionally; one padding slot when the
        # block has no withdrawals)
        from ..circuits.pi import pi_kernel, public_data2witness
        from ..circuits.super_circuit import public_data_from_witness
        from ..circuits.withdrawal import withdrawal_kernel, withdrawals2witness

        n_wd = max(1, len(witness.withdrawals))
        wd_witness = withdrawals2witness(witness.withdrawals, n_wd,
                                         keccak_randomness,
                                         kwargs["block_table"])
        add_kernel("withdrawal", withdrawal_kernel(wd_witness, n_wd,
                                                   keccak_randomness))
        max_txs = len(witness.txs)
        max_calldata = max(1, sum(len(tx.call_data) for tx in witness.txs))
        pd = public_data_from_witness(witness, n_wd)
        pi_witness = public_data2witness(pd, max_txs, max_calldata, n_wd)
        add_kernel("pi", pi_kernel(pi_witness, max_txs, max_calldata, n_wd))

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
            parts: List[Tuple[List[int], List[bool], dict]] = []
            _partition_by_signature(self.tables, steps, state, is_first,
                                    is_last, idxs, [], parts)
            # bound per-kernel batch: a 100k+-step ALU block would otherwise
            # compile one giant executable per group; equal-size chunks share
            # one compiled kernel via the shape-keyed _KERNEL_CACHE.  Each
            # chunk carries (trace, local lane offsets) so its verifier can
            # slice the captured columns/hints instead of re-running eagerly.
            chunked: List[Tuple[List[int], List[bool], dict, int]] = []
            for sub_idxs, signature, trace in parts:
                for i in range(0, len(sub_idxs), max_group_lanes):
                    chunked.append((sub_idxs[i:i + max_group_lanes],
                                    signature, trace, i))
            for sub_idxs, signature, trace, local0 in chunked:
                n_real = len(sub_idxs)
                # scheduler policy: only regular subgroups with enough lanes
                # earn an XLA program — tiny irregular subgroups (1-lane
                # CALL_OP signature variants etc.) verify eagerly on the
                # host, which is both faster (compiling a 1-lane program
                # costs orders of magnitude more than evaluating it) and
                # bounds the number of live compiled executables (XLA:CPU's
                # JIT code arena exhausts after ~70 large programs per
                # process)
                if n_real < min_jit_lanes:
                    self.groups.append({
                        "state": state, "is_first": is_first,
                        "is_last": is_last, "idxs": sub_idxs,
                        "curr": [steps[i] for i in sub_idxs],
                        "next": [steps[i + 1] for i in sub_idxs],
                        "signature": signature, "verifier": None,
                    })
                    continue
                n_padded = _next_pow2(n_real) if pad_pow2 else n_real
                padded = sub_idxs + [sub_idxs[0]] * (n_padded - n_real)
                curr = [steps[i] for i in padded]
                nxt = [steps[i + 1] for i in padded]
                if "tables_tree" not in trace:
                    trace["tables_tree"] = self._tables_tree()
                    trace["meta"] = self._tables_meta()
                # lanes of this chunk within the traced part, padding = the
                # chunk's first lane repeated
                lane_idx = (list(range(local0, local0 + n_real))
                            + [local0] * (n_padded - n_real))
                verifier = CompiledGroupVerifier.from_trace(
                    self.tables, state, curr, nxt, is_first, is_last,
                    signature, trace, lane_idx)
                self.groups.append({
                    "state": state, "is_first": is_first, "is_last": is_last,
                    "idxs": sub_idxs, "curr": curr, "next": nxt,
                    "signature": signature, "verifier": verifier,
                })

        # state circuit over the rw table
        ops = rw_rows_to_state_ops(witness.rw.rws)
        self._state_rows = assign_state_circuit(ops)
        self._state_mpt = mpt_table_from_ops(ops)

    def _tables_tree(self):
        if not hasattr(self, "_tables_tree_cached"):
            from .jit import tables_to_pytree

            self._tables_tree_cached = tables_to_pytree(self.tables)
        return self._tables_tree_cached

    def _tables_meta(self):
        if not hasattr(self, "_tables_meta_cached"):
            from .jit import tables_meta

            self._tables_meta_cached = tables_meta(self.tables)
        return self._tables_meta_cached

    # -- two-phase execution -------------------------------------------------

    def prepare(self):
        """Host pass: hint regeneration for every group + state-circuit
        packing + sub-circuit kernel inputs; ships everything to the device.

        Uploads are deduplicated by host-array identity (every group's args
        embed the SAME table pytree, whose leaves are shared numpy arrays)
        and shipped in ONE batched device_put — on a remote TPU each
        separate put pays a full round trip, which would otherwise dominate
        the prepare pass (hundreds of leaves x link RTT)."""
        import jax

        host_groups = []
        for g in self.groups:
            if g["verifier"] is None:
                host_groups.append(None)  # eager-scheduled tiny subgroup
                continue
            host_groups.append(g["verifier"].prepare_inputs(g["curr"], g["next"]))
        if not hasattr(self, "_state_prepared"):
            cols, mpt_tree, meta = pack_state_inputs(self._state_rows,
                                                     self._state_mpt)
            # process-level jit cache: same-shaped blocks (same meta) share
            # one compiled state program across verifier instances
            from .jit import _freeze

            key = _freeze(meta)
            fn = _STATE_FN_CACHE.get(key)
            if fn is None:
                fn = jax.jit(make_state_check_fn(meta))
                _STATE_FN_CACHE[key] = fn
            self._state_prepared = (cols, mpt_tree, fn)
        cols, mpt_tree, state_fn = self._state_prepared
        host_state = (cols, mpt_tree)

        host_circuits = [(name, k, k.args) for name, k in self.circuit_kernels]

        unique: Dict[int, object] = {}

        def collect(tree):
            for leaf in jax.tree.leaves(tree):
                unique.setdefault(id(leaf), leaf)

        for args in host_groups:
            if args is not None:
                collect(args)
        collect(host_state)
        for _n, _k, args in host_circuits:
            collect(args)
        keys = list(unique)
        dev_by_id = dict(zip(keys, _ship_leaves([unique[k] for k in keys])))

        def remap(tree):
            return jax.tree.map(lambda a: dev_by_id[id(a)], tree)

        prepared = [None if args is None else remap(args)
                    for args in host_groups]
        state_args = remap(host_state)
        circuits = [(name, k, remap(args)) for name, k, args in host_circuits]
        return {"groups": prepared, "state_fn": state_fn,
                "state_args": state_args, "circuits": circuits}

    def make_combined(self, prepared, max_fused: Optional[int] = None):
        """Fuse the compiled checks — all jit-scheduled EVM groups, the
        state circuit and the producer-circuit kernels — into a small
        number of jitted programs returning all verdict vectors.

        On a remote TPU each separate kernel launch pays a link round trip
        (~10-25 ms), so the per-kernel path's device time is launch-count
        bound; fusing collapses it to ~one RTT + compute.  On TPU
        everything fuses into ONE program.  On XLA:CPU the fusion is
        chunked (``max_fused`` inner kernels per program, default 8):
        one monolithic CPU module takes minutes of LLVM codegen, exceeds
        the 60s persistent-cache write guard (so it would recompile every
        process), and enough of them abort the JIT code arena — the
        failure mode behind the round-3 whole-suite crash."""
        import jax

        import jax.numpy as jnp

        gfns = [g["verifier"]._jit.__wrapped__ for g in self.groups
                if g["verifier"] is not None]
        state_inner = prepared["state_fn"].__wrapped__
        circ_inners = [k._jit.__wrapped__ for _n, k, _a in prepared["circuits"]]
        group_args = [a for a in prepared["groups"] if a is not None]
        circuit_args = [a for _n, _k, a in prepared["circuits"]]

        # flatten every (fn, args) pair into one schedule
        units = (list(zip(gfns, group_args))
                 + [(state_inner, prepared["state_args"])]
                 + list(zip(circ_inners, circuit_args)))
        if max_fused is None:
            max_fused = (8 if jax.devices()[0].platform == "cpu"
                         else len(units))
        chunks = [units[i:i + max_fused]
                  for i in range(0, len(units), max_fused)]

        jfns_and_args = []
        for chunk in chunks:
            fns = [f for f, _ in chunk]
            args = [a for _, a in chunk]
            # same-shaped blocks resolve to the SAME cached inner functions
            # (runtime/jit._KERNEL_CACHE etc.), so their ids key one shared
            # compiled program across verifier instances — a fresh block
            # pays zero combined-pass recompiles
            key = tuple(id(f) for f in fns)
            jfn = _COMBINED_CACHE.get(key)
            if jfn is None:
                def combined(args_list, fns=fns):
                    outs = [fn(*a) for fn, a in zip(fns, args_list)]
                    # one flat verdict vector per chunk: a single
                    # device->host transfer fetches its fail bits
                    return jnp.concatenate(
                        [o.ravel().astype(jnp.uint8) for o in outs])

                jfn = jax.jit(combined)
                _COMBINED_CACHE[key] = jfn
            jfns_and_args.append((jfn, args))
        return jfns_and_args

    def run_device_combined(self, prepared, jfn_and_args=None):
        """Fused-launch, single-fetch-per-chunk device pass (see
        make_combined); identical verdict semantics to run_device."""
        if jfn_and_args is None:
            jfn_and_args = self.make_combined(prepared)
        # launch every chunk asynchronously, then fetch
        outs = [jfn(args) for jfn, args in jfn_and_args]
        flat = np.concatenate([np.asarray(o) for o in outs])
        failures: Dict[object, bool] = {}
        off = 0
        for g in self.groups:
            if g["verifier"] is None:
                fail = self._run_eager_group(g)
            else:
                n = len(g["curr"])
                fail = flat[off:off + n]
                off += n
            for lane, i in enumerate(g["idxs"]):
                if fail[lane]:
                    failures[i] = True
        n_state = len(self._state_rows)
        for r in np.nonzero(flat[off:off + n_state])[0]:
            failures[("state", int(r))] = True
        off += n_state
        for name, k, _a in prepared["circuits"]:
            for r in np.nonzero(flat[off:off + k.n])[0]:
                failures[(name, int(r))] = True
            off += k.n
        return failures

    def run_device(self, prepared):
        """Device-only pass: every compiled kernel over its shipped inputs.
        Returns {step_index | ('state', row) | (circuit, row): failed}.
        Per-kernel wall clock accumulates in runtime.profiling.STATS."""
        from .profiling import STATS

        outs = []
        for g, args in zip(self.groups, prepared["groups"]):
            # tiny irregular subgroups verify eagerly on the host (scheduler
            # policy above); label them host: so device_s stays honest
            label = ("host:" if g["verifier"] is None else "evm:") \
                + g["state"].name
            with STATS.timed(label):
                if g["verifier"] is None:
                    outs.append(self._run_eager_group(g))
                else:
                    outs.append(g["verifier"](*args))
        with STATS.timed("state"):
            state_out = prepared["state_fn"](*prepared["state_args"])
        circuit_outs = []
        for name, kernel, args in prepared["circuits"]:
            with STATS.timed(name):
                circuit_outs.append((name, kernel(args)))

        failures: Dict[object, bool] = {}
        for g, out in zip(self.groups, outs):
            fail = np.asarray(out)
            for lane, i in enumerate(g["idxs"]):  # padding lanes ignored
                if fail[lane]:
                    failures[i] = True
        sfail = np.asarray(state_out)
        for r in np.nonzero(sfail)[0]:
            failures[("state", int(r))] = True
        for name, out in circuit_outs:
            fail = np.asarray(out)
            for r in np.nonzero(fail)[0]:
                failures[(name, int(r))] = True
        return failures

    def verify(self) -> None:
        failures = self.run_device(self.prepare())
        if failures:
            step_fails = sorted(k for k in failures if isinstance(k, int))
            row_fails = sorted((k for k in failures if isinstance(k, tuple)),
                               key=str)
            raise AssertionError(
                f"block verification failed: steps {step_fails[:8]}, "
                f"circuit rows {row_fails[:8]}")

    def _run_eager_group(self, g) -> np.ndarray:
        """Host evaluation of a tiny subgroup (same constraint body as the
        compiled path; per-lane fail bits)."""
        ctx = Ctx(np, len(g["idxs"]), "eager")
        cs = ConstraintSystem(ctx)
        cs.decisions = list(g["signature"])
        curr = StepStateBatch(ctx, g["curr"], g["state"])
        nxt = StepStateBatch(ctx, g["next"])
        inst = Instruction(ctx, cs, self.tables.with_ctx(ctx), curr, nxt,
                           g["is_first"], g["is_last"])
        try:
            verify_step(inst)
        except LaneSplit:
            raise AssertionError(
                "signature replay diverged for an eager-scheduled subgroup")
        return np.asarray(cs.fail)

    @property
    def n_constraints(self) -> int:
        return sum(g["verifier"].n_constraints * len(g["idxs"])
                   for g in self.groups if g["verifier"] is not None)
