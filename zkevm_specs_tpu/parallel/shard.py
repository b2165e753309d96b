"""Multi-chip sharding of the constraint kernels.

The scaling story of this framework (SURVEY.md §2.4, §5): witness rows are
data-parallel except for (a) sorted-adjacency checks, which need a 1-row halo
(expressed as a cyclic gather that XLA lowers to a collective-permute), and
(b) the per-lane verdict, reduced with a psum.  Rows are sharded over a 1-D
``rows`` mesh axis with jax.sharding; tables are replicated; XLA inserts the
collectives.
"""
from __future__ import annotations

from typing import List

import numpy as np


def make_mesh(n_devices: int = None, axis: str = "rows"):
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def shard_evm_group(verifier, steps, next_steps, mesh, axis: str = "rows"):
    """Run a CompiledGroupVerifier with the step batch sharded over the mesh.

    Step columns are placed with batch-dim sharding; tables replicated.  The
    verdict comes back fully replicated after the lookup gathers.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    curr_cols, next_cols, tables_tree, hints = verifier.prepare_inputs(steps, next_steps)
    row_sharding = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def put_rows(tree):
        return jax.tree.map(lambda a: jax.device_put(a, row_sharding), tree)

    curr_cols = put_rows(curr_cols)
    next_cols = put_rows(next_cols)
    hints = put_rows(hints)  # hint columns are per-lane, shard like rows
    tables_tree = jax.tree.map(lambda a: jax.device_put(a, repl), tables_tree)
    return verifier(curr_cols, next_cols, tables_tree, hints)


def sharded_state_circuit(rows: List[dict], mpt_rows: List[dict], mesh,
                          axis: str = "rows"):
    """State-circuit check with rows sharded across the mesh.

    The cyclic prev/next shifts become cross-shard gathers (halo exchange on
    ICI); the final verdict is reduced with a psum-style all-reduce that XLA
    derives from the replicated output sharding.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..circuits.state import StateRows, check_state_rows
    from ..dsl.value import Ctx
    from ..tables.engine import Table
    from ..tables.schemas import MPT_SCHEMA

    n = len(rows)
    ctx_np = Ctx(np, n, "eager")
    state_np = StateRows(ctx_np, rows)
    mpt_np = Table.from_rows(ctx_np, MPT_SCHEMA, mpt_rows)
    # build indexes eagerly so the jit only queries
    # (subset used by the storage/account mpt lookups)
    subset = tuple(MPT_SCHEMA.columns)
    mpt_np.index_for(subset)

    cols = {}
    for name in StateRows._BITS:
        cols[name] = getattr(state_np, name).limbs
    for name in StateRows._WORDS:
        w = getattr(state_np, name)
        cols[name + "_lo"] = w.lo.limbs
        cols[name + "_hi"] = w.hi.limbs
    bits = {name: getattr(state_np, name).bits for name in StateRows._BITS}
    wbits = {name: (getattr(state_np, name).lo.bits, getattr(state_np, name).hi.bits)
             for name in StateRows._WORDS}

    mpt_tree = {
        "cols": {
            c: ({"lo": v.lo.limbs, "hi": v.hi.limbs} if hasattr(v, "lo") else {"f": v.limbs})
            for c, v in mpt_np.data.items()
        },
        "fps": mpt_np._indexes[subset][0],
        "order": mpt_np._indexes[subset][1],
    }
    mpt_bits = {c: ((v.lo.bits, v.hi.bits) if hasattr(v, "lo") else v.bits)
                for c, v in mpt_np.data.items()}

    def fn(cols, mpt_tree):
        from ..dsl.value import F, Word

        jctx = Ctx(jnp, n, "jit")
        st = object.__new__(StateRows)
        st.ctx = jctx
        st.n = n
        for name in StateRows._BITS:
            setattr(st, name, F(jctx, cols[name], bits[name]))
        for name in StateRows._WORDS:
            setattr(st, name, Word(
                F(jctx, cols[name + "_lo"], wbits[name][0]),
                F(jctx, cols[name + "_hi"], wbits[name][1]),
            ))
        data = {}
        for c, arrs in mpt_tree["cols"].items():
            if "lo" in arrs:
                data[c] = Word(F(jctx, arrs["lo"], mpt_bits[c][0]), F(jctx, arrs["hi"], mpt_bits[c][1]))
            else:
                data[c] = F(jctx, arrs["f"], mpt_bits[c])
        mpt = Table(jctx, MPT_SCHEMA, data, mpt_np.n_rows)
        mpt._indexes[subset] = (mpt_tree["fps"], mpt_tree["order"])
        cs = check_state_rows(jctx, st, mpt)
        return cs.fail

    row_sharding = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    cols = jax.tree.map(lambda a: jax.device_put(a, row_sharding), cols)
    mpt_tree = jax.tree.map(lambda a: jax.device_put(a, repl), mpt_tree)
    return jax.jit(fn)(cols, mpt_tree)
