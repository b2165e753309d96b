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


def make_mesh_2d(n_hosts: int, n_chips: int,
                 axes: tuple = ("hosts", "chips")):
    """hosts x chips 2-D mesh — the deployment shape for multi-host slices.

    On real hardware the leading axis crosses DCN and the trailing axis
    rides ICI, so shardings should keep high-bandwidth collectives on the
    trailing axis (tables sharded by ``chips``, halo exchange within a
    host); on the virtual CPU platform both axes are local, which is what
    the multi-host simulation tests exercise."""
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    assert len(devices) >= n_hosts * n_chips, (
        f"need {n_hosts * n_chips} devices, have {len(devices)}")
    grid = np.array(devices[: n_hosts * n_chips]).reshape(n_hosts, n_chips)
    return Mesh(grid, axes)


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
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..circuits.state import make_state_check_fn, pack_state_inputs

    cols, mpt_tree, meta = pack_state_inputs(rows, mpt_rows)
    fn = make_state_check_fn(meta)

    row_sharding = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    cols = jax.tree.map(lambda a: jax.device_put(a, row_sharding), cols)
    mpt_tree = jax.tree.map(lambda a: jax.device_put(a, repl), mpt_tree)
    return jax.jit(fn)(cols, mpt_tree)
