"""Analytic communication-volume model for the sharded block verifier.

The >85% weak-scaling BASELINE target cannot be measured in this
environment (one real chip; the virtual CPU mesh exposes core contention,
not interconnect behavior — SCALING.md).  This module is the analytic leg:
given a traced block witness and a mesh size it computes, from the same
quantities the sharded paths actually move (parallel/block_shard.py,
parallel/logup_shard.py, parallel/shard.py), the cross-device bytes per
verification pass and the per-device compute, and derives the
compute-to-communication ratio that bounds achievable weak-scaling
efficiency.

Run it:

    python -m zkevm_specs_tpu.parallel.comm_model

Model legs (all per verification pass of one block):

- EVM groups: step/hint columns row-sharded, tables replicated -> the
  only cross-device traffic is the per-lane verdict gather (1 B/lane).
- state circuit: a 1-row halo per shard boundary (the sorted-adjacency
  constraints need each shard's left neighbor row) + 1 B/row verdicts.
- logUp lookup families: one 17-limb partial-sum psum per side per
  family, independent of table size — 2 * 68 B per family.
- producer circuits: row-sharded ones contribute verdict bytes; the
  small replicated ones cost zero collectives.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict

# bytes per u32 limb-column entry in a packed state row (31 sort limbs +
# value/aux columns; circuits/state.py pack_state_inputs)
STATE_ROW_BYTES = 60 * 4
# one logUp partial sum: 17 u32 limbs (widened 16-limb Fr sum), both the
# query side and the table side are psum'd (parallel/logup_shard.py)
LOGUP_PSUM_BYTES = 2 * 17 * 4
# u32 VPU ops per batched Fr mul (256-term schoolbook conv + 2 Barrett
# convs + carry chains; ops/limbs.py mul + ops/fr.py reduce_wide)
U32_OPS_PER_FR_MUL = 1700
# average Fr muls per constraint eval across the EVM gadget corpus
# (bench.py flagship-kernel cost analysis puts the ADD-group kernel at
# ~1.8k flops/lane/constraint on XLA's count; 2 is the conservative
# per-constraint mul count used for the analytic bound)
FR_MULS_PER_CONSTRAINT = 2


@dataclass
class CommModel:
    n_devices: int
    n_steps: int
    n_rw_rows: int
    n_constraints_per_step: int
    n_logup_families: int
    producer_rows: Dict[str, int] = field(default_factory=dict)

    # -- communication legs (bytes per pass) -------------------------------

    @property
    def evm_verdict_bytes(self) -> int:
        return self.n_steps  # 1 B/lane gathered to host

    @property
    def state_halo_bytes(self) -> int:
        return (self.n_devices - 1) * STATE_ROW_BYTES + self.n_rw_rows

    @property
    def logup_bytes(self) -> int:
        return self.n_logup_families * LOGUP_PSUM_BYTES * self.n_devices

    @property
    def producer_verdict_bytes(self) -> int:
        return sum(self.producer_rows.values())

    @property
    def total_comm_bytes(self) -> int:
        return (self.evm_verdict_bytes + self.state_halo_bytes
                + self.logup_bytes + self.producer_verdict_bytes)

    # -- compute ------------------------------------------------------------

    @property
    def total_u32_ops(self) -> float:
        evm = (self.n_steps * self.n_constraints_per_step
               * FR_MULS_PER_CONSTRAINT * U32_OPS_PER_FR_MUL)
        state = self.n_rw_rows * 40 * U32_OPS_PER_FR_MUL  # ~40 muls/row
        return float(evm + state)

    @property
    def ops_per_device(self) -> float:
        return self.total_u32_ops / self.n_devices

    @property
    def compute_to_comm_ratio(self) -> float:
        """u32 ops per cross-device byte — the quantity that bounds weak
        scaling: efficiency ~ 1 / (1 + (bytes/B_net) / (ops/F_chip))."""
        return self.total_u32_ops / max(1, self.total_comm_bytes)

    def predicted_weak_efficiency(self, chip_u32_ops_per_s: float = 7.1e12,
                                  ici_bytes_per_s: float = 4.5e10,
                                  latency_s: float = 5e-6,
                                  n_collectives: int = 40) -> float:
        """Roofline-style bound: compute time vs (comm volume + latency).

        Defaults: v5e VPU integer peak (bench.py roofline), ~45 GB/s
        usable per-direction ICI per chip, 5 us per psum/gather launch.
        """
        t_compute = self.ops_per_device / chip_u32_ops_per_s
        t_comm = (self.total_comm_bytes / self.n_devices) / ici_bytes_per_s
        t_lat = latency_s * n_collectives
        return t_compute / (t_compute + t_comm + t_lat)


def model_from_witness(witness, n_devices: int,
                       n_logup_families: int = 10) -> CommModel:
    """Build the model from a traced BlockWitness's real dimensions."""
    producer_rows = {
        "bytecode": sum(len(bc.code) + 1 for bc in witness.bytecodes),
        "copy": len(witness.copy_circuit.rows) if witness.copy_circuit else 0,
        "exp": len(witness.exp_circuit.rows) if witness.exp_circuit else 0,
        "tx": len(witness.txs),
        "withdrawal": max(1, len(witness.withdrawals)),
    }
    return CommModel(
        n_devices=n_devices,
        n_steps=len(witness.steps),
        n_rw_rows=len(witness.rw.rws),
        n_constraints_per_step=29,  # measured ADD-group kernel density
        n_logup_families=n_logup_families,
        producer_rows=producer_rows,
    )


def main() -> None:
    import json

    from ..witness.tracer import trace_block
    from ..witness.typing import Block, Bytecode, Transaction

    # a representative step-dense block (scaled-down ALU mix)
    txs = []
    for i in range(4):
        bc = Bytecode()
        for j in range(500):
            bc.push1(j & 0xFF).push1((j + 1) & 0xFF).add().pop()
        bc.stop()
        txs.append((Transaction(id=i + 1, gas=50000, gas_price=int(2e9),
                                caller_address=0xFE,
                                callee_address=0xFF + i), bc))
    w = trace_block(Block(base_fee=int(1e9)), txs)
    base = model_from_witness(w, 1)

    def row(m, label):
        print(json.dumps({
            "workload": label,
            "devices": m.n_devices,
            "steps": m.n_steps,
            "rw_rows": m.n_rw_rows,
            "comm_bytes": m.total_comm_bytes,
            "u32_ops_per_device": round(m.ops_per_device),
            "ops_per_comm_byte": round(m.compute_to_comm_ratio, 1),
            "predicted_efficiency": round(m.predicted_weak_efficiency(), 4),
        }))

    # strong scaling of the small traced block: latency-bound at high N —
    # this is why small blocks should NOT be spread across many chips
    for n in (2, 8, 64):
        row(model_from_witness(w, n), "traced-8k-steps (strong)")

    # the BASELINE >85% target is WEAK scaling of 1M-gas blocks: one
    # ~350k-step ALU block per device-group, dimensions scaled from the
    # traced block's measured step/rw/copy ratios
    scale = 352_000 / base.n_steps
    for n in (2, 8, 64):
        m = CommModel(
            n_devices=n,
            n_steps=int(base.n_steps * scale) * n,
            n_rw_rows=int(base.n_rw_rows * scale) * n,
            n_constraints_per_step=base.n_constraints_per_step,
            n_logup_families=base.n_logup_families,
            producer_rows={k: v * n for k, v in base.producer_rows.items()},
        )
        row(m, "1M-gas-ALU-per-device (weak)")


if __name__ == "__main__":
    main()
