"""Typed circuit-capacity configuration.

The reference passes capacities as loose function parameters (MAX_TXS,
MAX_CALLDATA_BYTES, ... — SURVEY.md §5 "the new build should make these a
single typed config object")."""
from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class CircuitConfig:
    # tx circuit (reference tx_circuit.py:253-258)
    max_txs: int = 2
    max_calldata_bytes: int = 64
    # withdrawal circuit (reference withdrawal_circuit.py:128)
    max_withdrawals: int = 5
    # bytecode circuit table size 2^k (reference bytecode_circuit.py:104-106)
    bytecode_k: int = 10
    # exp circuit step budget (reference evm_circuit/typing.py:873)
    max_exp_steps: int = 100
    # ecc circuit op budgets (reference ecc_circuit.py:363-374)
    max_add_ops: int = 4
    max_mul_ops: int = 4
    max_pairing_ops: int = 4
    # chain parameters
    chain_id: int = 1
    # randomness (tests pin these like the reference, pi_circuit.py:834-836)
    keccak_randomness: int = 0x64

    def tx_circuit_params(self):
        return (self.max_txs, self.max_calldata_bytes, self.chain_id)


DEFAULT_CONFIG = CircuitConfig()
