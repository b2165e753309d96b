"""Sig circuit — verifies signature rows against the keccak table and ECDSA
(reference: src/zkevm_specs/sig_circuit.py:1-122).

The ECDSA check itself is host-side (like the reference's eth_keys call);
the table-facing columns feed the sig_table consumed by the ecRecover
precompile gadget.
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Set, Tuple

from ..ops.ecc import secp256k1
from ..ops.keccak import keccak256
from ..witness.rlc import RLC, linear_combine_bytes


class KeccakTable:
    """(is_enabled, input_rlc, input_len, output) — mirrors the reference's
    local keccak table (tx_circuit.py:38-61)."""

    def __init__(self):
        self.table: Set[Tuple[int, int, int, int]] = set()
        self.table.add((0, 0, 0, 0))

    def add(self, data: bytes, keccak_randomness: int):
        output = int.from_bytes(keccak256(data), "big")
        self.table.add(
            (
                1,
                RLC(bytes(reversed(data)), keccak_randomness, n_bytes=64).expr(),
                len(data),
                output,
            )
        )

    def lookup(self, is_enabled: int, input_rlc: int, input_len: int, output: int, assert_msg: str):
        assert (is_enabled, input_rlc, input_len, output) in self.table, (
            f"{assert_msg}: keccak lookup failed"
        )

    def rows(self) -> List[dict]:
        """Rows for the shared columnar keccak table schema."""
        return [
            {"state_tag": 2 if en else 0, "input_rlc": rlc, "input_len": ln, "output": out}
            for (en, rlc, ln, out) in self.table
        ]


class SigRow:
    """One sig-circuit row (reference sig_circuit.py Row)."""

    def __init__(self, pub_key: Tuple[int, int], msg_hash: int,
                 sig_v: int, sig_r: int, sig_s: int, is_valid: bool):
        self.pub_key = pub_key
        self.msg_hash = msg_hash
        self.sig_v = sig_v
        self.sig_r = sig_r
        self.sig_s = sig_s
        pk_bytes = secp256k1.pubkey_bytes(pub_key)
        self.pub_key_hash = keccak256(pk_bytes)
        self.recovered_addr = int.from_bytes(self.pub_key_hash[-20:], "big")
        self.is_valid = is_valid

    @classmethod
    def assign(cls, signature: Tuple[int, int, int], pub_key: Tuple[int, int],
               msg_hash: bytes, is_valid: bool = True):
        v, r, s_ = signature
        return cls(pub_key, int.from_bytes(msg_hash, "big"), v, r, s_, is_valid)

    def verify(self, keccak_table: KeccakTable, keccak_randomness: int, assert_msg: str):
        # 1. v is 0 or 1
        assert self.sig_v in (0, 1), f"{assert_msg}: v not boolean"

        # 2. keccak(pub_key_bytes) == pub_key_hash via keccak table
        pk_bytes = secp256k1.pubkey_bytes(self.pub_key)
        keccak_table.lookup(
            1,
            RLC(bytes(reversed(pk_bytes)), keccak_randomness, n_bytes=64).expr(),
            64,
            int.from_bytes(self.pub_key_hash, "big"),
            assert_msg,
        )

        # 3. low 20 bytes of pub_key_hash == recovered_addr
        addr = int.from_bytes(self.pub_key_hash[-20:], "big")
        assert addr == self.recovered_addr, f"{assert_msg}: address mismatch"

        # 4+5. ECDSA verification matches is_valid
        ok = secp256k1.verify(self.msg_hash, self.sig_r, self.sig_s, self.pub_key)
        assert ok == self.is_valid, f"{assert_msg}: ecdsa validity mismatch"

    def table_row(self) -> dict:
        return {
            "msg_hash": self.msg_hash,
            "sig_v": self.sig_v,
            "sig_r": self.sig_r,
            "sig_s": self.sig_s,
            "recovered_addr": self.recovered_addr,
            "is_valid": int(self.is_valid),
        }


class Witness(NamedTuple):
    rows: List[SigRow]
    keccak_table: KeccakTable


def verify_circuit(witness: Witness, keccak_randomness: int) -> None:
    for i, row in enumerate(witness.rows):
        row.verify(witness.keccak_table, keccak_randomness, f"Constraints failed at row = {i}")
