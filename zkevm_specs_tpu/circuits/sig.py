"""Sig circuit — verifies signature rows against the keccak table and ECDSA
(reference: src/zkevm_specs/sig_circuit.py:1-122).

TPU-native re-design: all signature rows are checked in ONE batched
constraint body (``check_signverify``) that runs eagerly (spec mode) and
compiled (production, via runtime/kernels) — the keccak(pk) link is a
columnar keccak-table lookup, the address binding is a limb decomposition,
and the pk-bytes RLC is a Horner scan.  The ECDSA verdict itself is
computed on the host (like the reference's eth_keys call inside
ECDSAVerifyChip, reference util/ec.py:59-117) and shipped as a witness hint
bit that the kernel constrains against ``is_valid``.
"""
from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Set, Tuple

import numpy as np

from ..dsl.cs import ConstraintSystem
from ..utils.typing import is_circuit_code
from ..dsl.value import Ctx, F, Word
from ..ops.ecc import secp256k1
from ..ops.keccak import keccak256
from ..tables.engine import Table
from ..tables.schemas import KECCAK_SCHEMA
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


# ---------------------------------------------------------------------------
# Batched sign-verify constraint body (shared with the tx circuit)
# ---------------------------------------------------------------------------

def build_signverify_inputs(
    ctx: Ctx,
    pub_keys: List[Tuple[int, int]],
    pub_key_hashes: List[bytes],
    recovered_addrs: List[int],
    enabled: List[int],
    msg_hashes: List[int],
    sigs: List[Tuple[int, int]],
    is_valid: List[int],
):
    """Columns + host-crypto hint arrays for ``check_signverify``."""
    n = len(pub_keys)
    cols: Dict[str, object] = {
        "pk_hash": Word.from_ints(ctx, [int.from_bytes(h, "big") for h in pub_key_hashes]),
        "recovered_addr": F.from_ints(ctx, recovered_addrs, 160),
        "enabled": F.from_ints(ctx, enabled, 1),
        "is_valid": F.from_ints(ctx, is_valid, 1),
    }
    pk_byte_cols = np.zeros((64, n), dtype=np.uint8)
    for i, pk in enumerate(pub_keys):
        pk_byte_cols[:, i] = np.frombuffer(secp256k1.pubkey_bytes(pk), dtype=np.uint8)
    # host crypto: the ECDSA verdict bits, one batched native call
    # (csrc/ec_secp256k1.c; reference chip behavior, util/ec.py:59-117)
    ecdsa_ok = np.array(
        secp256k1.verify_batch(
            [(h, r, s, pk) for h, (r, s), pk in zip(msg_hashes, sigs, pub_keys)]),
        dtype=np.uint8,
    )
    extra = {"pk_byte_cols": pk_byte_cols, "ecdsa_ok": ecdsa_ok}
    return cols, extra


@is_circuit_code
def check_signverify(ctx: Ctx, cs: ConstraintSystem, cols, tables, static, extra):
    """keccak(pk) == pk_hash via table lookup, address == pk_hash[-20:], and
    the host ECDSA verdict == is_valid — all rows at once.  Lanes with
    ``enabled == 0`` (padding) are unconstrained except for the validity bit
    (padding uses the always-valid dummy signature, reference
    tx_circuit.py:405-413)."""
    from .keccak import _horner_rlc

    xp = ctx.xp
    en = ~cols["enabled"].is_zero_mask()

    # 1. keccak(pk_bytes) == pk_hash through the keccak table
    pk_byte_cols = xp.asarray(extra["pk_byte_cols"])
    active = xp.ones(pk_byte_cols.shape, dtype=bool)
    rlc = F(ctx, _horner_rlc(ctx, pk_byte_cols, active, static["r"]), 254)
    tables["keccak"].lookup(
        cs,
        {
            "state_tag": F.const(ctx, 2),
            "input_rlc": rlc,
            "input_len": F.const(ctx, 64),
            "output": cols["pk_hash"],
        },
        enabled=en,
    )

    # 2. recovered_addr == low 20 bytes of pk_hash
    addr_hi, addr_lo = cols["recovered_addr"].split_pow2(128, 32)
    hash_hi_low32 = cols["pk_hash"].hi.split_pow2(32, 96)[1]
    cs.check(addr_lo.eq_mask(cols["pk_hash"].lo) | ~en,
             lambda: "address lo != pk_hash lo")
    cs.check(addr_hi.eq_mask(hash_hi_low32) | ~en,
             lambda: "address hi != pk_hash bytes 12..16")

    # 3. host ECDSA verdict matches the is_valid column (all lanes: padding
    # rows carry the dummy valid signature)
    ok = F(ctx, xp.asarray(extra["ecdsa_ok"]).astype(xp.uint32)[:, None], 1)
    cs.check(ok.eq_mask(cols["is_valid"]), lambda: "ecdsa validity mismatch")


def _sig_inputs(witness: Witness, ctx: Ctx):
    rows = witness.rows
    cols, extra = build_signverify_inputs(
        ctx,
        [row.pub_key for row in rows],
        [row.pub_key_hash for row in rows],
        [row.recovered_addr for row in rows],
        [1] * len(rows),
        [row.msg_hash for row in rows],
        [(row.sig_r, row.sig_s) for row in rows],
        [int(row.is_valid) for row in rows],
    )
    cols["sig_v"] = F.from_ints(ctx, [row.sig_v for row in rows], 8)
    return cols, extra


def check_sig(ctx: Ctx, cs: ConstraintSystem, cols, tables, static, extra):
    """Full sig-circuit body: v boolean + the shared sign-verify rules
    (reference sig_circuit.py Row.verify :63-105)."""
    cs.constrain_bool(cols["sig_v"], "sig_v")
    check_signverify(ctx, cs, cols, tables, static, extra)


def verify_circuit(witness: Witness, keccak_randomness: int,
                   success: bool = True) -> None:
    """Spec-mode (eager) driver with reference verdict semantics."""
    from ..runtime.kernels import run_spec

    if not witness.rows:
        return
    ctx = Ctx(np, len(witness.rows), "eager")
    cols, extra = _sig_inputs(witness, ctx)
    keccak = Table.from_rows(ctx, KECCAK_SCHEMA, witness.keccak_table.rows())
    run_spec("sig", check_sig, cols, {"keccak": keccak},
             {"r": keccak_randomness}, extra, success=success)


def sig_kernel(witness: Witness, keccak_randomness: int):
    """Production path: the same constraint body compiled to one XLA kernel."""
    from ..runtime.kernels import CircuitKernel

    if not witness.rows:
        return None
    ctx = Ctx(np, len(witness.rows), "eager")
    cols, extra = _sig_inputs(witness, ctx)
    keccak = Table.from_rows(ctx, KECCAK_SCHEMA, witness.keccak_table.rows())
    keccak.index_for(tuple(KECCAK_SCHEMA.columns))
    return CircuitKernel("sig", check_sig, cols, {"keccak": keccak},
                         {"r": keccak_randomness}, extra)
