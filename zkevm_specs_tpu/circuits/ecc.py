"""ECC circuit — verifies bn254 EcAdd/EcMul/EcPairing ops for the
precompiles 0x06-0x08 (reference: src/zkevm_specs/ecc_circuit.py:1-433)."""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

from ..ops.ecc import bn254
from ..tables.schemas import EccOpTag
from ..witness.rlc import RLC


def _check_fq(value: int) -> bool:
    return value < bn254.P


def _g1(x: int, y: int) -> bn254.PointG1:
    return None if x == 0 and y == 0 else (x, y)


class EcAdd(NamedTuple):
    p: Tuple[int, int]
    q: Tuple[int, int]
    out: Tuple[int, int]


class EcMul(NamedTuple):
    p: Tuple[int, int]
    s: int
    out: Tuple[int, int]


class EcPairing(NamedTuple):
    g1_pts: List[Tuple[int, int]]
    g2_pts: List[Tuple[int, int, int, int]]  # (x2, x1, y2, y1) EVM byte order
    out: int


class EccCircuitRow:
    """One ecc-table row plus the verification chip data
    (reference EccCircuitRow :12-333)."""

    def __init__(self, row: dict, chip_points=None, pairing_points=None):
        self.row = row
        self.chip_points = chip_points        # (p0, p1, out) for add/mul
        self.pairing_points = pairing_points  # (list[g1], list[g2 FQ2 pairs], out)

    @classmethod
    def assign_add(cls, p0: Tuple[int, int], p1: Tuple[int, int], out: Tuple[int, int]):
        prechecks = all(_check_fq(v) for v in (*p0, *p1))
        valid_points = bn254.g1_is_on_curve(_g1(*p0)) and bn254.g1_is_on_curve(_g1(*p1))
        is_valid = prechecks and valid_points
        row = {
            "op_type": int(EccOpTag.Add),
            "px": p0[0], "py": p0[1], "qx": p1[0], "qy": p1[1],
            "input_rlc": 0, "out_x": out[0], "out_y": out[1],
            "is_valid": int(is_valid),
        }
        return cls(row, chip_points=(p0, p1, out))

    @classmethod
    def assign_mul(cls, p0: Tuple[int, int], s: int, out: Tuple[int, int]):
        prechecks = _check_fq(p0[0]) and _check_fq(p0[1])
        valid_point = bn254.g1_is_on_curve(_g1(*p0))
        is_valid = prechecks and valid_point
        row = {
            "op_type": int(EccOpTag.Mul),
            "px": p0[0], "py": p0[1], "qx": s, "qy": 0,
            "input_rlc": 0, "out_x": out[0], "out_y": out[1],
            "is_valid": int(is_valid),
        }
        return cls(row, chip_points=(p0, (s, 0), out))

    @classmethod
    def assign_pairing(cls, pts: List[Tuple[int, int, int, int, int, int]], out: int,
                       keccak_randomness: int):
        g1s, g2s = [], []
        is_valid = True
        input_bytes = bytearray()
        for (p_x, p_y, q_x2, q_x1, q_y2, q_y1) in pts:
            g1 = _g1(p_x, p_y)
            g2 = (
                None
                if q_x1 == q_x2 == q_y1 == q_y2 == 0
                else (bn254.FQ2([q_x1, q_x2]), bn254.FQ2([q_y1, q_y2]))
            )
            g1s.append(g1)
            g2s.append(g2)

            prechecks = all(_check_fq(v) for v in (p_x, p_y, q_x1, q_x2, q_y1, q_y2))
            valid_p = bn254.g1_mul(g1, bn254.R) is None
            valid_q = bn254.g2_mul(g2, bn254.R) is None if g2 is not None else True
            on_curves = bn254.g1_is_on_curve(g1) and bn254.g2_is_on_curve(g2)
            is_valid = is_valid and prechecks and on_curves and valid_p and valid_q

            for v in (p_x, p_y, q_x1, q_x2, q_y1, q_y2):
                input_bytes.extend(v.to_bytes(32, "little"))

        rlc = RLC(bytes(reversed(input_bytes)), keccak_randomness,
                  n_bytes=len(pts) * 192).expr()
        row = {
            "op_type": int(EccOpTag.Pairing),
            "px": 0, "py": 0, "qx": 0, "qy": 0,
            "input_rlc": rlc,
            # the boolean pairing result is stored in out_y (reference :224)
            "out_x": out >> 128, "out_y": out & ((1 << 128) - 1),
            "is_valid": int(is_valid),
        }
        return cls(row, pairing_points=(g1s, g2s, out))

    # -- verification ------------------------------------------------------

    def verify(self, max_add_ops: int, max_mul_ops: int, max_pairing_ops: int,
               keccak_randomness: int, counters: dict):
        op = self.row["op_type"]
        assert op in (int(EccOpTag.Add), int(EccOpTag.Mul), int(EccOpTag.Pairing)), \
            "unknown ecc op"
        assert self.row["is_valid"] in (0, 1)

        if op == int(EccOpTag.Add):
            counters["add"] += 1
            assert counters["add"] <= max_add_ops, "exceeds max number of add operations"
            self._verify_add()
        elif op == int(EccOpTag.Mul):
            counters["mul"] += 1
            assert counters["mul"] <= max_mul_ops, "exceeds max number of mul operations"
            self._verify_mul()
        else:
            counters["pairing"] += 1
            assert counters["pairing"] <= max_pairing_ops, "exceeds max number of pairings"
            self._verify_pairing(keccak_randomness)

    def _verify_add(self):
        p0, p1, out = self.chip_points
        assert self.row["input_rlc"] == 0
        result = bn254.g1_add(_g1(*p0), _g1(*p1))
        result = (0, 0) if result is None else result
        ok = result == out
        assert int(ok) == self.row["is_valid"], "ecAdd result/validity mismatch"

    def _verify_mul(self):
        p0, p1, out = self.chip_points
        assert self.row["qy"] == 0
        assert self.row["input_rlc"] == 0
        result = bn254.g1_mul(_g1(*p0), p1[0])
        result = (0, 0) if result is None else result
        ok = result == out
        assert int(ok) == self.row["is_valid"], "ecMul result/validity mismatch"

    def _verify_pairing(self, keccak_randomness: int):
        g1s, g2s, out = self.pairing_points
        assert self.row["out_x"] == out >> 128
        assert self.row["out_y"] == out & ((1 << 128) - 1)

        input_bytes = bytearray()
        for g1, g2 in zip(g1s, g2s):
            valid_p = bn254.g1_mul(g1, bn254.R) is None
            valid_q = bn254.g2_mul(g2, bn254.R) is None if g2 is not None else True
            assert valid_p and valid_q, "pairing input not in the r-order subgroup"
            p_x, p_y = g1 if g1 is not None else (0, 0)
            if g2 is None:
                q_x1 = q_x2 = q_y1 = q_y2 = 0
            else:
                q_x1, q_x2 = g2[0].c
                q_y1, q_y2 = g2[1].c
            for v in (p_x, p_y, q_x1, q_x2, q_y1, q_y2):
                input_bytes.extend(v.to_bytes(32, "little"))
        rlc = RLC(bytes(reversed(input_bytes)), keccak_randomness,
                  n_bytes=len(g1s) * 192).expr()
        assert self.row["input_rlc"] == rlc, "pairing input rlc mismatch"

        pairs = [(g1, g2) for g1, g2 in zip(g1s, g2s)]
        result = int(
            bn254.pairing_check(
                [(p, q) for p, q in pairs if True]
            )
        )
        assert result == out, "pairing result mismatch"


class EccCircuit:
    def __init__(self, max_add_ops: int, max_mul_ops: int, max_pairing_ops: int):
        self.add_ops: List[EcAdd] = []
        self.mul_ops: List[EcMul] = []
        self.pairing_ops: List[EcPairing] = []
        self.max_add_ops = max_add_ops
        self.max_mul_ops = max_mul_ops
        self.max_pairing_ops = max_pairing_ops

    def append_add(self, op: EcAdd):
        self.add_ops.append(op)

    def append_mul(self, op: EcMul):
        self.mul_ops.append(op)

    def append_pairing(self, op: EcPairing):
        self.pairing_ops.append(op)


def circuit2rows(circuit: EccCircuit, randomness_keccak: int) -> List[EccCircuitRow]:
    rows: List[EccCircuitRow] = []
    for op in circuit.add_ops:
        rows.append(EccCircuitRow.assign_add(op.p, op.q, op.out))
    for op in circuit.mul_ops:
        rows.append(EccCircuitRow.assign_mul(op.p, op.s, op.out))
    for op in circuit.pairing_ops:
        pts = [
            (g1[0], g1[1], g2[0], g2[1], g2[2], g2[3])
            for g1, g2 in zip(op.g1_pts, op.g2_pts)
        ]
        rows.append(EccCircuitRow.assign_pairing(pts, op.out, randomness_keccak))
    return rows


def ecc_table_rows(circuit: EccCircuit, randomness_keccak: int) -> List[dict]:
    """Rows for the shared columnar ecc table."""
    return [r.row for r in circuit2rows(circuit, randomness_keccak)]


def verify_circuit(circuit: EccCircuit, randomness_keccak: int) -> None:
    rows = circuit2rows(circuit, randomness_keccak)
    counters = {"add": 0, "mul": 0, "pairing": 0}
    for row in rows:
        row.verify(
            circuit.max_add_ops, circuit.max_mul_ops, circuit.max_pairing_ops,
            randomness_keccak, counters,
        )


# ---------------------------------------------------------------------------
# Production path
# ---------------------------------------------------------------------------

def ecc_kernel(circuit: EccCircuit, randomness_keccak: int):
    """Compiled ecc check for the block verifier.

    The curve arithmetic itself (bn254 add/mul/pairing, base-field math) runs
    on the host — exactly the reference's py_ecc chip boundary
    (reference ecc_circuit.py:48-333) — and each row's chip verdict ships as
    a witness hint bit; the kernel constrains every verdict bit plus the
    table-facing row shape.  Returns None when the circuit has no ops."""
    import numpy as np

    from ..dsl.cs import ConstraintSystem
    from ..dsl.value import Ctx, F
    from ..runtime.kernels import CircuitKernel

    rows = circuit2rows(circuit, randomness_keccak)
    if not rows:
        return None
    ok_bits = []
    counters = {"add": 0, "mul": 0, "pairing": 0}
    for row in rows:
        try:
            row.verify(circuit.max_add_ops, circuit.max_mul_ops,
                       circuit.max_pairing_ops, randomness_keccak, counters)
            ok_bits.append(1)
        except AssertionError:
            ok_bits.append(0)

    ctx = Ctx(np, len(rows), "eager")
    cols = {
        "op_type": F.from_ints(ctx, [r.row["op_type"] for r in rows], 8),
        "is_valid": F.from_ints(ctx, [r.row["is_valid"] for r in rows], 1),
    }
    extra = {"chip_ok": np.asarray(ok_bits, dtype=np.uint8)}

    def check_ecc(ctx: Ctx, cs: ConstraintSystem, cols, tables, static, extra):
        xp = ctx.xp
        cs.constrain_in_consts(cols["op_type"], [int(EccOpTag.Add),
                                                 int(EccOpTag.Mul),
                                                 int(EccOpTag.Pairing)], "op_type")
        cs.constrain_bool(cols["is_valid"], "is_valid")
        ok = F(ctx, xp.asarray(extra["chip_ok"]).astype(xp.uint32)[:, None], 1)
        cs.constrain_equal(ok, F.const(ctx, 1), "ecc chip verification")

    return CircuitKernel("ecc", check_ecc, cols, None, None, extra)
