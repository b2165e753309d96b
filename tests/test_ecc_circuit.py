"""ECC circuit conformance vectors (mirrors reference tests/test_ecc_circuit.py
scenarios)."""
import pytest

from zkevm_specs_tpu.circuits.ecc import (
    EcAdd,
    EcMul,
    EcPairing,
    EccCircuit,
    verify_circuit,
)
from zkevm_specs_tpu.ops.ecc import bn254

R_KECCAK = 0xABCDEF


def g1(k):
    p = bn254.g1_mul(bn254.G1, k)
    return p if p is not None else (0, 0)


def g2_coords(k):
    q = bn254.g2_mul(bn254.G2, k)
    if q is None:
        return (0, 0, 0, 0)
    # EVM byte order (x2, x1, y2, y1)
    return (q[0].c[1], q[0].c[0], q[1].c[1], q[1].c[0])


def test_ec_add_ok():
    c = EccCircuit(4, 4, 4)
    p, q = g1(2), g1(3)
    out = bn254.g1_add(p, q)
    c.append_add(EcAdd(p=p, q=q, out=out))
    # adding the point at infinity
    c.append_add(EcAdd(p=p, q=(0, 0), out=p))
    verify_circuit(c, R_KECCAK)


def test_ec_add_wrong_result():
    c = EccCircuit(4, 4, 4)
    p, q = g1(2), g1(3)
    out = bn254.g1_add(p, q)
    c.append_add(EcAdd(p=p, q=q, out=(out[0], out[1] + 1)))
    with pytest.raises(AssertionError):
        verify_circuit(c, R_KECCAK)


def test_ec_add_invalid_point_flagged():
    c = EccCircuit(4, 4, 4)
    bad = (1, 1)  # not on curve
    row_out = (0, 0)
    # is_valid computed as False; result must match add() outcome which will
    # differ from claimed out only if inconsistent — claim out=(0,0) but
    # add((1,1),(G)) is defined pointwise; validity flag = 0 is recorded.
    p = g1(1)
    from zkevm_specs_tpu.circuits.ecc import EccCircuitRow

    row = EccCircuitRow.assign_add(bad, p, row_out)
    assert row.row["is_valid"] == 0


def test_ec_mul_ok():
    c = EccCircuit(4, 4, 4)
    p = g1(5)
    s = 123456789
    out = bn254.g1_mul(p, s)
    c.append_mul(EcMul(p=p, s=s, out=out))
    # multiply by zero -> infinity (0,0)
    c.append_mul(EcMul(p=p, s=0, out=(0, 0)))
    verify_circuit(c, R_KECCAK)


def test_ec_mul_wrong_result():
    c = EccCircuit(4, 4, 4)
    p = g1(5)
    c.append_mul(EcMul(p=p, s=7, out=g1(36)))
    with pytest.raises(AssertionError):
        verify_circuit(c, R_KECCAK)


def test_ec_pairing_ok():
    c = EccCircuit(4, 4, 4)
    # e(2G1, 3G2) * e(-6G1, G2) == 1
    neg6 = bn254.g1_mul((bn254.G1[0], (-bn254.G1[1]) % bn254.P), 6)
    c.append_pairing(
        EcPairing(g1_pts=[g1(2), neg6], g2_pts=[g2_coords(3), g2_coords(1)], out=1)
    )
    verify_circuit(c, R_KECCAK)


def test_ec_pairing_not_one():
    c = EccCircuit(4, 4, 4)
    c.append_pairing(
        EcPairing(g1_pts=[g1(2)], g2_pts=[g2_coords(3)], out=0)
    )
    verify_circuit(c, R_KECCAK)


def test_ec_pairing_wrong_out():
    c = EccCircuit(4, 4, 4)
    c.append_pairing(
        EcPairing(g1_pts=[g1(2)], g2_pts=[g2_coords(3)], out=1)
    )
    with pytest.raises(AssertionError):
        verify_circuit(c, R_KECCAK)


def test_max_ops_exceeded():
    c = EccCircuit(1, 4, 4)
    p, q = g1(2), g1(3)
    out = bn254.g1_add(p, q)
    c.append_add(EcAdd(p=p, q=q, out=out))
    c.append_add(EcAdd(p=p, q=q, out=out))
    with pytest.raises(AssertionError):
        verify_circuit(c, R_KECCAK)
