"""Keccak circuit tests — the permutation constraint kernel absent from the
reference (SURVEY.md §2.3)."""
import pytest

from zkevm_specs_tpu.circuits.keccak import verify_keccak_circuit
from zkevm_specs_tpu.witness.typing import KeccakCircuit

R = 987654321


def build_rows(datas):
    kc = KeccakCircuit()
    for d in datas:
        kc.add(d, R)
    return kc.rows


def test_keccak_circuit_ok():
    datas = [b"", b"abc", b"x" * 135, b"y" * 136, b"z" * 300]
    rows = build_rows(datas)
    verify_keccak_circuit(datas, rows, R)


def test_keccak_circuit_bad_output():
    datas = [b"abc"]
    rows = build_rows(datas)
    rows[0]["output"] ^= 1
    verify_keccak_circuit(datas, rows, R, success=False)


def test_keccak_circuit_bad_rlc():
    datas = [b"abcdef"]
    rows = build_rows(datas)
    rows[0]["input_rlc"] = (rows[0]["input_rlc"] + 1)
    verify_keccak_circuit(datas, rows, R, success=False)


def test_keccak_circuit_wrong_preimage():
    datas = [b"abc"]
    rows = build_rows(datas)
    verify_keccak_circuit([b"abd"], rows, R, success=False)
