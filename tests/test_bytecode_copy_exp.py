"""Bytecode / Copy / Exp standalone circuit vectors (mirrors reference
tests/test_bytecode_circuit.py and the copy/exp coverage in tests/evm/)."""
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))

from zkevm_specs_tpu.circuits.bytecode import (
    assign_bytecode_circuit,
    assign_keccak_table,
    unroll,
    verify_bytecode_circuit,
)
from zkevm_specs_tpu.circuits.copy import verify_copy_table
from zkevm_specs_tpu.circuits.exp import verify_exp_circuit
from zkevm_specs_tpu.evm import (
    Block,
    Bytecode,
    CopyCircuit,
    CopyDataTypeTag,
    ExpCircuit,
    RWDictionary,
    Tables,
    Transaction,
)
from common import rand_bytes, rand_fq

K = 9


def verify_bytecode(bytecodes, success=True):
    r = rand_fq()
    unrolled = [unroll(bytes(c)) for c in bytecodes]
    rows = assign_bytecode_circuit(K, unrolled, r)
    keccak = assign_keccak_table([u.bytes for u in unrolled], r)
    verify_bytecode_circuit(rows, keccak, r, success=success)


def test_bytecode_unrolling_ok():
    codes = [
        bytes(Bytecode().push(1, 1).push(2, 1).add().stop().code),
        rand_bytes(60),
        b"",
        bytes([0x60, 0x05]),  # PUSH1 with data
    ]
    verify_bytecode(codes)


def test_bytecode_full_circuit():
    verify_bytecode([rand_bytes(2**K - 2)])


def test_bytecode_bad_byte():
    code = bytes(Bytecode().push(1, 1).push(2, 1).add().stop().code)
    r = rand_fq()
    u = unroll(code)
    rows = assign_bytecode_circuit(K, [u], r)
    rows[2]["value"] = (rows[2]["value"] + 1) % 256  # corrupt one byte
    keccak = assign_keccak_table([code], r)
    verify_bytecode_circuit(rows, keccak, r, success=False)


def test_bytecode_bad_length():
    code = rand_bytes(16)
    r = rand_fq()
    u = unroll(code)
    rows = assign_bytecode_circuit(K, [u], r)
    rows[0]["value"] = 17
    rows[0]["length"] = 17
    keccak = assign_keccak_table([code], r)
    verify_bytecode_circuit(rows, keccak, r, success=False)


def test_bytecode_bad_is_code():
    code = bytes(Bytecode().push(5, 1).stop().code)
    r = rand_fq()
    u = unroll(code)
    rows = assign_bytecode_circuit(K, [u], r)
    # byte row of the push data flips is_code
    rows[2]["is_code"] = 1 - rows[2]["is_code"]
    keccak = assign_keccak_table([code], r)
    verify_bytecode_circuit(rows, keccak, r, success=False)


def test_bytecode_bad_hash():
    code = rand_bytes(8)
    r = rand_fq()
    u = unroll(code)
    rows = assign_bytecode_circuit(K, [u], r)
    keccak = assign_keccak_table([b"different"], r)
    verify_bytecode_circuit(rows, keccak, r, success=False)


# -- copy circuit -----------------------------------------------------------

def make_memory_copy(length=8, corrupt=None):
    r = rand_fq()
    rw = RWDictionary(10)
    data = {i: (i * 7 + 1) % 256 for i in range(length)}
    cc = CopyCircuit().copy(
        r, rw, 1, CopyDataTypeTag.Memory, 2, CopyDataTypeTag.Memory,
        0, length, 0, length, data,
    )
    if corrupt is not None:
        cc.rows[corrupt]["value"] = (cc.rows[corrupt]["value"] + 1) % 256
    tables = Tables(
        block_table=Block().table_assignments(),
        tx_table=Transaction().table_assignments(),
        rw_table=rw.rws,
    )
    return cc, tables, r


def test_copy_circuit_ok():
    cc, tables, r = make_memory_copy()
    verify_copy_table(cc, tables, r)


def test_copy_circuit_bad_value():
    cc, tables, r = make_memory_copy(corrupt=3)
    verify_copy_table(cc, tables, r, success=False)


def test_copy_circuit_with_padding():
    r = rand_fq()
    rw = RWDictionary(10)
    # source buffer ends early: bytes beyond addr 4 are padded zeros
    data = {i: 9 for i in range(4)}
    cc = CopyCircuit().copy(
        r, rw, 1, CopyDataTypeTag.Memory, 2, CopyDataTypeTag.Memory,
        0, 4, 0, 8, data,
    )
    tables = Tables(
        block_table=Block().table_assignments(),
        tx_table=Transaction().table_assignments(),
        rw_table=rw.rws,
    )
    verify_copy_table(cc, tables, r)


# -- exp circuit ------------------------------------------------------------

@pytest.mark.parametrize("base,exponent", [
    (3, 7), (2, 2), (5, 11), (7, 2**15 + 1), (2**120, 5), (0, 2), (1, 3),
])
def test_exp_circuit_ok(base, exponent):
    circuit = ExpCircuit().add_event(base, exponent, 7)
    verify_exp_circuit(circuit)


def test_exp_circuit_multiple_events():
    circuit = (
        ExpCircuit()
        .add_event(3, 7, 7)
        .add_event(5, 12, 20)
        .fill_dummy_events()
    )
    verify_exp_circuit(circuit)


def test_exp_circuit_bad_result():
    circuit = ExpCircuit().add_event(3, 7, 7)
    last = circuit.rows[-1]
    last["exponentiation"] = last["exponentiation"] + 1
    last["d"] = last["d"] + 1
    verify_exp_circuit(circuit, success=False)
