"""Block-level precompile-call conformance: traced CALLs to ecRecover (0x01),
identity (0x04) and the bn254 precompiles (0x06/0x07/0x08), including the
callop precompile branch's copy events and the sig/ecc table rows they
produce (integrated-witness analog of reference
tests/evm/precompiles/)."""
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))

from zkevm_specs_tpu.circuits.super_circuit import verify_super_circuit
from zkevm_specs_tpu.evm.execution_state import ExecutionState
from zkevm_specs_tpu.ops.ecc import bn254, secp256k1
from zkevm_specs_tpu.ops.keccak import keccak256
from zkevm_specs_tpu.witness.tracer import trace_block
from zkevm_specs_tpu.witness.typing import Block, Bytecode, Transaction


def _tx(gas=2000000):
    return Transaction(id=1, gas=gas, gas_price=int(2e9), caller_address=0xFE,
                       callee_address=0xFF)


def _trace(bc, gas=2000000):
    return trace_block(Block(base_fee=int(1e9)), [(_tx(gas), bc)])


def _store(bc: Bytecode, data: bytes, offset=0):
    for i in range(0, len(data), 32):
        word = int.from_bytes(data[i:i + 32].ljust(32, b"\x00"), "big")
        bc.push32(word).push2(offset + i).mstore()


def _call_precompile(bc: Bytecode, addr: int, cd, rd, gas=0xFFFFF):
    bc.push2(rd[1]).push2(rd[0]).push2(cd[1]).push2(cd[0]) \
      .push1(0).push1(addr).push3(gas).call().pop()


def test_block_ecrecover_call():
    priv = 0xA5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5
    msg_hash = keccak256(b"zkevm-tpu block ecrecover")
    v, r, s = secp256k1.sign(int.from_bytes(msg_hash, "big"), priv, k=0x1234567)
    calldata = (msg_hash + (27 + v).to_bytes(32, "big")
                + r.to_bytes(32, "big") + s.to_bytes(32, "big"))
    bc = Bytecode()
    _store(bc, calldata)
    _call_precompile(bc, 0x01, cd=(0, 128), rd=(0, 32))
    bc.stop()
    w = _trace(bc)
    states = {s_.execution_state for s_ in w.steps}
    assert ExecutionState.ECRECOVER in states
    assert len(w.sig_rows) == 1
    # the recovered address landed in the caller's return region
    pub = secp256k1.priv_to_pub(priv)
    addr = int.from_bytes(keccak256(secp256k1.pubkey_bytes(pub))[-20:], "big")
    assert w.sig_rows[0].recovered_addr == addr
    verify_super_circuit(w)


def test_block_identity_call():
    data = bytes(range(1, 33)) + bytes(range(100, 132))
    bc = Bytecode()
    _store(bc, data, offset=0x100)
    _call_precompile(bc, 0x04, cd=(0x100, 64), rd=(0, 64))
    bc.stop()
    w = _trace(bc)
    assert ExecutionState.DATACOPY in {s.execution_state for s in w.steps}
    verify_super_circuit(w)


def test_block_bn254_add_call():
    p = bn254.g1_mul(bn254.G1, 2)
    q = bn254.g1_mul(bn254.G1, 3)
    calldata = b"".join(x.to_bytes(32, "big") for x in (*p, *q))
    bc = Bytecode()
    _store(bc, calldata)
    _call_precompile(bc, 0x06, cd=(0, 128), rd=(0, 64))
    bc.stop()
    w = _trace(bc)
    assert ExecutionState.BN254_ADD in {s.execution_state for s in w.steps}
    assert w.ecc_circuit is not None and len(w.ecc_circuit.add_ops) == 1
    verify_super_circuit(w)


def test_block_bn254_mul_call():
    p = bn254.g1_mul(bn254.G1, 5)
    calldata = p[0].to_bytes(32, "big") + p[1].to_bytes(32, "big") \
        + (7).to_bytes(32, "big")
    bc = Bytecode()
    _store(bc, calldata)
    _call_precompile(bc, 0x07, cd=(0, 96), rd=(0, 64))
    bc.stop()
    w = _trace(bc)
    assert ExecutionState.BN254_SCALAR_MUL in {s.execution_state for s in w.steps}
    verify_super_circuit(w)


@pytest.mark.slow
def test_block_bn254_pairing_call():
    # e(a*G1, b*G2) * e(-ab*G1, G2) == 1
    a, b = 4, 9
    p1 = bn254.g1_mul(bn254.G1, a)
    q1 = bn254.g2_mul(bn254.G2, b)
    p2 = bn254.g1_mul(bn254.G1, (bn254.R - a * b) % bn254.R)
    q2 = bn254.G2
    calldata = bytearray()
    for (pt, q) in ((p1, q1), (p2, q2)):
        calldata += pt[0].to_bytes(32, "big") + pt[1].to_bytes(32, "big")
        # EVM order: x_c1, x_c0, y_c1, y_c0
        calldata += q[0].c[1].to_bytes(32, "big") + q[0].c[0].to_bytes(32, "big")
        calldata += q[1].c[1].to_bytes(32, "big") + q[1].c[0].to_bytes(32, "big")
    bc = Bytecode()
    _store(bc, bytes(calldata))
    _call_precompile(bc, 0x08, cd=(0, 384), rd=(0, 32), gas=0x3FFFF)
    bc.stop()
    w = _trace(bc)
    assert ExecutionState.BN254_PAIRING in {s.execution_state for s in w.steps}
    assert w.ecc_circuit.pairing_ops[0].out == 1
    verify_super_circuit(w)


def test_block_ecrecover_corrupt_sig_table_rejected():
    priv = 0xB7B7B7B7B7B7B7B7B7B7B7B7B7B7B7B7B7B7B7B7B7B7B7B7B7B7B7B7B7
    msg_hash = keccak256(b"corrupt me")
    v, r, s = secp256k1.sign(int.from_bytes(msg_hash, "big"), priv, k=0x777)
    calldata = (msg_hash + (27 + v).to_bytes(32, "big")
                + r.to_bytes(32, "big") + s.to_bytes(32, "big"))
    bc = Bytecode()
    _store(bc, calldata)
    _call_precompile(bc, 0x01, cd=(0, 128), rd=(0, 32))
    bc.stop()
    w = _trace(bc)
    w.sig_rows[0].recovered_addr += 1
    with pytest.raises(AssertionError):
        verify_super_circuit(w)


# -- identity (0x04) calldata-length sweep ------------------------------------
# (reference tests/evm/test_dataCopy.py:1-184 length dimensions, traced
# end-to-end through the copy circuit.  The tracer mirrors the reference
# dataCopy gadget's length-expression quirk: identity calls require
# rd_offset == 0 and rd_length == cd_length, so the sweep varies the
# common length and the input offset.)

@pytest.mark.parametrize("cd_len", [1, 16, 31, 32, 33, 64, 96])
def test_block_identity_length_sweep(cd_len):
    data = bytes((7 * i + 3) & 0xFF for i in range(cd_len))
    bc = Bytecode()
    _store(bc, data)
    _call_precompile(bc, 0x04, cd=(0, cd_len), rd=(0, cd_len))
    # commit the first word of the (overwritten-in-place) region
    bc.push1(0).mload().push1(0x07).sstore()
    bc.stop()
    w = _trace(bc)
    states = {s_.execution_state for s_ in w.steps}
    assert ExecutionState.DATACOPY in states
    verify_super_circuit(w)
    from zkevm_specs_tpu.tables.schemas import Target
    rows = [r for r in w.rw.rws
            if r["key0"] == int(Target.AccountStorage) and r["rw"] == 1]
    assert rows[-1]["value"] == int.from_bytes(data[:32].ljust(32, b"\x00"), "big")


def test_block_identity_offset_input():
    """Identity over a non-zero calldata offset, DISJOINT from the return
    region (input at 64..96, return region at 0..32).  A partially
    overlapping pair is untraceable: the dataCopy gadget's copy events
    re-read the input after the callop return-region write (documented
    tracer guard)."""
    data = bytes(range(32))
    bc = Bytecode()
    _store(bc, data, offset=64)
    _call_precompile(bc, 0x04, cd=(64, 32), rd=(0, 32))
    bc.push1(0).mload().push1(0x07).sstore()
    bc.stop()
    w = _trace(bc)
    verify_super_circuit(w)
    from zkevm_specs_tpu.tables.schemas import Target
    rows = [r for r in w.rw.rws
            if r["key0"] == int(Target.AccountStorage) and r["rw"] == 1]
    assert rows[-1]["value"] == int.from_bytes(data, "big")


def test_block_identity_overlapping_regions_guarded():
    """A partial cd/rd overlap raises the documented tracer guard instead
    of emitting an inconsistent witness."""
    data = bytes(range(64))
    bc = Bytecode()
    _store(bc, data)
    _call_precompile(bc, 0x04, cd=(16, 32), rd=(0, 32))
    bc.stop()
    with pytest.raises(AssertionError, match="disjoint"):
        _trace(bc)


def test_block_identity_corrupt_output_rejected():
    """Corrupting a copied output byte in the rw rows breaks the copy
    circuit's read/write pairing."""
    data = bytes([0xAB] * 32)
    bc = Bytecode()
    _store(bc, data, offset=64)
    _call_precompile(bc, 0x04, cd=(64, 32), rd=(0, 32))
    bc.stop()
    w = _trace(bc)
    from zkevm_specs_tpu.tables.schemas import Target
    writes = [r for r in w.rw.rws
              if r["key0"] == int(Target.Memory) and r["rw"] == 1
              and r["value"] == 0xAB]
    assert writes
    writes[-1]["value"] = 0xAC
    with pytest.raises(AssertionError):
        verify_super_circuit(w)
