"""Block-level boundary sweeps for memory / calldata / SHA3 semantics.

End-to-end analogs of the reference's per-gadget boundary corpora
(tests/evm/test_memory.py:15-53 word-straddling offsets,
tests/evm/test_calldataload.py:15-58 tail-pad reads,
tests/evm/test_sha3.py offset/size matrix): each scenario is traced by
witness/tracer.py into a full-block witness and checked through EVERY
sub-circuit, so the tracer's memory model, the copy circuit's pad rows,
the rw consistency of byte-granular memory and the keccak table all have
to agree on the boundary behavior.  Semantic expectations are asserted
against an independent Python model via SSTORE-result probing."""
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))

from zkevm_specs_tpu.circuits.super_circuit import verify_super_circuit
from zkevm_specs_tpu.ops.keccak import keccak256
from zkevm_specs_tpu.tables.schemas import Target
from zkevm_specs_tpu.witness.tracer import trace_block
from zkevm_specs_tpu.witness.typing import Block, Bytecode, Transaction


def _trace(bc, call_data=bytes(), gas=1000000):
    tx = Transaction(id=1, gas=gas, gas_price=int(2e9), caller_address=0xFE,
                     callee_address=0xFF, call_data=call_data)
    return trace_block(Block(base_fee=int(1e9)), [(tx, bc)])


def _storage_result(w, slot):
    """Final committed value of `slot` from the witness rw rows."""
    rows = [r for r in w.rw.rws
            if r["key0"] == int(Target.AccountStorage) and r["rw"] == 1
            and r["storage_key"] == slot]
    assert rows, f"no storage write for slot {slot:#x}"
    rows.sort(key=lambda r: r["rw_counter"])
    return rows[-1]["value"]


# -- MSTORE/MLOAD word-straddling round trips --------------------------------

VALUE = 0xA1BACF5488BFAFC33BAD736DB41F06866EAEB35E1C1DD81DFC268357EC98563F


@pytest.mark.parametrize("offset", [0, 1, 15, 31, 32, 33, 63, 0x1F0])
def test_mstore_mload_roundtrip(offset):
    """MSTORE at a straddling offset, MLOAD back from the same offset: the
    value survives (two overlapping word windows agree byte-for-byte)."""
    bc = (Bytecode()
          .push32(VALUE).push2(offset).mstore()
          .push2(offset).mload()
          .push1(0x07).sstore()
          .stop())
    w = _trace(bc)
    assert w.tx_success == [True]
    assert _storage_result(w, 0x07) == VALUE
    verify_super_circuit(w)


@pytest.mark.parametrize("offset,shift", [(0, 8), (1, 8), (31, 8), (32, 8)])
def test_mload_shifted_window(offset, shift):
    """MLOAD one byte past an MSTORE window reads the stored value shifted
    left by 8 bits with a zero pad byte shifted in (reference
    test_memory.py vector #2)."""
    bc = (Bytecode()
          .push32(VALUE).push2(offset).mstore()
          .push2(offset + 1).mload()
          .push1(0x07).sstore()
          .stop())
    w = _trace(bc)
    expected = (VALUE << shift) & ((1 << 256) - 1)
    assert _storage_result(w, 0x07) == expected
    verify_super_circuit(w)


@pytest.mark.parametrize("offset", [0, 1, 31, 32, 255])
def test_mstore8_single_byte(offset):
    """MSTORE8 writes exactly one byte (the low byte of the operand); an
    MLOAD window starting at that offset sees it in the top byte."""
    bc = (Bytecode()
          .push32(VALUE).push2(offset).mstore8()
          .push2(offset).mload()
          .push1(0x07).sstore()
          .stop())
    w = _trace(bc)
    expected = (VALUE & 0xFF) << 248  # top byte of the loaded window
    assert _storage_result(w, 0x07) == expected
    verify_super_circuit(w)


def test_msize_tracks_expansion():
    """MSIZE after MSTOREs at increasing offsets follows the REFERENCE
    expansion rule (memory.py:20-23 + instruction.py:1138-1149): the
    target word count is (address + 32 + curr_word_size + 31) // 32 — the
    current word size is folded INTO the target, a documented deviation
    from real-EVM rounding.  Expected sizes below are computed with that
    formula: 32, then (63+1+31)//32=2 words, then (127+2+31)//32=5 words."""
    bc = Bytecode()
    for offset, want_msize in ((0, 32), (31, 64), (95, 160)):
        bc = (bc.push1(1).push1(offset).mstore()
                .msize().push1(want_msize).eq()
                .push1(0x10 + offset % 251).sstore())
    bc = bc.stop()
    w = _trace(bc)
    assert w.tx_success == [True]
    for offset in (0, 31, 95):
        assert _storage_result(w, 0x10 + offset % 251) == 1
    verify_super_circuit(w)


# -- CALLDATALOAD tail pads --------------------------------------------------

CALL_DATA = bytes.fromhex(
    "A1BACF5488BFAFC33BAD736DB41F06866EAEB35E1C1DD81DFC268357EC98563F")


@pytest.mark.parametrize("offset", [0, 1, 16, 31, 32, 33, 64])
def test_calldataload_boundaries(offset):
    """Root-context CALLDATALOAD at every boundary class: full window,
    straddling the tail (zero-padded), and fully out of range (all
    zeros) — reference test_calldataload.py:15-58."""
    bc = (Bytecode()
          .push2(offset).calldataload()
          .push1(0x07).sstore()
          .stop())
    w = _trace(bc, call_data=CALL_DATA)
    window = CALL_DATA[offset:offset + 32]
    # the reference packs the read-order window bytes LITTLE-endian into
    # the pushed Word (calldataload.py:44-47 + Word(bytes) LE semantics,
    # util/arithmetic.py:117-123) — a documented deviation from real-EVM
    # big-endian CALLDATALOAD; the tracer mirrors it bit-exactly
    expected = int.from_bytes(window + b"\x00" * (32 - len(window)), "little")
    assert _storage_result(w, 0x07) == expected
    verify_super_circuit(w)


def test_calldatasize_matches():
    bc = (Bytecode().calldatasize().push1(0x07).sstore().stop())
    w = _trace(bc, call_data=CALL_DATA[:29])
    assert _storage_result(w, 0x07) == 29
    verify_super_circuit(w)


# -- SHA3 offset/size matrix -------------------------------------------------

@pytest.mark.parametrize("offset,size", [
    (0, 0),        # empty hash, no expansion
    (0x10, 0),     # empty hash but non-zero offset (no expansion for size 0)
    (0, 32),       # one word
    (1, 31),       # straddling, sub-word
    (32, 64),      # two words, offset past first
    (0, 0x60),     # three words
])
def test_sha3_matrix(offset, size):
    """SHA3 over (offset, size): the pushed digest equals keccak256 of the
    traced memory window (zero-initialized memory, one seeding MSTORE)."""
    bc = (Bytecode()
          .push32(VALUE).push1(0).mstore()
          .push2(size).push2(offset).sha3()
          .push1(0x07).sstore()
          .stop())
    w = _trace(bc)
    mem = bytearray(max(32, offset + size))
    mem[0:32] = VALUE.to_bytes(32, "big")
    expected = int.from_bytes(keccak256(bytes(mem[offset:offset + size])), "big")
    assert _storage_result(w, 0x07) == expected
    verify_super_circuit(w)


def test_sha3_corrupt_digest_rejected():
    """Corrupting the pushed SHA3 digest in the rw rows breaks the keccak
    lookup chain."""
    bc = (Bytecode()
          .push32(VALUE).push1(0).mstore()
          .push1(32).push1(0).sha3()
          .push1(0x07).sstore()
          .stop())
    w = _trace(bc)
    digest = int.from_bytes(keccak256(VALUE.to_bytes(32, "big")), "big")
    stack_rows = [r for r in w.rw.rws
                  if r["key0"] == int(Target.Stack) and r["rw"] == 1
                  and r["value"] == digest]
    assert stack_rows
    for r in stack_rows:
        r["value"] = (digest + 1) % (1 << 256)
    with pytest.raises(AssertionError):
        verify_super_circuit(w)


def test_mstore8_corrupt_byte_rejected():
    """Corrupting the single memory byte written by MSTORE8 is caught by
    memory rw consistency."""
    bc = (Bytecode()
          .push32(VALUE).push1(5).mstore8()
          .push1(5).mload().pop()
          .stop())
    w = _trace(bc)
    mem_writes = [r for r in w.rw.rws
                  if r["key0"] == int(Target.Memory) and r["rw"] == 1
                  and r["value"] == VALUE & 0xFF]
    assert mem_writes
    mem_writes[0]["value"] = (VALUE & 0xFF) ^ 1
    with pytest.raises(AssertionError):
        verify_super_circuit(w)
