"""Conformance vectors for the arithmetic/bitwise/compare gadget families,
checked against Python-int EVM semantics (mirrors the scenarios of reference
tests/evm/test_mul_div_mod.py, test_addmod.py, test_mulmod.py,
test_sdiv_smod.py, test_byte.py, test_bitwise.py, test_comparator.py,
test_slt_sgt.py, test_shl_shr.py, test_sar.py, test_signextend.py,
test_iszero.py, test_not.py)."""
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from zkevm_specs_tpu.evm import ExecutionState, Opcode
from common import NASTY_AB_VALUES, rand_word
from helpers import run_opcode

U256M = (1 << 256) - 1
AB = list(NASTY_AB_VALUES) + [(rand_word(), rand_word()) for _ in range(2)]


def to_signed(x):
    return x - (1 << 256) if x >> 255 else x


def from_signed(x):
    return x % (1 << 256)


@pytest.mark.parametrize("a,b", AB)
def test_mul(a, b):
    run_opcode(ExecutionState.MUL, Opcode.MUL, [a, b], [(a * b) & U256M])


@pytest.mark.parametrize("a,b", AB)
def test_div(a, b):
    run_opcode(ExecutionState.MUL, Opcode.DIV, [a, b], [a // b if b else 0])


@pytest.mark.parametrize("a,b", AB)
def test_mod(a, b):
    run_opcode(ExecutionState.MUL, Opcode.MOD, [a, b], [a % b if b else 0])


def test_mul_bad_result():
    run_opcode(ExecutionState.MUL, Opcode.MUL, [3, 5], [16], success=False)


def test_div_bad_result():
    run_opcode(ExecutionState.MUL, Opcode.DIV, [17, 5], [4], success=False)


@pytest.mark.parametrize("a,b", AB)
def test_sdiv(a, b):
    sa, sb = to_signed(a), to_signed(b)
    if sb == 0:
        q = 0
    else:
        q = abs(sa) // abs(sb)
        if (sa < 0) != (sb < 0):
            q = -q
    run_opcode(ExecutionState.SDIV_SMOD, Opcode.SDIV, [a, b], [from_signed(q)])


@pytest.mark.parametrize("a,b", AB)
def test_smod(a, b):
    sa, sb = to_signed(a), to_signed(b)
    if sb == 0:
        r = a  # EVM: x smod 0 = 0? spec: reference keeps remainder = pop1 when divisor 0
        r = 0
    else:
        r = abs(sa) % abs(sb)
        if sa < 0:
            r = -r
    run_opcode(ExecutionState.SDIV_SMOD, Opcode.SMOD, [a, b], [from_signed(r)])


@pytest.mark.parametrize("a,b,n", [
    (0, 0, 0), (1, 2, 3), (7, 8, 9), (100, 200, 7),
    (U256M, U256M, U256M), (U256M - 1, U256M, 3), (rand_word(), rand_word(), rand_word()),
    (5, 6, 0),
])
def test_addmod(a, b, n):
    r = (a + b) % n if n else 0
    run_opcode(ExecutionState.ADDMOD, Opcode.ADDMOD, [a, b, n], [r])


@pytest.mark.parametrize("a,b,n", [
    (0, 0, 0), (1, 2, 3), (7, 8, 9), (100, 200, 7),
    (U256M, U256M, U256M), (U256M - 1, U256M, 3), (rand_word(), rand_word(), rand_word()),
    (5, 6, 0),
])
def test_mulmod(a, b, n):
    r = (a * b) % n if n else 0
    run_opcode(ExecutionState.MULMOD, Opcode.MULMOD, [a, b, n], [r])


def test_addmod_bad():
    run_opcode(ExecutionState.ADDMOD, Opcode.ADDMOD, [1, 2, 3], [1], success=False)


@pytest.mark.parametrize("a,b", AB)
def test_byte(a, b):
    r = (b >> (8 * (31 - a))) & 0xFF if a < 32 else 0
    run_opcode(ExecutionState.BYTE, Opcode.BYTE, [a, b], [r])


@pytest.mark.parametrize("op,fn", [
    (Opcode.AND, lambda a, b: a & b),
    (Opcode.OR, lambda a, b: a | b),
    (Opcode.XOR, lambda a, b: a ^ b),
])
@pytest.mark.parametrize("a,b", AB[:8] + AB[-2:])
def test_bitwise(op, fn, a, b):
    run_opcode(ExecutionState.BITWISE, op, [a, b], [fn(a, b)])


def test_bitwise_bad():
    run_opcode(ExecutionState.BITWISE, Opcode.AND, [6, 3], [7], success=False)


@pytest.mark.parametrize("op,fn", [
    (Opcode.LT, lambda a, b: int(a < b)),
    (Opcode.GT, lambda a, b: int(a > b)),
    (Opcode.EQ, lambda a, b: int(a == b)),
])
@pytest.mark.parametrize("a,b", AB[:8] + AB[-2:])
def test_cmp(op, fn, a, b):
    run_opcode(ExecutionState.CMP, op, [a, b], [fn(a, b)])


@pytest.mark.parametrize("op,fn", [
    (Opcode.SLT, lambda a, b: int(to_signed(a) < to_signed(b))),
    (Opcode.SGT, lambda a, b: int(to_signed(a) > to_signed(b))),
])
@pytest.mark.parametrize("a,b", AB[:8] + AB[-4:])
def test_scmp(op, fn, a, b):
    run_opcode(ExecutionState.SCMP, op, [a, b], [fn(a, b)])


@pytest.mark.parametrize("a", [0, 1, 5, U256M, rand_word()])
def test_iszero(a):
    run_opcode(ExecutionState.ISZERO, Opcode.ISZERO, [a], [int(a == 0)])


@pytest.mark.parametrize("a", [0, 1, U256M, rand_word()])
def test_not(a):
    run_opcode(ExecutionState.NOT, Opcode.NOT, [a], [a ^ U256M])


@pytest.mark.parametrize("shift,a", [
    (0, 1), (1, 1), (8, 0xFF), (255, 1), (256, 1), (300, U256M),
    (5, rand_word()), (130, rand_word()),
])
def test_shl(shift, a):
    r = (a << shift) & U256M if shift < 256 else 0
    run_opcode(ExecutionState.SHL_SHR, Opcode.SHL, [shift, a], [r])


@pytest.mark.parametrize("shift,a", [
    (0, 1), (1, 3), (8, 0xFF00), (255, U256M), (256, U256M), (300, U256M),
    (5, rand_word()), (130, rand_word()),
])
def test_shr(shift, a):
    r = a >> shift if shift < 256 else 0
    run_opcode(ExecutionState.SHL_SHR, Opcode.SHR, [shift, a], [r])


def test_shr_bad():
    run_opcode(ExecutionState.SHL_SHR, Opcode.SHR, [4, 0xF0], [0xF1], success=False)


@pytest.mark.parametrize("shift,a", [
    (0, 1), (1, 2), (8, from_signed(-256)), (255, from_signed(-1)),
    (256, from_signed(-5)), (300, 12345), (7, rand_word()), (170, rand_word()),
])
def test_sar(shift, a):
    sa = to_signed(a)
    r = from_signed(sa >> shift) if shift < 256 else (U256M if sa < 0 else 0)
    run_opcode(ExecutionState.SAR, Opcode.SAR, [shift, a], [r])


@pytest.mark.parametrize("index,value", [
    (0, 0xFF), (0, 0x7F), (1, 0xFF80), (15, rand_word()), (31, rand_word()),
    (32, rand_word()), (300, rand_word()),
])
def test_signextend(index, value):
    if index < 31:
        bit = 8 * index + 7
        if (value >> bit) & 1:
            r = value | (U256M ^ ((1 << (bit + 1)) - 1))
        else:
            r = value & ((1 << (bit + 1)) - 1)
    else:
        r = value
    run_opcode(ExecutionState.SIGNEXTEND, Opcode.SIGNEXTEND, [index, value], [r])


# -- reference-density sweeps: the full NASTY operand lattice on every
#    two-operand family (reference common.generate_nasty_tests) and the
#    EIP-145 / boundary vectors of test_shl_shr.py, test_sar.py,
#    test_slt_sgt.py, test_signextend.py -----------------------------------

MAX_NEG = 1 << 255                 # TESTING_MAX_NEGATIVE (sign bit set, rest 0)
MAX_POS = (1 << 255) - 1           # TESTING_MAX_POSITIVE
NEG_SIGN = 1 << 255                # TESTING_NEGATIVE_SIGN


@pytest.mark.parametrize("op,fn", [
    (Opcode.AND, lambda a, b: a & b),
    (Opcode.OR, lambda a, b: a | b),
    (Opcode.XOR, lambda a, b: a ^ b),
])
@pytest.mark.parametrize("a,b", AB)
def test_bitwise_nasty(op, fn, a, b):
    run_opcode(ExecutionState.BITWISE, op, [a, b], [fn(a, b)])


@pytest.mark.parametrize("op,fn", [
    (Opcode.LT, lambda a, b: int(a < b)),
    (Opcode.GT, lambda a, b: int(a > b)),
    (Opcode.EQ, lambda a, b: int(a == b)),
])
@pytest.mark.parametrize("a,b", AB)
def test_cmp_nasty(op, fn, a, b):
    run_opcode(ExecutionState.CMP, op, [a, b], [fn(a, b)])


@pytest.mark.parametrize("a,b", AB + [
    (MAX_NEG, MAX_NEG), (MAX_NEG, MAX_POS), (MAX_POS, MAX_NEG),
    (MAX_POS, MAX_POS), (MAX_NEG, 0), (0, MAX_NEG),
])
@pytest.mark.parametrize("op,fn", [
    (Opcode.SLT, lambda a, b: int(to_signed(a) < to_signed(b))),
    (Opcode.SGT, lambda a, b: int(to_signed(a) > to_signed(b))),
])
def test_scmp_nasty(op, fn, a, b):
    run_opcode(ExecutionState.SCMP, op, [a, b], [fn(a, b)])


_SHIFT_VECTORS = [
    # reference test_shl_shr.py TESTING_DATA
    (8, 0xABCD << 240), (7, 0x1234 << 240), (17, 0x8765 << 240),
    (0, 0x4321 << 240), (256, 0xFFFF), (265, 0x12345),
    (63, U256M), (128, U256M), (129, U256M),
    (8, 0xABCD), (7, 0x1234), (17, 0x8765), (0, 0x4321),
] + [(a, b) for a, b in AB]


@pytest.mark.parametrize("shift,a", _SHIFT_VECTORS)
def test_shl_nasty(shift, a):
    r = (a << shift) & U256M if shift < 256 else 0
    run_opcode(ExecutionState.SHL_SHR, Opcode.SHL, [shift, a], [r])


@pytest.mark.parametrize("shift,a", _SHIFT_VECTORS)
def test_shr_nasty(shift, a):
    r = a >> shift if shift < 256 else 0
    run_opcode(ExecutionState.SHL_SHR, Opcode.SHR, [shift, a], [r])


@pytest.mark.parametrize("shift,a", [
    # reference test_sar.py TESTING_DATA + the EIP-145 SAR vectors
    (8, 0x1234), (NEG_SIGN + 8, 0x1234), (17, 0x5678), (0, 0xABCD),
    (256, 0xFFFF), (265, 0x12345),
    (8, NEG_SIGN + 0x1234), (NEG_SIGN + 8, NEG_SIGN + 0x1234),
    (17, NEG_SIGN + 0x5678), (0, NEG_SIGN + 0xABCD),
    (256, NEG_SIGN + 0xFFFF), (265, NEG_SIGN + 0x12345),
    (8, MAX_NEG), (129, MAX_NEG), (300, MAX_NEG),
    (8, MAX_POS), (129, MAX_POS), (300, MAX_POS),
    (MAX_NEG, MAX_NEG), (MAX_NEG, MAX_POS),
    (MAX_POS, MAX_NEG), (MAX_POS, MAX_POS),
    # EIP-145
    (0, 1), (1, 1), (1, 0), (1, NEG_SIGN), (0xFF, NEG_SIGN),
    (0x100, NEG_SIGN), (0x101, NEG_SIGN),
    (0, MAX_NEG), (1, MAX_NEG), (0xFF, MAX_NEG), (0x100, MAX_NEG),
    (0xFE, 2**254), (0xF8, MAX_POS), (0xFE, MAX_POS),
])
def test_sar_reference_vectors(shift, a):
    sa = to_signed(a)
    r = from_signed(sa >> shift) if shift < 256 else (U256M if sa < 0 else 0)
    run_opcode(ExecutionState.SAR, Opcode.SAR, [shift, a], [r])


@pytest.mark.parametrize("index,value", [
    # reference test_signextend.py: negative-sign indexes and operands
    (0, 0x12), (1, 0x1234), (16, 0x12345678 << 100), (31, U256M),
    (NEG_SIGN, 0x1234), (NEG_SIGN + 5, NEG_SIGN + 0x1234),
    (0, NEG_SIGN + 0xFF), (15, NEG_SIGN + (0x80 << 120)),
])
def test_signextend_reference_vectors(index, value):
    if index < 31:
        bit = 8 * index + 7
        if (value >> bit) & 1:
            r = value | (U256M ^ ((1 << (bit + 1)) - 1))
        else:
            r = value & ((1 << (bit + 1)) - 1)
    else:
        r = value
    run_opcode(ExecutionState.SIGNEXTEND, Opcode.SIGNEXTEND, [index, value], [r])


@pytest.mark.parametrize("a,b", AB)
def test_byte_nasty(a, b):
    r = (b >> (8 * (31 - a))) & 0xFF if a < 32 else 0
    run_opcode(ExecutionState.BYTE, Opcode.BYTE, [a, b], [r])


@pytest.mark.parametrize("a,b,n", [
    # divisor/modulus edge lattice for the mod-3 gadgets
    (U256M, U256M, 1), (U256M, 1, U256M), (1, U256M, U256M),
    (MAX_NEG, MAX_POS, 2), (MAX_POS, MAX_NEG, 3),
    (U256M, U256M, U256M - 1), (2, 3, U256M),
])
def test_addmod_edge(a, b, n):
    run_opcode(ExecutionState.ADDMOD, Opcode.ADDMOD, [a, b, n],
               [(a + b) % n if n else 0])


@pytest.mark.parametrize("a,b,n", [
    (U256M, U256M, 1), (U256M, 1, U256M), (1, U256M, U256M),
    (MAX_NEG, MAX_POS, 2), (MAX_POS, MAX_NEG, 3),
    (U256M, U256M, U256M - 1), (2, 3, U256M),
])
def test_mulmod_edge(a, b, n):
    run_opcode(ExecutionState.MULMOD, Opcode.MULMOD, [a, b, n],
               [(a * b) % n if n else 0])
