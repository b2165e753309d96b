"""Shared test helpers (analog of the reference's tests/common.py)."""
import random
from collections import namedtuple
from typing import Tuple, Union

from zkevm_specs_tpu.ops.fr import P
from zkevm_specs_tpu.utils.param import MEMORY_EXPANSION_LINEAR_COEFF

_rng = random.Random(0x5EED)

CallContext = namedtuple(
    "CallContext",
    [
        "is_root", "is_create", "program_counter", "stack_pointer", "gas_left",
        "memory_word_size", "reversible_write_counter",
        "rw_counter_end_of_reversion", "is_persistent",
    ],
    defaults=[True, False, 232, 1023, 0, 0, 0, 0, True],
)

NASTY_AB_VALUES = (
    (0, 0), (1, 0), (0, 1), (1, 1),
    (255, 0), (0, 255), (255, 255),
    (256, 0), (0, 256), (256, 256), (260, 513),
    (65535, 0), (0, 65535), (65535, 65535),
    (65536, 0), (0, 65536), (65536, 65536),
    ((1 << 256) - 1, (1 << 256) - 2),
    ((1 << 256) - 2, (1 << 256) - 1),
    ((1 << 256) - 1, 0),
    (0, (1 << 256) - 1),
)


def generate_nasty_tests(tests, opcodes):
    for opcode in opcodes:
        for a, b in NASTY_AB_VALUES:
            tests.append((opcode, a, b))


def memory_word_size(address: int) -> int:
    return (address + 31) // 32


def memory_expansion(curr_memory_size: int, address: int) -> Tuple[int, int]:
    address_memory_size = memory_word_size(address)
    next_memory_size = max(address_memory_size, curr_memory_size)
    curr_quad = (curr_memory_size * curr_memory_size) // 512
    next_quad = (next_memory_size * next_memory_size) // 512
    gas = (next_memory_size - curr_memory_size) * MEMORY_EXPANSION_LINEAR_COEFF + (
        next_quad - curr_quad
    )
    return next_memory_size, gas


def rand_range(stop: Union[int, float] = 2**256) -> int:
    return _rng.randrange(0, int(stop))


def rand_fq() -> int:
    return rand_range(P)


def rand_address() -> int:
    return rand_range(2**160)


def rand_word() -> int:
    return rand_range(2**256)


def rand_bytes(n_bytes: int = 32) -> bytes:
    return bytes(_rng.randrange(256) for _ in range(n_bytes))
