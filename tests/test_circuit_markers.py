"""The is_circuit_code marker (reference util/typing.py:8-18): every
registered execution gadget and standalone-circuit check body is marked as
pure constraint code runnable in both spec (eager) and production (jit)
modes."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from zkevm_specs_tpu.evm.execution import EXECUTION_STATE_IMPL
from zkevm_specs_tpu.utils.typing import marked


def test_every_gadget_is_marked_circuit_code():
    unmarked = [s.name for s, fn in EXECUTION_STATE_IMPL.items()
                if not marked(fn)]
    assert not unmarked, unmarked


def test_circuit_check_bodies_are_marked():
    from zkevm_specs_tpu.circuits.bytecode import check_bytecode
    from zkevm_specs_tpu.circuits.copy import check_copy
    from zkevm_specs_tpu.circuits.exp import check_exp
    from zkevm_specs_tpu.circuits.keccak import check_keccak
    from zkevm_specs_tpu.circuits.pi import check_pi
    from zkevm_specs_tpu.circuits.sig import check_signverify
    from zkevm_specs_tpu.circuits.tx import check_tx
    from zkevm_specs_tpu.circuits.withdrawal import check_withdrawal

    bodies = [check_bytecode, check_copy, check_exp, check_keccak, check_pi,
              check_signverify, check_tx, check_withdrawal]
    unmarked = [f.__name__ for f in bodies if not marked(f)]
    assert not unmarked, unmarked
