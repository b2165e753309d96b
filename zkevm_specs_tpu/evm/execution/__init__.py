"""Execution-gadget registry (reference: execution/__init__.py:86-171)."""
from typing import Callable, Dict

from ..execution_state import ExecutionState

from .add_sub import add_sub
from .comparator import cmp
from .gas import gas
from .iszero import iszero
from .jump import jump
from .jumpi import jumpi
from .msize import msize
from .not_ import not_opcode
from .pop import pop
from .push import push
from .stop import stop

EXECUTION_STATE_IMPL: Dict[ExecutionState, Callable] = {
    ExecutionState.ADD: add_sub,
    ExecutionState.CMP: cmp,
    ExecutionState.GAS: gas,
    ExecutionState.ISZERO: iszero,
    ExecutionState.JUMP: jump,
    ExecutionState.JUMPI: jumpi,
    ExecutionState.MSIZE: msize,
    ExecutionState.NOT: not_opcode,
    ExecutionState.POP: pop,
    ExecutionState.PUSH: push,
    ExecutionState.STOP: stop,
}
