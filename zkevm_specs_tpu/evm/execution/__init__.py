"""Execution-gadget registry (reference: execution/__init__.py:86-171)."""
from typing import Callable, Dict

from ..execution_state import ExecutionState

from .add_sub import add_sub
from .addmod import addmod
from .balance import balance
from .begin_tx import begin_tx
from .callop import callop
from .create import create
from .end_block import end_block
from .end_tx import end_tx
from .errors import (
    error_code_store,
    error_gas_uint_overflow,
    error_invalid_creation_code,
    error_invalid_jump,
    error_invalid_opcode,
    error_oog_account_access,
    error_oog_call,
    error_oog_constant,
    error_oog_create,
    error_oog_dynamic_memory_expansion,
    error_oog_exp,
    error_oog_log,
    error_oog_memory_copy,
    error_oog_precompile,
    error_oog_sha3,
    error_oog_sload_sstore,
    error_oog_static_memory_expansion,
    error_return_data_out_of_bound,
    error_stack,
    error_write_protection,
)
from .return_revert import return_revert
from .calldataload import calldataload
from .context import (
    address,
    blockctx,
    blockhash,
    caller,
    calldatasize,
    callvalue,
    codesize,
    gasprice,
    origin,
    returndatasize,
    selfbalance,
)
from .bitwise import bitwise
from .byte import byte
from .comparator import cmp
from .copy_family import (
    calldatacopy,
    codecopy,
    extcodecopy,
    returndatacopy,
    sha3,
)
from .exp import exp
from .extcode import extcodehash, extcodesize
from .log import log
from .memory import memory
from .storage import sload, sstore
from .gas import gas
from .iszero import iszero
from .jump import jump
from .jumpi import jumpi
from .msize import msize
from .mul_div_mod import mul_div_mod
from .mulmod import mulmod
from .not_ import not_opcode
from .pop import pop
from .precompiles import dataCopy, ecAdd, ecMul, ecPairing, ecRecover
from .push import push
from .sar import sar
from .sdiv_smod import sdiv_smod
from .shl_shr import shl_shr
from .signextend import signextend
from .slt_sgt import scmp
from .stack_family import dup, jumpdest, pc, swap
from .stop import stop

EXECUTION_STATE_IMPL: Dict[ExecutionState, Callable] = {
    ExecutionState.BeginTx: begin_tx,
    ExecutionState.EndTx: end_tx,
    ExecutionState.EndBlock: end_block,
    ExecutionState.CALL_OP: callop,
    ExecutionState.CREATE: create,
    ExecutionState.CREATE2: create,
    ExecutionState.RETURN: return_revert,
    ExecutionState.ADD: add_sub,
    ExecutionState.ADDMOD: addmod,
    ExecutionState.ADDRESS: address,
    ExecutionState.BALANCE: balance,
    ExecutionState.BLOCKHASH: blockhash,
    ExecutionState.BlockCtx: blockctx,
    ExecutionState.CALLDATACOPY: calldatacopy,
    ExecutionState.CALLDATALOAD: calldataload,
    ExecutionState.CALLDATASIZE: calldatasize,
    ExecutionState.CODECOPY: codecopy,
    ExecutionState.EXTCODECOPY: extcodecopy,
    ExecutionState.EXTCODEHASH: extcodehash,
    ExecutionState.EXTCODESIZE: extcodesize,
    ExecutionState.LOG: log,
    ExecutionState.MEMORY: memory,
    ExecutionState.RETURNDATACOPY: returndatacopy,
    ExecutionState.SHA3: sha3,
    ExecutionState.SLOAD: sload,
    ExecutionState.SSTORE: sstore,
    ExecutionState.CALLER: caller,
    ExecutionState.CALLVALUE: callvalue,
    ExecutionState.CODESIZE: codesize,
    ExecutionState.GASPRICE: gasprice,
    ExecutionState.ORIGIN: origin,
    ExecutionState.RETURNDATASIZE: returndatasize,
    ExecutionState.SELFBALANCE: selfbalance,
    ExecutionState.BITWISE: bitwise,
    ExecutionState.BYTE: byte,
    ExecutionState.CMP: cmp,
    ExecutionState.EXP: exp,
    ExecutionState.GAS: gas,
    ExecutionState.ISZERO: iszero,
    ExecutionState.JUMP: jump,
    ExecutionState.JUMPI: jumpi,
    ExecutionState.MSIZE: msize,
    ExecutionState.MUL: mul_div_mod,
    ExecutionState.MULMOD: mulmod,
    ExecutionState.NOT: not_opcode,
    ExecutionState.POP: pop,
    ExecutionState.PUSH: push,
    ExecutionState.SAR: sar,
    ExecutionState.SDIV_SMOD: sdiv_smod,
    ExecutionState.SHL_SHR: shl_shr,
    ExecutionState.SIGNEXTEND: signextend,
    ExecutionState.SCMP: scmp,
    ExecutionState.STOP: stop,
    # beyond reference parity: DUP/SWAP/PC/JUMPDEST exist in the reference
    # enum but are never registered there (execution/__init__.py:86-171)
    ExecutionState.DUP: dup,
    ExecutionState.SWAP: swap,
    ExecutionState.PC: pc,
    ExecutionState.JUMPDEST: jumpdest,
    ExecutionState.ErrorInvalidJump: error_invalid_jump,
    ExecutionState.ErrorGasUintOverflow: error_gas_uint_overflow,
    ExecutionState.ErrorOutOfGasCall: error_oog_call,
    ExecutionState.ErrorInvalidOpcode: error_invalid_opcode,
    ExecutionState.ErrorOutOfGasConstant: error_oog_constant,
    ExecutionState.ErrorStack: error_stack,
    ExecutionState.ErrorOutOfGasDynamicMemoryExpansion: error_oog_dynamic_memory_expansion,
    ExecutionState.ErrorOutOfGasMemoryCopy: error_oog_memory_copy,
    ExecutionState.ErrorOutOfGasLOG: error_oog_log,
    ExecutionState.ErrorWriteProtection: error_write_protection,
    ExecutionState.ErrorMaxCodeSizeExceeded: error_code_store,
    ExecutionState.ErrorOutOfGasCodeStore: error_code_store,
    ExecutionState.ErrorOutOfGasEXP: error_oog_exp,
    ExecutionState.ErrorInvalidCreationCode: error_invalid_creation_code,
    ExecutionState.ErrorOutOfGasSHA3: error_oog_sha3,
    ExecutionState.ErrorOutOfGasAccountAccess: error_oog_account_access,
    ExecutionState.ErrorOutOfGasStaticMemoryExpansion: error_oog_static_memory_expansion,
    ExecutionState.ErrorOutOfGasSloadSstore: error_oog_sload_sstore,
    ExecutionState.ErrorReturnDataOutOfBound: error_return_data_out_of_bound,
    ExecutionState.ErrorOutOfGasCREATE: error_oog_create,
    ExecutionState.ErrorOutOfGasPrecompile: error_oog_precompile,
    # precompiles (SHA256/RIPEMD160/BIGMODEXP/BLAKE2F unimplemented as in the
    # reference, execution/__init__.py:160-168)
    ExecutionState.ECRECOVER: ecRecover,
    ExecutionState.DATACOPY: dataCopy,
    ExecutionState.BN254_ADD: ecAdd,
    ExecutionState.BN254_PAIRING: ecPairing,
    ExecutionState.BN254_SCALAR_MUL: ecMul,
}

# every registered gadget is circuit code: pure, dual-mode (eager numpy spec
# AND jit-traced), reference util/typing.py:8-18's marker made explicit
from ...utils.typing import is_circuit_code as _is_circuit_code  # noqa: E402

for _fn in EXECUTION_STATE_IMPL.values():
    _is_circuit_code(_fn)
