"""Public EVM-circuit API (analog of the reference's zkevm_specs.evm_circuit)."""
from ..tables.container import Tables
from ..tables.schemas import (
    RW,
    AccountFieldTag,
    BlockContextFieldTag,
    BytecodeFieldTag,
    CallContextFieldTag,
    CopyDataTypeTag,
    FixedTableTag,
    MPTProofType,
    Target,
    TxContextFieldTag,
    TxLogFieldTag,
    TxReceiptFieldTag,
)
from ..witness.typing import (
    AccessTuple,
    Account,
    Block,
    Bytecode,
    CopyCircuit,
    ExpCircuit,
    KeccakCircuit,
    RWDictionary,
    Transaction,
    Withdrawal,
    copy_circuit_to_table,
    exp_circuit_to_table,
)
from .execution_state import ExecutionState, precompile_execution_states
from .instruction import Instruction, ReversionInfo, Transition
from .main import verify_steps
from .opcode import Opcode
from .precompile import Precompile
from .step import StepState
