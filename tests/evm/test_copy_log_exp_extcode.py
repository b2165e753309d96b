"""Conformance vectors for the remaining data-movement / environment gadgets:
EXP, LOG0-2, EXTCODESIZE, EXTCODEHASH, CODECOPY, EXTCODECOPY, RETURNDATACOPY
(mirrors the scenarios of reference tests/evm/test_{exp,logs,extcodesize,
extcodehash,codecopy,extcodecopy,returndatacopy}.py)."""
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
from zkevm_specs_tpu.evm.opcode import constant_gas_cost
from zkevm_specs_tpu.tables.schemas import (
    AccountFieldTag,
    CopyDataTypeTag,
    TxLogFieldTag,
)
from zkevm_specs_tpu.utils.param import (
    EXTRA_GAS_COST_ACCOUNT_COLD_ACCESS,
    GAS_COST_COPY,
    GAS_COST_EXP_PER_BYTE,
    GAS_COST_LOG,
    GAS_COST_LOGDATA,
)
from zkevm_specs_tpu.witness.typing import (
    CopyCircuit,
    ExpCircuit,
    copy_circuit_to_table,
    exp_circuit_to_table,
)
from common import memory_expansion, rand_address, rand_word

from helpers import run_opcode


# -- EXP ---------------------------------------------------------------------

@pytest.mark.parametrize("base,exponent", [
    (3, 0), (5, 1), (2, 2), (3, 7), (7, 2**15 + 1), (rand_word(), 5),
])
def test_exp(base, exponent):
    result = pow(base, exponent, 1 << 256)
    byte_size = (exponent.bit_length() + 7) // 8
    exp_table = ()
    if exponent > 1:
        # identifier = rw_counter(9) + offset after 2 pops + 1 push = 12
        exp_table = exp_circuit_to_table(ExpCircuit().add_event(base, exponent, 12))
    run_opcode(
        ExecutionState.EXP, Opcode.EXP, pops=[base, exponent], pushes=[result],
        dynamic_gas=GAS_COST_EXP_PER_BYTE * byte_size, exp_table=exp_table,
    )


def test_exp_bad_result_rejected():
    base, exponent = 3, 7
    exp_table = exp_circuit_to_table(ExpCircuit().add_event(base, exponent, 12))
    run_opcode(
        ExecutionState.EXP, Opcode.EXP, pops=[base, exponent],
        pushes=[pow(base, exponent, 1 << 256) + 1],
        dynamic_gas=GAS_COST_EXP_PER_BYTE * 1, exp_table=exp_table,
        success=False,
    )


# -- EXTCODESIZE / EXTCODEHASH -------------------------------------------------

def _ext_account(exists: bool):
    addr = rand_address()
    if exists:
        ext_code = Bytecode().push1(1).push1(2).add().stop()
        return addr, ext_code, ext_code.hash()
    return addr, None, 0


@pytest.mark.parametrize("exists,warm", [(True, False), (True, True), (False, False)])
def test_extcodesize(exists, warm):
    addr, ext_code, code_hash = _ext_account(exists)
    code_size = len(ext_code.code) if exists else 0

    bytecode = Bytecode().push(addr, n_bytes=32).extcodesize().stop()
    h = bytecode.hash()
    rw = (
        RWDictionary(9)
        .stack_read(1, 1023, addr)
        .call_context_read(1, CallContextFieldTag.TxId, 1)
        .call_context_read(1, CallContextFieldTag.RwCounterEndOfReversion, 0)
        .call_context_read(1, CallContextFieldTag.IsPersistent, 1)
        .tx_access_list_account_write(1, addr, True, warm)
        .account_read(addr, AccountFieldTag.CodeHash, code_hash)
        .stack_write(1, 1023, code_size)
    )
    bc_table = list(bytecode.table_assignments())
    if exists:
        bc_table += list(ext_code.table_assignments())

    dynamic = 0 if warm else EXTRA_GAS_COST_ACCOUNT_COLD_ACCESS
    gas = constant_gas_cost(Opcode.EXTCODESIZE) + dynamic
    tables = Tables(
        block_table=Block().table_assignments(),
        bytecode_table=bc_table,
        rw_table=rw.rws,
    )
    steps = [
        StepState(
            execution_state=ExecutionState.EXTCODESIZE, rw_counter=9, call_id=1,
            is_root=True, code_hash=h, program_counter=33, stack_pointer=1023,
            gas_left=gas,
        ),
        StepState(
            execution_state=ExecutionState.STOP, rw_counter=16, call_id=1,
            is_root=True, code_hash=h, program_counter=34, stack_pointer=1023,
            gas_left=0, reversible_write_counter=1,
        ),
    ]
    verify_steps(tables=tables, steps=steps)


@pytest.mark.parametrize("exists,warm", [(True, False), (True, True), (False, True)])
def test_extcodehash(exists, warm):
    addr, ext_code, code_hash = _ext_account(exists)

    bytecode = Bytecode().push(addr, n_bytes=32).extcodehash().stop()
    h = bytecode.hash()
    rw = (
        RWDictionary(9)
        .stack_read(1, 1023, addr)
        .call_context_read(1, CallContextFieldTag.TxId, 1)
        .call_context_read(1, CallContextFieldTag.RwCounterEndOfReversion, 0)
        .call_context_read(1, CallContextFieldTag.IsPersistent, 1)
        .tx_access_list_account_write(1, addr, True, warm)
        .account_read(addr, AccountFieldTag.CodeHash, code_hash)
        .stack_write(1, 1023, code_hash)
    )
    dynamic = 0 if warm else EXTRA_GAS_COST_ACCOUNT_COLD_ACCESS
    gas = constant_gas_cost(Opcode.EXTCODEHASH) + dynamic
    tables = Tables(
        block_table=Block().table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
    )
    steps = [
        StepState(
            execution_state=ExecutionState.EXTCODEHASH, rw_counter=9, call_id=1,
            is_root=True, code_hash=h, program_counter=33, stack_pointer=1023,
            gas_left=gas,
        ),
        StepState(
            execution_state=ExecutionState.STOP, rw_counter=16, call_id=1,
            is_root=True, code_hash=h, program_counter=34, stack_pointer=1023,
            gas_left=0, reversible_write_counter=1,
        ),
    ]
    verify_steps(tables=tables, steps=steps)


# -- CODECOPY ------------------------------------------------------------------

@pytest.mark.parametrize("length", [8, 0])
def test_codecopy(length):
    from common import rand_fq

    r = rand_fq()
    memory_offset, code_offset = 0, 2

    bytecode = (
        Bytecode()
        .push(length, n_bytes=32).push(code_offset, n_bytes=32)
        .push(memory_offset, n_bytes=32).codecopy().stop()
    )
    h = bytecode.hash()
    code_size = len(bytecode.code)

    rw = (
        RWDictionary(9)
        .stack_read(1, 1021, memory_offset)
        .stack_read(1, 1022, code_offset)
        .stack_read(1, 1023, length)
    )
    copy_circuit = CopyCircuit()
    if length:
        src_data = {
            code_offset + i: (bytecode.code[code_offset + i],
                              int(bytecode.is_code[code_offset + i]))
            for i in range(length)
            if code_offset + i < code_size
        }
        copy_circuit.copy(
            r, rw, h, CopyDataTypeTag.Bytecode, 1, CopyDataTypeTag.Memory,
            code_offset, code_size, memory_offset, length, src_data,
        )
    n_rw = rw.rw_counter - 9

    next_mem, mem_gas = memory_expansion(0, memory_offset + length if length else 0)
    gas = (constant_gas_cost(Opcode.CODECOPY) + mem_gas
           + GAS_COST_COPY * ((length + 31) // 32))
    tables = Tables(
        block_table=Block().table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
        copy_table=copy_circuit_to_table(copy_circuit),
    )
    steps = [
        StepState(
            execution_state=ExecutionState.CODECOPY, rw_counter=9, call_id=1,
            is_root=True, code_hash=h, program_counter=99, stack_pointer=1021,
            gas_left=gas,
        ),
        StepState(
            execution_state=ExecutionState.STOP, rw_counter=9 + n_rw, call_id=1,
            is_root=True, code_hash=h, program_counter=100, stack_pointer=1024,
            gas_left=0, memory_word_size=next_mem,
        ),
    ]
    verify_steps(tables=tables, steps=steps)


# -- EXTCODECOPY ----------------------------------------------------------------

@pytest.mark.parametrize("warm,length,code_offset,memory_offset", [
    (False, 6, 1, 0),
    (True, 6, 1, 0),
    (True, 0, 1, 0),
    # out-of-bound: copy crosses the end of the external code (zero pad)
    (True, 6, 4, 0),
    # out-of-bound: code_offset entirely past the code
    (False, 8, 64, 0),
    # deep memory offset: quadratic expansion gas
    (True, 6, 1, 0x800),
    # whole code plus padding tail, unaligned destination
    (False, 16, 0, 0x21),
])
def test_extcodecopy(warm, length, code_offset, memory_offset):
    from common import rand_fq

    r = rand_fq()
    addr = rand_address()
    ext_code = Bytecode().push1(7).push1(8).add().pop().stop()
    ext_hash = ext_code.hash()
    ext_size = len(ext_code.code)

    bytecode = (
        Bytecode()
        .push(length, n_bytes=32).push(code_offset, n_bytes=32)
        .push(memory_offset, n_bytes=32).push(addr, n_bytes=32)
        .extcodecopy().stop()
    )
    h = bytecode.hash()

    rw = (
        RWDictionary(9)
        .stack_read(1, 1020, addr)
        .stack_read(1, 1021, memory_offset)
        .stack_read(1, 1022, code_offset)
        .stack_read(1, 1023, length)
        .call_context_read(1, CallContextFieldTag.TxId, 1)
        .call_context_read(1, CallContextFieldTag.RwCounterEndOfReversion, 0)
        .call_context_read(1, CallContextFieldTag.IsPersistent, 1)
        .tx_access_list_account_write(1, addr, True, warm)
        .account_read(addr, AccountFieldTag.CodeHash, ext_hash)
    )
    copy_circuit = CopyCircuit()
    if length:
        src_data = {
            code_offset + i: (ext_code.code[code_offset + i],
                              int(ext_code.is_code[code_offset + i]))
            for i in range(length)
            if code_offset + i < ext_size
        }
        copy_circuit.copy(
            r, rw, ext_hash, CopyDataTypeTag.Bytecode, 1, CopyDataTypeTag.Memory,
            code_offset, ext_size, memory_offset, length, src_data,
        )
    n_rw = rw.rw_counter - 9

    next_mem, mem_gas = memory_expansion(0, memory_offset + length if length else 0)
    gas = (constant_gas_cost(Opcode.EXTCODECOPY) + mem_gas
           + GAS_COST_COPY * ((length + 31) // 32)
           + (0 if warm else EXTRA_GAS_COST_ACCOUNT_COLD_ACCESS))
    tables = Tables(
        block_table=Block().table_assignments(),
        bytecode_table=list(bytecode.table_assignments()) + list(ext_code.table_assignments()),
        rw_table=rw.rws,
        copy_table=copy_circuit_to_table(copy_circuit),
    )
    steps = [
        StepState(
            execution_state=ExecutionState.EXTCODECOPY, rw_counter=9, call_id=1,
            is_root=True, code_hash=h, program_counter=132, stack_pointer=1020,
            gas_left=gas,
        ),
        StepState(
            execution_state=ExecutionState.STOP, rw_counter=9 + n_rw, call_id=1,
            is_root=True, code_hash=h, program_counter=133, stack_pointer=1024,
            gas_left=0, memory_word_size=next_mem, reversible_write_counter=1,
        ),
    ]
    verify_steps(tables=tables, steps=steps)


# -- RETURNDATACOPY --------------------------------------------------------------

@pytest.mark.parametrize("size", [4, 1])
def test_returndatacopy(size):
    from common import rand_fq

    r = rand_fq()
    memory_offset, data_offset = 0, 0
    last_callee_id = 2
    return_data_offset, return_data_length = 0, 8
    return_data = bytes(range(10, 10 + return_data_length))

    bytecode = (
        Bytecode()
        .push(size, n_bytes=32).push(data_offset, n_bytes=32)
        .push(memory_offset, n_bytes=32).returndatacopy().stop()
    )
    h = bytecode.hash()

    rw = (
        RWDictionary(9)
        .stack_read(1, 1021, memory_offset)
        .stack_read(1, 1022, data_offset)
        .stack_read(1, 1023, size)
        .call_context_read(1, CallContextFieldTag.LastCalleeId, last_callee_id)
        .call_context_read(1, CallContextFieldTag.LastCalleeReturnDataLength, return_data_length)
        .call_context_read(1, CallContextFieldTag.LastCalleeReturnDataOffset, return_data_offset)
    )
    copy_circuit = CopyCircuit().copy(
        r, rw, last_callee_id, CopyDataTypeTag.Memory, 1, CopyDataTypeTag.Memory,
        return_data_offset, return_data_offset + size, memory_offset, size,
        {return_data_offset + i: return_data[i] for i in range(size)},
    )
    n_rw = rw.rw_counter - 9

    next_mem, mem_gas = memory_expansion(0, memory_offset + size)
    gas = (constant_gas_cost(Opcode.RETURNDATACOPY) + mem_gas
           + GAS_COST_COPY * ((size + 31) // 32))
    tables = Tables(
        block_table=Block().table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
        copy_table=copy_circuit_to_table(copy_circuit),
    )
    steps = [
        StepState(
            execution_state=ExecutionState.RETURNDATACOPY, rw_counter=9, call_id=1,
            is_root=True, code_hash=h, program_counter=99, stack_pointer=1021,
            gas_left=gas,
        ),
        StepState(
            execution_state=ExecutionState.STOP, rw_counter=9 + n_rw, call_id=1,
            is_root=True, code_hash=h, program_counter=100, stack_pointer=1024,
            gas_left=0, memory_word_size=next_mem,
        ),
    ]
    verify_steps(tables=tables, steps=steps)


def test_returndatacopy_out_of_bound_rejected():
    """size beyond the callee's return data must fail the range check."""
    from common import rand_fq

    r = rand_fq()
    size = 12  # > return_data_length of 8
    memory_offset, data_offset = 0, 0
    last_callee_id = 2
    return_data = bytes(range(10, 22))

    bytecode = (
        Bytecode()
        .push(size, n_bytes=32).push(data_offset, n_bytes=32)
        .push(memory_offset, n_bytes=32).returndatacopy().stop()
    )
    h = bytecode.hash()
    rw = (
        RWDictionary(9)
        .stack_read(1, 1021, memory_offset)
        .stack_read(1, 1022, data_offset)
        .stack_read(1, 1023, size)
        .call_context_read(1, CallContextFieldTag.LastCalleeId, last_callee_id)
        .call_context_read(1, CallContextFieldTag.LastCalleeReturnDataLength, 8)
        .call_context_read(1, CallContextFieldTag.LastCalleeReturnDataOffset, 0)
    )
    copy_circuit = CopyCircuit().copy(
        r, rw, last_callee_id, CopyDataTypeTag.Memory, 1, CopyDataTypeTag.Memory,
        0, size, memory_offset, size, {i: return_data[i] for i in range(size)},
    )
    n_rw = rw.rw_counter - 9
    next_mem, mem_gas = memory_expansion(0, size)
    gas = (constant_gas_cost(Opcode.RETURNDATACOPY) + mem_gas
           + GAS_COST_COPY * ((size + 31) // 32))
    tables = Tables(
        block_table=Block().table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
        copy_table=copy_circuit_to_table(copy_circuit),
    )
    steps = [
        StepState(
            execution_state=ExecutionState.RETURNDATACOPY, rw_counter=9, call_id=1,
            is_root=True, code_hash=h, program_counter=99, stack_pointer=1021,
            gas_left=gas,
        ),
        StepState(
            execution_state=ExecutionState.STOP, rw_counter=9 + n_rw, call_id=1,
            is_root=True, code_hash=h, program_counter=100, stack_pointer=1024,
            gas_left=0, memory_word_size=next_mem,
        ),
    ]
    verify_steps(tables=tables, steps=steps, success=False)


# -- LOG0..LOG2 -------------------------------------------------------------------

@pytest.mark.parametrize("n_topics,msize,mstart", [
    (0, 4, 0), (1, 4, 0), (2, 0, 0),
    # full topic fan: LOG3/LOG4, multi-word data, deep/unaligned starts
    (3, 4, 0), (4, 4, 0),
    (4, 0x40, 0x20), (2, 0x27, 0x13), (0, 0x80, 0x1F5),
])
def test_log(n_topics, msize, mstart):
    from common import rand_fq

    r = rand_fq()
    opcode = Opcode(int(Opcode.LOG0) + n_topics)
    tx_id, callee_addr = 1, rand_address()
    topics = [rand_word() for _ in range(n_topics)]
    mem_data = bytes((i + 1) % 256 for i in range(msize))

    bytecode = Bytecode()
    for t in reversed(topics):
        bytecode.push(t, n_bytes=32)
    bytecode.push(msize, n_bytes=32).push(mstart, n_bytes=32)
    getattr(bytecode, opcode.name.lower())()
    bytecode.stop()
    h = bytecode.hash()

    sp0 = 1024 - 2 - n_topics
    rw = (
        RWDictionary(9)
        .stack_read(1, sp0, mstart)
        .stack_read(1, sp0 + 1, msize)
        .call_context_read(1, CallContextFieldTag.TxId, tx_id)
        .call_context_read(1, CallContextFieldTag.IsStatic, 0)
        .call_context_read(1, CallContextFieldTag.CalleeAddress, callee_addr)
        .call_context_read(1, CallContextFieldTag.IsPersistent, 1)
        .tx_log_write(tx_id, 1, TxLogFieldTag.Address, 0, callee_addr)
    )
    for i, t in enumerate(topics):
        rw.stack_read(1, sp0 + 2 + i, t)
        rw.tx_log_write(tx_id, 1, TxLogFieldTag.Topic, i, t)

    copy_circuit = CopyCircuit()
    if msize:
        copy_circuit.copy(
            r, rw, 1, CopyDataTypeTag.Memory, tx_id, CopyDataTypeTag.TxLog,
            mstart, mstart + msize, 0, msize,
            {mstart + i: mem_data[i] for i in range(msize)}, log_id=1,
        )
    n_rw = rw.rw_counter - 9

    next_mem, mem_gas = memory_expansion(0, mstart + msize if msize else 0)
    gas = (constant_gas_cost(opcode) + GAS_COST_LOG + GAS_COST_LOG * n_topics
           + GAS_COST_LOGDATA * msize + mem_gas)
    tables = Tables(
        block_table=Block().table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
        copy_table=copy_circuit_to_table(copy_circuit),
    )
    pc0 = 33 * (2 + n_topics)
    steps = [
        StepState(
            execution_state=ExecutionState.LOG, rw_counter=9, call_id=1,
            is_root=True, code_hash=h, program_counter=pc0, stack_pointer=sp0,
            gas_left=gas, log_id=0,
        ),
        StepState(
            execution_state=ExecutionState.STOP, rw_counter=9 + n_rw, call_id=1,
            is_root=True, code_hash=h, program_counter=pc0 + 1,
            stack_pointer=sp0 + 2 + n_topics, gas_left=0,
            memory_word_size=next_mem, log_id=1,
        ),
    ]
    verify_steps(tables=tables, steps=steps)


# -- EXTCODECOPY full matrix (reference tests/evm/test_extcodecopy.py
#    TESTING_DATA: code length {0,2,256} x warm x exists, plus the
#    out-of-bound (src past code end, length 260) rows) ---------------------

def _raw_code(n: int) -> "Bytecode":
    """n bytes of deterministic non-PUSH opcodes (all < 0x60, so every
    byte is code and the unrolled is_code flags are trivially consistent)."""
    bc = Bytecode()
    for i in range(n):
        bc.code.append((i * 7 + 3) % 0x60)
        bc.is_code.append(True)
    return bc


@pytest.mark.parametrize("exists", [True, False])
@pytest.mark.parametrize("warm", [True, False])
@pytest.mark.parametrize("code_len,code_offset,length", [
    (0, 0, 54),       # empty code: all zero-padding
    (2, 0, 54),       # short code + padding tail
    (256, 0, 54),     # code longer than the copy
    (64, 0x20, 260),  # out of bound: src crosses the end of the code
])
def test_extcodecopy_matrix(exists, warm, code_len, code_offset, length):
    from common import rand_fq

    r = rand_fq()
    addr = 0x30000
    memory_offset = 0
    ext_code = _raw_code(code_len)
    ext_hash = ext_code.hash() if exists else 0
    ext_size = len(ext_code.code) if exists else 0

    bytecode = (
        Bytecode()
        .push(length, n_bytes=32).push(code_offset, n_bytes=32)
        .push(memory_offset, n_bytes=32).push(addr, n_bytes=32)
        .extcodecopy().stop()
    )
    h = bytecode.hash()

    rw = (
        RWDictionary(9)
        .stack_read(1, 1020, addr)
        .stack_read(1, 1021, memory_offset)
        .stack_read(1, 1022, code_offset)
        .stack_read(1, 1023, length)
        .call_context_read(1, CallContextFieldTag.TxId, 1)
        .call_context_read(1, CallContextFieldTag.RwCounterEndOfReversion, 0)
        .call_context_read(1, CallContextFieldTag.IsPersistent, 1)
        .tx_access_list_account_write(1, addr, True, warm)
        .account_read(addr, AccountFieldTag.CodeHash, ext_hash)
    )
    copy_circuit = CopyCircuit()
    if length:
        src_data = {
            code_offset + i: (ext_code.code[code_offset + i],
                              int(ext_code.is_code[code_offset + i]))
            for i in range(length)
            if code_offset + i < ext_size
        }
        copy_circuit.copy(
            r, rw, ext_hash, CopyDataTypeTag.Bytecode, 1,
            CopyDataTypeTag.Memory, code_offset, ext_size, memory_offset,
            length, src_data,
        )
    n_rw = rw.rw_counter - 9

    next_mem, mem_gas = memory_expansion(
        0, memory_offset + length if length else 0)
    gas = (constant_gas_cost(Opcode.EXTCODECOPY) + mem_gas
           + GAS_COST_COPY * ((length + 31) // 32)
           + (0 if warm else EXTRA_GAS_COST_ACCOUNT_COLD_ACCESS))
    bytecode_rows = list(bytecode.table_assignments())
    if exists:
        bytecode_rows += list(ext_code.table_assignments())
    tables = Tables(
        block_table=Block().table_assignments(),
        bytecode_table=bytecode_rows,
        rw_table=rw.rws,
        copy_table=copy_circuit_to_table(copy_circuit),
    )
    steps = [
        StepState(
            execution_state=ExecutionState.EXTCODECOPY, rw_counter=9,
            call_id=1, is_root=True, code_hash=h, program_counter=132,
            stack_pointer=1020, gas_left=gas,
        ),
        StepState(
            execution_state=ExecutionState.STOP, rw_counter=9 + n_rw,
            call_id=1, is_root=True, code_hash=h, program_counter=133,
            stack_pointer=1024, gas_left=0, memory_word_size=next_mem,
            reversible_write_counter=1,
        ),
    ]
    verify_steps(tables=tables, steps=steps)


# -- RETURNDATACOPY boundary sweep (reference tests/evm/
#    test_returndatacopy.py TESTING_DATA: dest_offset x offset x size x
#    returndata region) ------------------------------------------------------

@pytest.mark.parametrize("dest_offset,data_offset,size,rd_offset,rd_len", [
    (0, 0, 32, 0, 32),      # whole region, aligned
    (100, 0, 32, 0, 32),    # unaligned destination
    (0, 0, 32, 100, 32),    # returndata deep in callee memory
    (100, 31, 1, 100, 32),  # single tail byte, both sides unaligned
    (64, 8, 16, 32, 32),    # interior slice
    (0, 0, 1, 0, 1),        # minimal region
])
def test_returndatacopy_matrix(dest_offset, data_offset, size, rd_offset,
                               rd_len):
    from common import rand_fq

    r = rand_fq()
    last_callee_id = 2
    assert data_offset + size <= rd_len  # in-bound rows only

    bytecode = (
        Bytecode()
        .push(size, n_bytes=32).push(data_offset, n_bytes=32)
        .push(dest_offset, n_bytes=32).returndatacopy().stop()
    )
    h = bytecode.hash()

    rw = (
        RWDictionary(9)
        .stack_read(1, 1021, dest_offset)
        .stack_read(1, 1022, data_offset)
        .stack_read(1, 1023, size)
        .call_context_read(1, CallContextFieldTag.LastCalleeId, last_callee_id)
        .call_context_read(1, CallContextFieldTag.LastCalleeReturnDataLength, rd_len)
        .call_context_read(1, CallContextFieldTag.LastCalleeReturnDataOffset, rd_offset)
    )
    # parity quirk: the gadget (like reference returndatacopy.py:36-42)
    # sources the copy at return_data_offset, NOT + data_offset; the range
    # check still bounds data_offset + size <= rd_len
    src_start = rd_offset
    copy_circuit = CopyCircuit().copy(
        r, rw, last_callee_id, CopyDataTypeTag.Memory, 1,
        CopyDataTypeTag.Memory, src_start, src_start + size, dest_offset,
        size, {src_start + i: (10 + i) % 256 for i in range(size)},
    )
    n_rw = rw.rw_counter - 9

    next_mem, mem_gas = memory_expansion(0, dest_offset + size)
    gas = (constant_gas_cost(Opcode.RETURNDATACOPY) + mem_gas
           + GAS_COST_COPY * ((size + 31) // 32))
    tables = Tables(
        block_table=Block().table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
        copy_table=copy_circuit_to_table(copy_circuit),
    )
    steps = [
        StepState(
            execution_state=ExecutionState.RETURNDATACOPY, rw_counter=9,
            call_id=1, is_root=True, code_hash=h, program_counter=99,
            stack_pointer=1021, gas_left=gas,
        ),
        StepState(
            execution_state=ExecutionState.STOP, rw_counter=9 + n_rw,
            call_id=1, is_root=True, code_hash=h, program_counter=100,
            stack_pointer=1024, gas_left=0, memory_word_size=next_mem,
        ),
    ]
    verify_steps(tables=tables, steps=steps)


# -- LOG in a reverted frame (reference test_logs.py is_persistent=False
#    rows: no tx-log writes materialize and log_id does not advance) --------

@pytest.mark.parametrize("n_topics,msize,mstart", [
    (0, 2, 10), (1, 3, 20), (2, 20, 100), (3, 50, 180), (4, 15, 421),
])
def test_log_reverted(n_topics, msize, mstart):
    tx_id, callee_addr = 1, rand_address()
    topics = [rand_word() for _ in range(n_topics)]
    opcode = Opcode(int(Opcode.LOG0) + n_topics)

    bytecode = Bytecode()
    for t in reversed(topics):
        bytecode.push(t, n_bytes=32)
    bytecode.push(msize, n_bytes=32).push(mstart, n_bytes=32)
    getattr(bytecode, opcode.name.lower())()
    bytecode.stop()
    h = bytecode.hash()

    sp0 = 1024 - 2 - n_topics
    rw = (
        RWDictionary(9)
        .stack_read(1, sp0, mstart)
        .stack_read(1, sp0 + 1, msize)
        .call_context_read(1, CallContextFieldTag.TxId, tx_id)
        .call_context_read(1, CallContextFieldTag.IsStatic, 0)
        .call_context_read(1, CallContextFieldTag.CalleeAddress, callee_addr)
        .call_context_read(1, CallContextFieldTag.IsPersistent, 0)
    )
    for i, t in enumerate(topics):
        rw.stack_read(1, sp0 + 2 + i, t)
    n_rw = rw.rw_counter - 9

    next_mem, mem_gas = memory_expansion(0, mstart + msize if msize else 0)
    gas = (constant_gas_cost(opcode) + GAS_COST_LOG + GAS_COST_LOG * n_topics
           + GAS_COST_LOGDATA * msize + mem_gas)
    tables = Tables(
        block_table=Block().table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
    )
    pc0 = 33 * (2 + n_topics)
    steps = [
        StepState(
            execution_state=ExecutionState.LOG, rw_counter=9, call_id=1,
            is_root=True, code_hash=h, program_counter=pc0,
            stack_pointer=sp0, gas_left=gas, log_id=0,
        ),
        StepState(
            execution_state=ExecutionState.STOP, rw_counter=9 + n_rw,
            call_id=1, is_root=True, code_hash=h, program_counter=pc0 + 1,
            stack_pointer=sp0 + 2 + n_topics, gas_left=0,
            memory_word_size=next_mem, log_id=0,  # reverted: log_id unchanged
        ),
    ]
    verify_steps(tables=tables, steps=steps)


def test_log_static_context_rejected():
    """LOG under IsStatic=1 must not verify (write-protection invariant
    inside the gadget; the tracer classifies it ErrorWriteProtection)."""
    bytecode = (Bytecode().push(4, n_bytes=32).push(0, n_bytes=32)
                .log0().stop())
    h = bytecode.hash()
    rw = (
        RWDictionary(9)
        .stack_read(1, 1022, 0)
        .stack_read(1, 1023, 4)
        .call_context_read(1, CallContextFieldTag.TxId, 1)
        .call_context_read(1, CallContextFieldTag.IsStatic, 1)
        .call_context_read(1, CallContextFieldTag.CalleeAddress, 0xAA)
        .call_context_read(1, CallContextFieldTag.IsPersistent, 1)
        .tx_log_write(1, 1, TxLogFieldTag.Address, 0, 0xAA)
    )
    tables = Tables(
        block_table=Block().table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
    )
    steps = [
        StepState(
            execution_state=ExecutionState.LOG, rw_counter=9, call_id=1,
            is_root=True, code_hash=h, program_counter=66,
            stack_pointer=1022, gas_left=10000, log_id=0,
        ),
        StepState(
            execution_state=ExecutionState.STOP, rw_counter=16, call_id=1,
            is_root=True, code_hash=h, program_counter=67,
            stack_pointer=1024, gas_left=0, log_id=1,
        ),
    ]
    verify_steps(tables=tables, steps=steps, success=False)
