"""Conformance vectors for MLOAD/MSTORE/MSTORE8, SLOAD/SSTORE, MSIZE, and the
copy gadgets CALLDATACOPY/CODECOPY/SHA3 (mirrors the scenarios of reference
tests/evm/test_{memory,storage,calldatacopy,codecopy,sha3}.py)."""
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from zkevm_specs_tpu.evm import (
    Block,
    Bytecode,
    CallContextFieldTag,
    CopyCircuit,
    CopyDataTypeTag,
    ExecutionState,
    KeccakCircuit,
    Opcode,
    RWDictionary,
    StepState,
    Tables,
    Transaction,
    copy_circuit_to_table,
    verify_steps,
)
from zkevm_specs_tpu.evm.opcode import constant_gas_cost
from zkevm_specs_tpu.witness.rlc import linear_combine_bytes
from zkevm_specs_tpu.ops.keccak import keccak256
from common import memory_expansion, rand_fq, rand_word

U256M = (1 << 256) - 1


@pytest.mark.parametrize("opcode,offset,value", [
    (Opcode.MLOAD, 0, rand_word()),
    (Opcode.MLOAD, 100, rand_word()),
    (Opcode.MSTORE, 0, rand_word()),
    (Opcode.MSTORE, 77, rand_word()),
    (Opcode.MSTORE8, 5, rand_word()),
    # word-boundary crossings: offsets 1/31/32/33 straddle 32-byte words
    (Opcode.MLOAD, 1, rand_word()),
    (Opcode.MLOAD, 31, rand_word()),
    (Opcode.MLOAD, 32, rand_word()),
    (Opcode.MSTORE, 1, rand_word()),
    (Opcode.MSTORE, 31, rand_word()),
    (Opcode.MSTORE, 33, rand_word()),
    (Opcode.MSTORE8, 0, rand_word()),
    (Opcode.MSTORE8, 31, rand_word()),
    (Opcode.MSTORE8, 32, rand_word()),
    # nasty values: all-ones, single high bit, zero
    (Opcode.MSTORE, 0, (1 << 256) - 1),
    (Opcode.MSTORE, 0, 1 << 255),
    (Opcode.MSTORE, 0, 0),
    (Opcode.MLOAD, 0, (1 << 256) - 1),
    (Opcode.MSTORE8, 3, (1 << 256) - 1),
    # deep offsets: large linear + quadratic expansion
    (Opcode.MLOAD, 0x1FE0, rand_word()),
    (Opcode.MSTORE, 0x3FFF, rand_word()),
])
def test_memory(opcode, offset, value):
    is_mload = opcode == Opcode.MLOAD
    is_mstore8 = opcode == Opcode.MSTORE8

    bytecode = Bytecode()
    if is_mload:
        bytecode.push(offset, n_bytes=32).mload().stop()
    elif is_mstore8:
        bytecode.push(value, n_bytes=32).push(offset, n_bytes=32).mstore8().stop()
    else:
        bytecode.push(value, n_bytes=32).push(offset, n_bytes=32).mstore().stop()
    h = bytecode.hash()

    rw = RWDictionary(9)
    rw.stack_read(1, 1022 if not is_mload else 1023, offset)
    if is_mload:
        rw.stack_write(1, 1023, value)
    else:
        rw.stack_read(1, 1023, value)
    value_bytes = value.to_bytes(32, "little")
    if is_mstore8:
        rw.memory_write(1, offset, value_bytes[0])
    else:
        for i in range(32):
            b = value_bytes[31 - i]
            if is_mload:
                rw.memory_read(1, offset + i, b)
            else:
                rw.memory_write(1, offset + i, b)

    address = offset + 1 + (0 if is_mstore8 else 31)
    next_mem_size, memory_gas = memory_expansion(0, address)
    gas = constant_gas_cost(opcode) + memory_gas
    n_rw = rw.rw_counter - 9

    tables = Tables(
        block_table=Block().table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
    )
    pc = 33 if is_mload else 66
    steps = [
        StepState(
            execution_state=ExecutionState.MEMORY, rw_counter=9, call_id=1,
            is_root=True, code_hash=h, program_counter=pc,
            stack_pointer=1023 if is_mload else 1022, gas_left=gas,
        ),
        StepState(
            execution_state=ExecutionState.STOP, rw_counter=9 + n_rw, call_id=1,
            is_root=True, code_hash=h, program_counter=pc + 1,
            stack_pointer=1023 if is_mload else 1024, gas_left=0,
            memory_word_size=next_mem_size,
        ),
    ]
    verify_steps(tables=tables, steps=steps)


@pytest.mark.parametrize("warm", [True, False])
def test_sload(warm):
    from zkevm_specs_tpu.utils.param import COLD_SLOAD_COST, WARM_STORAGE_READ_COST

    addr, key, value = 0xCAFE, rand_word(), rand_word()
    bytecode = Bytecode().push(key, n_bytes=32).sload().stop()
    h = bytecode.hash()
    rw = (
        RWDictionary(9)
        .call_context_read(1, CallContextFieldTag.TxId, 1)
        .call_context_read(1, CallContextFieldTag.RwCounterEndOfReversion, 0)
        .call_context_read(1, CallContextFieldTag.IsPersistent, 1)
        .call_context_read(1, CallContextFieldTag.CalleeAddress, addr)
        .stack_read(1, 1023, key)
        .account_storage_read(addr, key, value, 1, value)
        .stack_write(1, 1023, value)
        .tx_access_list_account_storage_write(1, addr, key, True, warm)
    )
    gas = WARM_STORAGE_READ_COST if warm else COLD_SLOAD_COST
    tables = Tables(
        block_table=Block().table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
    )
    steps = [
        StepState(
            execution_state=ExecutionState.SLOAD, rw_counter=9, call_id=1,
            is_root=True, code_hash=h, program_counter=33, stack_pointer=1023,
            gas_left=gas,
        ),
        StepState(
            execution_state=ExecutionState.STOP, rw_counter=17, call_id=1,
            is_root=True, code_hash=h, program_counter=34, stack_pointer=1023,
            gas_left=0, reversible_write_counter=1,
        ),
    ]
    verify_steps(tables=tables, steps=steps)


@pytest.mark.parametrize("value,value_prev,original,warm", [
    (100, 0, 0, False),      # fresh set, cold
    (100, 100, 100, True),   # idempotent, warm
    (0, 100, 100, True),     # clear -> refund
    (100, 50, 0, True),      # dirty overwrite
])
def test_sstore(value, value_prev, original, warm):
    from zkevm_specs_tpu.utils.param import (
        COLD_SLOAD_COST, SLOAD_GAS, SSTORE_CLEARS_SCHEDULE,
        SSTORE_RESET_GAS, SSTORE_SET_GAS,
    )

    addr, key = 0xCAFE, rand_word()
    # EIP-3529 refund bookkeeping (mirrors reference witness side)
    refund_prev = 10000
    refund = refund_prev
    if value != value_prev:
        if original == value_prev:
            if original != 0 and value == 0:
                refund += SSTORE_CLEARS_SCHEDULE
        else:
            if original != 0:
                if value_prev == 0:
                    refund -= SSTORE_CLEARS_SCHEDULE
                if value == 0:
                    refund += SSTORE_CLEARS_SCHEDULE
            if original == value:
                if original == 0:
                    refund += SSTORE_SET_GAS - SLOAD_GAS
                else:
                    refund += SSTORE_RESET_GAS - SLOAD_GAS

    if value == value_prev or value_prev != original:
        warm_gas = SLOAD_GAS
    elif original == 0:
        warm_gas = SSTORE_SET_GAS
    else:
        warm_gas = SSTORE_RESET_GAS
    gas = warm_gas if warm else warm_gas + COLD_SLOAD_COST

    bytecode = (
        Bytecode().push(value, n_bytes=32).push(key, n_bytes=32).sstore().stop()
    )
    h = bytecode.hash()
    rw = (
        RWDictionary(9)
        .call_context_read(1, CallContextFieldTag.TxId, 1)
        .call_context_read(1, CallContextFieldTag.IsStatic, 0)
        .call_context_read(1, CallContextFieldTag.RwCounterEndOfReversion, 0)
        .call_context_read(1, CallContextFieldTag.IsPersistent, 1)
        .call_context_read(1, CallContextFieldTag.CalleeAddress, addr)
        .stack_read(1, 1022, key)
        .stack_read(1, 1023, value)
        .account_storage_write(addr, key, value, value_prev, 1, original)
        .tx_access_list_account_storage_write(1, addr, key, True, warm)
        .tx_refund_write(1, refund, refund_prev)
    )
    tables = Tables(
        block_table=Block().table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
    )
    steps = [
        StepState(
            execution_state=ExecutionState.SSTORE, rw_counter=9, call_id=1,
            is_root=True, code_hash=h, program_counter=66, stack_pointer=1022,
            gas_left=gas,
        ),
        StepState(
            execution_state=ExecutionState.STOP, rw_counter=19, call_id=1,
            is_root=True, code_hash=h, program_counter=67, stack_pointer=1024,
            gas_left=0, reversible_write_counter=3,
        ),
    ]
    verify_steps(tables=tables, steps=steps)


@pytest.mark.parametrize("length,is_root", [(8, True), (0, True), (8, False)])
def test_calldatacopy(length, is_root):
    from zkevm_specs_tpu.utils.param import GAS_COST_COPY

    r = rand_fq()
    call_data = bytes(range(1, 41))
    memory_offset, data_offset = 0, 4
    cd_offset = 0 if is_root else 64
    call_id, src_id = 1, (1 if is_root else 2)

    bytecode = (
        Bytecode()
        .push(length, n_bytes=32).push(data_offset, n_bytes=32)
        .push(memory_offset, n_bytes=32).calldatacopy().stop()
    )
    h = bytecode.hash()

    rw = (
        RWDictionary(9)
        .stack_read(call_id, 1021, memory_offset)
        .stack_read(call_id, 1022, data_offset)
        .stack_read(call_id, 1023, length)
        .call_context_read(call_id, CallContextFieldTag.TxId if is_root else CallContextFieldTag.CallerId, src_id)
        .call_context_read(call_id, CallContextFieldTag.CallDataLength, len(call_data))
    )
    if not is_root:
        rw.call_context_read(call_id, CallContextFieldTag.CallDataOffset, cd_offset)

    copy_circuit = CopyCircuit()
    if length:
        if is_root:
            src_data = {data_offset + i: call_data[data_offset + i] for i in range(length)}
            copy_circuit.copy(
                r, rw, src_id, CopyDataTypeTag.TxCalldata, call_id,
                CopyDataTypeTag.Memory, cd_offset + data_offset,
                cd_offset + len(call_data), memory_offset, length, src_data,
            )
        else:
            src_data = {
                cd_offset + data_offset + i: call_data[data_offset + i]
                for i in range(length)
            }
            copy_circuit.copy(
                r, rw, src_id, CopyDataTypeTag.Memory, call_id,
                CopyDataTypeTag.Memory, cd_offset + data_offset,
                cd_offset + len(call_data), memory_offset, length, src_data,
            )

    next_mem, mem_gas = memory_expansion(0, memory_offset + length if length else 0)
    gas = constant_gas_cost(Opcode.CALLDATACOPY) + mem_gas + GAS_COST_COPY * ((length + 31) // 32)
    n_rw = rw.rw_counter - 9

    tables = Tables(
        block_table=Block().table_assignments(),
        tx_table=Transaction(id=1, call_data=call_data).table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
        copy_table=copy_circuit_to_table(copy_circuit),
    )
    steps = [
        StepState(
            execution_state=ExecutionState.CALLDATACOPY, rw_counter=9,
            call_id=call_id, is_root=is_root, code_hash=h, program_counter=99,
            stack_pointer=1021, gas_left=gas,
        ),
        StepState(
            execution_state=ExecutionState.STOP, rw_counter=9 + n_rw,
            call_id=call_id, is_root=is_root, code_hash=h, program_counter=100,
            stack_pointer=1024, gas_left=0, memory_word_size=next_mem,
        ),
    ]
    verify_steps(tables=tables, steps=steps)


@pytest.mark.parametrize("offset,length", [
    (0, 5), (0, 0),
    # the reference's sweep (test_sha3.py:28-32): word-aligned, unaligned
    # multi-word, and zero length at a deep offset
    (0x20, 0x40), (0x101, 0x202), (0x202, 0x00),
])
@pytest.mark.parametrize("corrupt_hash", [False, True])
def test_sha3(offset, length, corrupt_hash):
    from zkevm_specs_tpu.utils.param import GAS_COST_COPY_SHA3

    r = rand_fq()
    data = bytes((10 + i) % 256 for i in range(length))
    sha3_out = int.from_bytes(keccak256(data), "big")
    if corrupt_hash:
        sha3_out = (sha3_out + 1) % (1 << 256)  # keccak lookup must reject

    bytecode = (
        Bytecode().push(length, n_bytes=32).push(offset, n_bytes=32).sha3().stop()
    )
    h = bytecode.hash()
    rw = (
        RWDictionary(9)
        .stack_read(1, 1022, offset)
        .stack_read(1, 1023, length)
        .stack_write(1, 1023, sha3_out)
    )
    copy_circuit = CopyCircuit()
    keccak_circuit = KeccakCircuit()
    if length:
        src_data = {offset + i: data[i] for i in range(length)}
        copy_circuit.copy(
            r, rw, 1, CopyDataTypeTag.Memory, 1, CopyDataTypeTag.RlcAcc,
            offset, offset + length, 0, length, src_data,
        )
        rlc = linear_combine_bytes(bytes(reversed(data)), r, range_check=False)
    else:
        rlc = 0
    keccak_circuit.add(data, r)

    next_mem, mem_gas = memory_expansion(0, offset + length if length else 0)
    gas = constant_gas_cost(Opcode.SHA3) + mem_gas + GAS_COST_COPY_SHA3 * ((length + 31) // 32)
    n_rw = rw.rw_counter - 9
    curr_mem = 0

    tables = Tables(
        block_table=Block().table_assignments(),
        bytecode_table=bytecode.table_assignments(),
        rw_table=rw.rws,
        copy_table=copy_circuit_to_table(copy_circuit),
        keccak_table=keccak_circuit.rows,
    )
    steps = [
        StepState(
            execution_state=ExecutionState.SHA3, rw_counter=9, call_id=1,
            is_root=True, code_hash=h, program_counter=66, stack_pointer=1022,
            gas_left=gas, memory_word_size=curr_mem,
        ),
        StepState(
            execution_state=ExecutionState.STOP, rw_counter=9 + n_rw, call_id=1,
            is_root=True, code_hash=h, program_counter=67, stack_pointer=1023,
            gas_left=0, memory_word_size=next_mem,
        ),
    ]
    verify_steps(tables=tables, steps=steps, success=not corrupt_hash)
