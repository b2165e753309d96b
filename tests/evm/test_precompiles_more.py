"""Vectors for the remaining precompile gadgets: ecMul, ecPairing,
ecRecover, dataCopy (mirrors reference tests/evm/precompiles/ and
test_dataCopy.py scenarios)."""
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from zkevm_specs_tpu.evm import (
    Block,
    Bytecode,
    CallContextFieldTag,
    ExecutionState,
    RWDictionary,
    StepState,
    Tables,
    Transaction,
    verify_steps,
)
from zkevm_specs_tpu.circuits.ecc import EcMul, EcPairing, EccCircuit, ecc_table_rows
from zkevm_specs_tpu.circuits.sig import SigRow
from zkevm_specs_tpu.evm.execution.precompiles import PrecompileAuxData
from zkevm_specs_tpu.ops.ecc import bn254, secp256k1
from zkevm_specs_tpu.ops.keccak import keccak256
from zkevm_specs_tpu.tables.schemas import CopyDataTypeTag
from zkevm_specs_tpu.utils.param import (
    Bn254PairingBaseGas,
    Bn254ScalarMulGas,
    EcrecoverGas,
    IdentityBaseGas,
    IdentityPerWordGas,
)
from zkevm_specs_tpu.witness.rlc import RLC
from zkevm_specs_tpu.witness.typing import CopyCircuit, copy_circuit_to_table
from common import rand_fq

R_KECCAK = 0xABCDEF
CALLER_ID = 1
CALLEE_ID = 24


def _restored_context_rows(rw, caller_hash, read_caller_id=True,
                           ret_offset=0, ret_length=0, caller_gas=100):
    """The caller-context restore sequence every precompile step emits
    (instruction.py step_state_transition_to_restored_context)."""
    if read_caller_id:
        rw.call_context_read(CALLEE_ID, CallContextFieldTag.CallerId, CALLER_ID)
    rw.call_context_read(CALLER_ID, CallContextFieldTag.IsRoot, 1)
    rw.call_context_read(CALLER_ID, CallContextFieldTag.IsCreate, 0)
    rw.call_context_read(CALLER_ID, CallContextFieldTag.CodeHash, caller_hash)
    rw.call_context_read(CALLER_ID, CallContextFieldTag.ProgramCounter, 0)
    rw.call_context_read(CALLER_ID, CallContextFieldTag.StackPointer, 1023)
    rw.call_context_read(CALLER_ID, CallContextFieldTag.GasLeft, caller_gas)
    rw.call_context_read(CALLER_ID, CallContextFieldTag.MemorySize, 0)
    rw.call_context_read(CALLER_ID, CallContextFieldTag.ReversibleWriteCounter, 0)
    rw.call_context_write(CALLER_ID, CallContextFieldTag.LastCalleeId, CALLEE_ID)
    rw.call_context_write(CALLER_ID, CallContextFieldTag.LastCalleeReturnDataOffset, ret_offset)
    rw.call_context_write(CALLER_ID, CallContextFieldTag.LastCalleeReturnDataLength, ret_length)


def _run(state, rw, aux, gas_left, callee_gas_spent, tables_extra=None,
         caller_gas=100):
    caller_bytecode = Bytecode().stop()
    caller_hash = caller_bytecode.hash()
    n_rw = rw.rw_counter - CALLEE_ID
    tables = Tables(
        block_table=Block().table_assignments(),
        tx_table=Transaction().table_assignments(),
        bytecode_table=caller_bytecode.table_assignments(),
        rw_table=rw.rws,
        **(tables_extra or {}),
    )
    steps = [
        StepState(execution_state=state, rw_counter=CALLEE_ID,
                  call_id=CALLEE_ID, is_root=False, code_hash=0,
                  program_counter=0, stack_pointer=1024, gas_left=gas_left,
                  aux_data=aux),
        StepState(execution_state=ExecutionState.STOP,
                  rw_counter=CALLEE_ID + n_rw, call_id=CALLER_ID, is_root=True,
                  code_hash=caller_hash, program_counter=0, stack_pointer=1023,
                  gas_left=caller_gas + (gas_left - callee_gas_spent)),
    ]
    verify_steps(tables=tables, steps=steps)
    return caller_hash


def test_ec_mul_precompile():
    p = bn254.g1_mul(bn254.G1, 5)
    s = 7
    out = bn254.g1_mul(p, s)
    aux = (p[0], p[1], s, out[0], out[1])

    ecc = EccCircuit(4, 4, 4)
    ecc.append_mul(EcMul(p=p, s=s, out=out))

    caller_bytecode = Bytecode().stop()
    caller_hash = caller_bytecode.hash()
    rw = (
        RWDictionary(CALLEE_ID)
        .call_context_read(CALLEE_ID, CallContextFieldTag.IsSuccess, 1)
        .call_context_read(CALLEE_ID, CallContextFieldTag.CalleeAddress, 0x07)
    )
    _restored_context_rows(rw, caller_hash, ret_length=64)
    _run(ExecutionState.BN254_SCALAR_MUL, rw, aux,
         Bn254ScalarMulGas + 11, Bn254ScalarMulGas,
         {"ecc_table": ecc_table_rows(ecc, R_KECCAK)})


def test_ec_pairing_precompile_empty_input():
    # empty calldata: vacuous product of pairings == 1 -> output 1
    ecc = EccCircuit(4, 4, 4)
    ecc.append_pairing(EcPairing(g1_pts=[], g2_pts=[], out=1))
    aux = (0, 0, 1, 1)  # (input_rlc, n_pairs, is_valid, output)

    caller_bytecode = Bytecode().stop()
    caller_hash = caller_bytecode.hash()
    rw = (
        RWDictionary(CALLEE_ID)
        .call_context_read(CALLEE_ID, CallContextFieldTag.IsSuccess, 1)
        .call_context_read(CALLEE_ID, CallContextFieldTag.CallDataLength, 0)
        .call_context_read(CALLEE_ID, CallContextFieldTag.CalleeAddress, 0x08)
    )
    _restored_context_rows(rw, caller_hash, ret_length=32)
    _run(ExecutionState.BN254_PAIRING, rw, aux,
         Bn254PairingBaseGas + 9, Bn254PairingBaseGas,
         {"ecc_table": ecc_table_rows(ecc, R_KECCAK)})


def test_ec_recover_precompile():
    priv = 0xA5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5
    msg_hash_bytes = keccak256(b"zkevm-tpu ecrecover vector")
    msg_hash = int.from_bytes(msg_hash_bytes, "big")
    v, r, s = secp256k1.sign(msg_hash, priv, k=0x1234567)
    pub = secp256k1.priv_to_pub(priv)
    addr = int.from_bytes(keccak256(secp256k1.pubkey_bytes(pub))[-20:], "big")

    keccak_rand = 255
    ib = b"".join(int(x).to_bytes(32, "little") for x in (msg_hash, 27 + v, r, s))
    input_rlc = RLC(bytes(reversed(ib)), keccak_rand, n_bytes=128).expr()
    output_rlc = RLC(bytes(reversed(addr.to_bytes(32, "little"))),
                     keccak_rand, n_bytes=32).expr()
    aux_data = PrecompileAuxData(msg_hash=msg_hash, sig_v=27 + v, sig_r=r,
                                 sig_s=s, recovered_addr=addr,
                                 input_rlc=input_rlc, output_rlc=output_rlc)
    aux = (aux_data, keccak_rand)

    sig_row = SigRow.assign((v, r, s), pub, msg_hash_bytes).table_row()

    caller_bytecode = Bytecode().stop()
    caller_hash = caller_bytecode.hash()
    rw = (
        RWDictionary(CALLEE_ID)
        .call_context_read(CALLEE_ID, CallContextFieldTag.IsSuccess, 1)
        .call_context_read(CALLEE_ID, CallContextFieldTag.CalleeAddress, 0x01)
    )
    _restored_context_rows(rw, caller_hash, ret_length=32)
    _run(ExecutionState.ECRECOVER, rw, aux, EcrecoverGas + 42, EcrecoverGas,
         {"sig_table": [sig_row]})


def test_data_copy_precompile():
    size = 2
    data = bytes([0xAA, 0xBB])
    r = rand_fq()
    cd_offset, rd_offset = 64, 0

    caller_bytecode = Bytecode().stop()
    caller_hash = caller_bytecode.hash()
    rw = (
        RWDictionary(CALLEE_ID)
        .call_context_read(CALLEE_ID, CallContextFieldTag.CalleeAddress, 0x04)
        .call_context_read(CALLEE_ID, CallContextFieldTag.CallerId, CALLER_ID)
        .call_context_read(CALLEE_ID, CallContextFieldTag.CallDataOffset, cd_offset)
        .call_context_read(CALLEE_ID, CallContextFieldTag.CallDataLength, size)
        .call_context_read(CALLEE_ID, CallContextFieldTag.ReturnDataOffset, rd_offset)
        .call_context_read(CALLEE_ID, CallContextFieldTag.ReturnDataLength, size)
    )
    src = {cd_offset + i: data[i] for i in range(size)}
    copy_circuit = (
        CopyCircuit()
        .copy(r, rw, CALLER_ID, CopyDataTypeTag.Memory, CALLER_ID,
              CopyDataTypeTag.Memory, cd_offset, cd_offset + size,
              rd_offset, size, src)
        .copy(r, rw, CALLER_ID, CopyDataTypeTag.Memory, CALLEE_ID,
              CopyDataTypeTag.Memory, cd_offset, cd_offset + size, 0, size, src)
    )
    _restored_context_rows(rw, caller_hash, read_caller_id=False,
                           ret_length=size)
    gas_cost = IdentityBaseGas + IdentityPerWordGas * ((size + 31) // 32)
    _run(ExecutionState.DATACOPY, rw, None, gas_cost + 5, gas_cost,
         {"copy_table": copy_circuit_to_table(copy_circuit)})
