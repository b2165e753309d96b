"""Block-level CREATE/CREATE2 conformance: traced initcode frames with
deployment, reverting initcode, collisions, empty initcode and precheck
failures, verified through every sub-circuit (integrated-witness analog of
reference tests/evm/test_create.py)."""
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))

from zkevm_specs_tpu.circuits.super_circuit import verify_super_circuit
from zkevm_specs_tpu.evm.execution_state import ExecutionState
from zkevm_specs_tpu.ops.keccak import keccak256
from zkevm_specs_tpu.tables.schemas import Target
from zkevm_specs_tpu.witness.rlp import rlp_encode
from zkevm_specs_tpu.witness.tracer import trace_block, tx_sender_address
from zkevm_specs_tpu.witness.typing import Account, Block, Bytecode, Transaction


def _tx(gas=2000000, **kw):
    return Transaction(id=1, gas=gas, gas_price=int(2e9), caller_address=0xFE,
                       callee_address=0xFF, **kw)


def _trace(bc, accounts=None, gas=2000000):
    return trace_block(Block(base_fee=int(1e9)), [(_tx(gas=gas), bc)],
                       accounts=accounts)


def self_replicating_initcode() -> Bytecode:
    """Initcode that deploys its own bytes: CODECOPY(0,0,len); RETURN(0,len).
    Needed because the deploy gadget pins the account CodeHash to the
    initcode frame's code hash (reference return_revert.py:40)."""
    ic = Bytecode()
    # length patched after assembly: the code is 12 bytes long
    ic.push1(12).push1(0).push1(0).codecopy().push1(12).push1(0).return_()
    assert len(ic.code) == 12
    return ic


def reverting_initcode() -> Bytecode:
    return Bytecode().push1(0x31).push1(0x0F).sstore().push1(0).push1(0).revert()


def _store_initcode(bc: Bytecode, initcode: Bytecode, offset=0) -> int:
    """MSTORE the initcode into memory left-aligned at `offset`;
    returns its length."""
    data = bytes(initcode.code)
    for i in range(0, len(data), 32):
        word = int.from_bytes(data[i:i + 32].ljust(32, b"\x00"), "big")
        bc.push32(word).push1(offset + i).mstore()
    return len(data)


def create_address(deployer: int, nonce: int) -> int:
    return int.from_bytes(
        keccak256(rlp_encode([deployer.to_bytes(20, "big"), nonce]))[-20:], "big")


def create2_address(deployer: int, salt: int, init_hash: int) -> int:
    return int.from_bytes(
        keccak256(b"\xff" + deployer.to_bytes(20, "big")
                  + salt.to_bytes(32, "little")
                  + init_hash.to_bytes(32, "little"))[-20:], "big")


def test_block_create_success():
    """CREATE deploys self-replicating code, then the deployed contract is
    CALLed (proving the bytecode actually landed in the world state)."""
    bc = Bytecode()
    size = _store_initcode(bc, self_replicating_initcode())
    bc.push1(size).push1(0).push1(0).create().pop()
    # deployer quirk: the gadget uses the frame's CallerAddress (the tx
    # sender, now the key-derived address) and the post-increment nonce
    # (BeginTx bumped it to 1, CREATE bumps to 2)
    addr = create_address(tx_sender_address(1), 2)
    bc.push1(0).push1(0).push1(0).push1(0).push1(0).push32(addr) \
      .push2(0xFFFF).call().pop()
    bc.stop()
    w = _trace(bc)
    states = {s.execution_state for s in w.steps}
    assert ExecutionState.CREATE in states
    assert ExecutionState.CODECOPY in states  # initcode + deployed runs
    assert w.tx_success == [True]
    verify_super_circuit(w)


def test_block_create2_success():
    bc = Bytecode()
    ic = self_replicating_initcode()
    size = _store_initcode(bc, ic)
    salt = 0x5A17
    bc.push2(salt).push1(size).push1(0).push1(0).create2().pop().stop()
    w = _trace(bc)
    assert ExecutionState.CREATE2 in {s.execution_state for s in w.steps}
    verify_super_circuit(w)


def test_block_create_reverting_initcode():
    """The initcode SSTOREs then REVERTs: the storage write and the value
    transfer are mirror-reverted; CREATE pushes 0."""
    bc = Bytecode()
    size = _store_initcode(bc, reverting_initcode())
    bc.push1(size).push1(0).push1(0).create()
    bc.push1(0).eq()  # pushed value must be 0
    bc.pop().stop()
    w = _trace(bc)
    assert w.tx_success == [True]
    sw = [r for r in w.rw.rws if r["key0"] == int(Target.AccountStorage)]
    assert any(r["storage_key"] == 0x0F and r["rw"] == 1 and r["value"] == 0
               for r in sw), "initcode storage write not mirror-reverted"
    verify_super_circuit(w)


def test_block_create_empty_initcode():
    bc = Bytecode().push1(0).push1(0).push1(0).create().pop().stop()
    w = _trace(bc)
    verify_super_circuit(w)


def test_block_create2_collision():
    """Two identical CREATE2s: the second hits the address collision and
    pushes 0."""
    bc = Bytecode()
    ic = self_replicating_initcode()
    size = _store_initcode(bc, ic)
    salt = 0x77
    for _ in range(2):
        bc.push1(salt).push1(size).push1(0).push1(0).create2().pop()
    bc.stop()
    w = _trace(bc)
    verify_super_circuit(w)


def test_block_create_insufficient_balance():
    """CREATE with value > balance fails the precheck and pushes 0."""
    bc = Bytecode()
    size = _store_initcode(bc, self_replicating_initcode())
    bc.push1(size).push1(0).push2(0x8000).create().pop().stop()
    w = _trace(bc)
    verify_super_circuit(w)


def test_block_create_corrupt_deployed_hash_rejected():
    bc = Bytecode()
    size = _store_initcode(bc, self_replicating_initcode())
    bc.push1(size).push1(0).push1(0).create().pop().stop()
    w = _trace(bc)
    from zkevm_specs_tpu.tables.schemas import AccountFieldTag

    for r in w.rw.rws:
        if (r["key0"] == int(Target.Account)
                and r["field_tag"] == int(AccountFieldTag.CodeHash)
                and r["rw"] == 1):
            r["value"] += 1
    with pytest.raises(AssertionError):
        verify_super_circuit(w)


def test_block_create_in_subcall():
    """CREATE executed inside a CALL frame (deployer = the subcall frame's
    caller, i.e. the root contract 0xFF)."""
    factory = Bytecode()
    size = _store_initcode(factory, self_replicating_initcode())
    factory.push1(size).push1(0).push1(0).create().pop()
    factory.push1(0).push1(0).return_()
    root = Bytecode()
    root.push1(0).push1(0).push1(0).push1(0).push1(0).push2(0x5000) \
        .push2(0xFFFF).call().pop().stop()
    accounts = {0x5000: Account(address=0x5000, code=factory)}
    w = _trace(root, accounts)
    assert ExecutionState.CREATE in {s.execution_state for s in w.steps}
    verify_super_circuit(w)


def test_block_create_with_value():
    """CREATE transferring value into the new contract (reversible pair
    bound to the initcode frame)."""
    bc = Bytecode()
    size = _store_initcode(bc, self_replicating_initcode())
    bc.push1(size).push1(0).push1(0x45).create().pop().stop()
    accounts = {0xFF: Account(address=0xFF, balance=1000)}
    w = _trace(bc, accounts)
    verify_super_circuit(w)


def test_block_create2_reverting_initcode():
    bc = Bytecode()
    size = _store_initcode(bc, reverting_initcode())
    bc.push1(0x99).push1(size).push1(0).push1(0).create2().pop().stop()
    w = _trace(bc)
    states = {s.execution_state for s in w.steps}
    assert ExecutionState.CREATE2 in states
    verify_super_circuit(w)


def test_block_create_nonce_overflow():
    """Deployer nonce at u64 max fails the precheck (create.py:82)."""
    bc = Bytecode()
    size = _store_initcode(bc, self_replicating_initcode())
    bc.push1(size).push1(0).push1(0).create().pop().stop()
    # deployer for a root-frame CREATE is the tx sender (accounts pinned
    # to the pre-signing 0xFE follow the sender to its real address)
    accounts = {0xFE: Account(address=0xFE, nonce=(1 << 64) - 2,
                              balance=10**22)}
    # BeginTx bumps the sender nonce, landing exactly at the limit
    w = trace_block(Block(base_fee=int(1e9)),
                    [(Transaction(id=1, gas=2000000, gas_price=int(2e9),
                                  caller_address=0xFE, callee_address=0xFF,
                                  nonce=(1 << 64) - 2), bc)],
                    accounts=accounts)
    verify_super_circuit(w)


def test_block_create_then_call_then_create2_chain():
    """CREATE a contract, CALL it, then CREATE2 another — interleaved
    deployment and execution in one tx."""
    bc = Bytecode()
    size = _store_initcode(bc, self_replicating_initcode())
    bc.push1(size).push1(0).push1(0).create().pop()
    addr = create_address(tx_sender_address(1), 2)
    bc.push1(0).push1(0).push1(0).push1(0).push1(0).push32(addr) \
      .push2(0xFFFF).call().pop()
    bc.push1(0xAB).push1(size).push1(0).push1(0).create2().pop()
    bc.stop()
    w = _trace(bc)
    verify_super_circuit(w)


def test_block_create_corrupt_address_push_rejected():
    """The pushed CREATE result must equal is_success * derived address."""
    bc = Bytecode()
    size = _store_initcode(bc, self_replicating_initcode())
    bc.push1(size).push1(0).push1(0).create().pop().stop()
    w = _trace(bc)
    addr = create_address(tx_sender_address(1), 2)
    corrupted = False
    for r in w.rw.rws:
        if (r["key0"] == int(Target.Stack) and r["rw"] == 1
                and r["value"] == addr):
            r["value"] = addr + 1
            corrupted = True
            break
    assert corrupted, "CREATE result stack write not found"
    with pytest.raises(AssertionError):
        verify_super_circuit(w)


def test_block_create_corrupt_initcode_copy_rejected():
    bc = Bytecode()
    size = _store_initcode(bc, self_replicating_initcode())
    bc.push1(size).push1(0).push1(0).create().pop().stop()
    w = _trace(bc)
    for row in w.copy_circuit.rows:
        if row["tag"] == 1:  # Bytecode dst side of the initcode copy
            row["value"] ^= 1
            break
    with pytest.raises(AssertionError):
        verify_super_circuit(w)


# -- initcode-halt error states ----------------------------------------------

def _factory_call(root, target, gas_arg=0xFFFF):
    root.push1(0).push1(0).push1(0).push1(0).push1(0).push2(target) \
        .push3(gas_arg).call().pop()
    return root


def test_block_error_invalid_creation_code():
    """Initcode returning 0xEF as the first byte (EIP-3541)."""
    ic = Bytecode().push1(0xEF).push1(0).mstore8().push1(1).push1(0).return_()
    factory = Bytecode()
    size = _store_initcode(factory, ic)
    factory.push1(size).push1(0).push1(0).create().pop().stop()
    root = _factory_call(Bytecode(), 0x5000, 0xFFFFF).stop()
    accounts = {0x5000: Account(address=0x5000, code=factory)}
    w = _trace(root, accounts)
    assert ExecutionState.ErrorInvalidCreationCode in {
        s.execution_state for s in w.steps}
    verify_super_circuit(w)


def test_block_error_max_code_size():
    """Initcode returning more than MAX_CODE_SIZE bytes."""
    ic = Bytecode().push3(30000).push1(0).return_()
    factory = Bytecode()
    size = _store_initcode(factory, ic)
    factory.push1(size).push1(0).push1(0).create().pop().stop()
    root = _factory_call(Bytecode(), 0x5000, 0x7FFFF).stop()
    accounts = {0x5000: Account(address=0x5000, code=factory)}
    w = _trace(root, accounts, gas=3000000)
    assert ExecutionState.ErrorMaxCodeSizeExceeded in {
        s.execution_state for s in w.steps}
    verify_super_circuit(w)


def test_block_error_oog_code_store():
    """Initcode that can run but cannot afford the 200 gas/byte deposit."""
    ic = self_replicating_initcode()
    factory = Bytecode()
    size = _store_initcode(factory, ic)
    # the initcode needs ~24 gas to run; deposit needs 12*200 = 2400
    factory.push1(size).push1(0).push1(0).create().pop().stop()
    root = Bytecode()
    # gas argument bounds the FACTORY, which then forwards all-but-1/64th
    # to the initcode frame: pick it so the initcode gets ~33k-ish minus
    # the factory's own spend, landing under the deposit cost
    _factory_call(root, 0x5000, 34000).stop()
    accounts = {0x5000: Account(address=0x5000, code=factory)}
    w = _trace(root, accounts)
    assert ExecutionState.ErrorOutOfGasCodeStore in {
        s.execution_state for s in w.steps}
    verify_super_circuit(w)


def test_block_error_oog_create():
    """CREATE in a subframe without gas for the static+initcode-word cost."""
    factory = Bytecode()
    size = _store_initcode(factory, self_replicating_initcode())
    factory.push1(size).push1(0).push1(0).create()
    # window: >= CREATE constant gas (32000) but < +initcode-word (2)
    root = _factory_call(Bytecode(), 0x5000, 32022).stop()
    accounts = {0x5000: Account(address=0x5000, code=factory)}
    w = _trace(root, accounts)
    assert ExecutionState.ErrorOutOfGasCREATE in {
        s.execution_state for s in w.steps}
    verify_super_circuit(w)


def test_block_create_in_reverting_caller():
    """CREATE inside a callee frame that later REVERTs: the deployment's
    reversible writes (nonce bump, code-hash write) carry reversion slots
    and the deployed account is rolled back (reference test_create.py
    create_contexts[1], is_persistent=False)."""
    factory = Bytecode()
    n = _store_initcode(factory, self_replicating_initcode())
    factory.push1(n).push1(0).push1(0).create().pop()
    factory.push1(0).push1(0).revert()
    caller = Bytecode()
    caller.push1(0).push1(0).push1(0).push1(0).push1(0).push2(0x7000) \
          .push3(0xFFFFF).call().pop().stop()
    accounts = {0x7000: Account(address=0x7000, code=factory)}
    w = _trace(caller, accounts)
    states = {s.execution_state for s in w.steps}
    assert ExecutionState.CREATE in states
    # REVERT shares the RETURN state (reference registers one gadget)
    assert ExecutionState.RETURN in states
    assert w.tx_success == [True]
    verify_super_circuit(w)


def test_block_create2_in_reverting_caller():
    factory = Bytecode()
    n = _store_initcode(factory, self_replicating_initcode())
    factory.push1(0x5A).push1(n).push1(0).push1(0).create2().pop()
    factory.push1(0).push1(0).revert()
    caller = Bytecode()
    caller.push1(0).push1(0).push1(0).push1(0).push1(0).push2(0x7000) \
          .push3(0xFFFFF).call().pop().stop()
    accounts = {0x7000: Account(address=0x7000, code=factory)}
    w = _trace(caller, accounts)
    states = {s.execution_state for s in w.steps}
    assert ExecutionState.CREATE2 in states
    assert ExecutionState.RETURN in states  # the factory's REVERT
    verify_super_circuit(w)


def test_block_create_then_recreate_same_nonce_path():
    """Two sequential CREATEs from one frame: the second uses the bumped
    nonce, so the deployed addresses differ and both accounts verify."""
    bc = Bytecode()
    n = _store_initcode(bc, self_replicating_initcode())
    bc.push1(n).push1(0).push1(0).create()
    bc.push1(n).push1(0).push1(0).create()
    # distinct non-zero addresses on the stack
    bc.eq().iszero()
    bc.stop()
    w = _trace(bc)
    assert [s for s in w.steps
            if s.execution_state == ExecutionState.CREATE]
    verify_super_circuit(w)
