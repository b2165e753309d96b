"""Block-level conformance: one traced block exercising a wide span of
execution states, verified through every sub-circuit (spec mode) — the
whole-block analog of the per-gadget vectors in tests/evm/."""
import pytest

from zkevm_specs_tpu.circuits.super_circuit import verify_super_circuit
from zkevm_specs_tpu.evm.execution_state import ExecutionState
from zkevm_specs_tpu.witness.tracer import trace_block
from zkevm_specs_tpu.witness.typing import Account, Block, Bytecode, Transaction


def wide_program() -> Bytecode:
    """Touches the ALU, comparison, shift, memory, storage, context, copy,
    log and flow families in one root frame."""
    bc = Bytecode()
    # ALU
    bc.push1(3).push1(5).add().pop()
    bc.push1(7).push1(3).sub().pop()
    bc.push1(6).push1(7).mul().pop()
    bc.push1(3).push1(40).div().pop()
    bc.push1(7).push1(40).mod().pop()
    bc.push2(0x0100).push1(2).sdiv().pop()
    bc.push1(7).push1(45).smod().pop()
    bc.push1(5).push1(9).push1(13).addmod().pop()
    bc.push1(5).push1(9).push1(13).mulmod().pop()
    bc.push1(3).push1(2).exp().pop()
    bc.push1(0xFF).push1(0).signextend().pop()
    # comparisons / bitwise
    bc.push1(1).push1(2).lt().pop()
    bc.push1(1).push1(2).gt().pop()
    bc.push1(5).push1(5).eq().pop()
    bc.push1(5).push1(3).slt().pop()
    bc.push1(5).push1(3).sgt().pop()
    bc.push1(0).iszero().pop()
    bc.push1(0b1100).push1(0b1010).and_().pop()
    bc.push1(0b1100).push1(0b1010).or_().pop()
    bc.push1(0b1100).push1(0b1010).xor_().pop()
    bc.push1(5).not_().pop()
    bc.push1(0xAB).push1(31).byte().pop()
    bc.push1(0xF0).push1(4).shl().pop()
    bc.push1(0xF0).push1(4).shr().pop()
    bc.push1(0xF0).push1(2).sar().pop()
    # stack
    bc.push1(11).push1(22).dup2().swap1().pop().pop().pop()
    # memory
    bc.push1(0x42).push1(0).mstore()
    bc.push1(0).mload().pop()
    bc.push1(0x99).push1(33).mstore8()
    bc.msize().pop()
    # storage: cold set, warm update, warm read
    bc.push1(0x11).push1(0x01).sstore()
    bc.push1(0x22).push1(0x01).sstore()
    bc.push1(0x01).sload().pop()
    # context / env
    bc.address().pop()
    bc.caller().pop()
    bc.callvalue().pop()
    bc.calldatasize().pop()
    bc.push1(1).calldataload().pop()
    bc.codesize().pop()
    bc.gasprice().pop()
    bc.origin().pop()
    bc.selfbalance().pop()
    bc.returndatasize().pop()
    bc.coinbase().pop()
    bc.timestamp().pop()
    bc.number().pop()
    bc.gaslimit().pop()
    bc.prevrandao().pop()
    bc.basefee().pop()
    bc.chainid().pop()
    bc.gas().pop()
    bc.pc().pop()
    bc.push1(100).blockhash().pop()
    # account queries (cold then warm)
    bc.push2(0xCAFE).balance().pop()
    bc.push2(0xCAFE).extcodesize().pop()
    bc.push2(0xCAFE).extcodehash().pop()
    bc.push1(2).push1(0).push1(128).push2(0xCAFE).extcodecopy()
    bc.push2(0xBEEF).balance().pop()  # non-existent account
    # copies + hashing
    bc.push1(8).push1(2).push1(64).calldatacopy()
    bc.push1(16).push1(0).push1(96).codecopy()
    bc.push1(8).push1(64).sha3().pop()
    # logs
    bc.push1(4).push1(0).log0()
    bc.push1(0x71).push1(4).push1(0).log1()
    bc.push1(0x72).push1(0x71).push1(4).push1(0).log2()
    bc.jumpdest()
    return bc


def test_block_conformance_wide():
    bc = wide_program()
    bc.stop()
    block = Block(base_fee=int(1e9), number=256,
                  history_hashes=[0x1000 + i for i in range(256)])
    tx = Transaction(id=1, gas=1000000, gas_price=int(2e9),
                     caller_address=0xFE, callee_address=0xFF, value=10,
                     call_data=bytes(range(1, 33)))
    accounts = {
        0xCAFE: Account(address=0xCAFE, balance=1234,
                        code=Bytecode().push1(1).stop()),
    }
    witness = trace_block(block, [(tx, bc)], accounts=accounts)
    states = {s.execution_state for s in witness.steps}
    assert len(states) >= 45, f"only {len(states)} states touched: {sorted(s.name for s in states)}"
    verify_super_circuit(witness)


def test_block_conformance_flow():
    # JUMP forward to a JUMPDEST, then a not-taken JUMPI falls through
    bc = Bytecode()
    bc.push1(4).jump()
    bc.stop()                         # skipped
    bc.jumpdest()                     # pc 4
    bc.push1(0).push1(11).jumpi()     # cond 0: not taken -> falls to pc 9
    bc.push1(1).pop()
    bc.stop()
    block = Block(base_fee=int(1e9))
    tx = Transaction(id=1, gas=100000, gas_price=int(2e9),
                     caller_address=0xFE, callee_address=0xFF)
    witness = trace_block(block, [(tx, bc)])
    states = {s.execution_state for s in witness.steps}
    assert ExecutionState.JUMP in states and ExecutionState.JUMPI in states
    verify_super_circuit(witness)


def test_block_conformance_jumpi_taken():
    bc = Bytecode()
    bc.push1(1).push1(6).jumpi()      # cond 1: taken -> pc 6
    bc.stop()                         # pc 5, skipped
    bc.jumpdest()                     # pc 6
    bc.stop()
    block = Block(base_fee=int(1e9))
    tx = Transaction(id=1, gas=100000, gas_price=int(2e9),
                     caller_address=0xFE, callee_address=0xFF)
    witness = trace_block(block, [(tx, bc)])
    verify_super_circuit(witness)


def test_block_conformance_return_root():
    bc = Bytecode().push1(0x42).push1(0).mstore().push1(32).push1(0).return_()
    block = Block(base_fee=int(1e9))
    tx = Transaction(id=1, gas=100000, gas_price=int(2e9),
                     caller_address=0xFE, callee_address=0xFF)
    witness = trace_block(block, [(tx, bc)])
    states = {s.execution_state for s in witness.steps}
    assert ExecutionState.RETURN in states
    verify_super_circuit(witness)


def test_block_conformance_refund_path():
    # set a slot then clear it: SSTORE refund flows into EndTx's
    # effective-refund accounting
    bc = (Bytecode()
          .push1(0x11).push1(0x01).sstore()
          .push1(0x00).push1(0x01).sstore()
          .stop())
    block = Block(base_fee=int(1e9))
    tx = Transaction(id=1, gas=100000, gas_price=int(2e9),
                     caller_address=0xFE, callee_address=0xFF)
    witness = trace_block(block, [(tx, bc)])
    verify_super_circuit(witness)


def test_block_conformance_corrupt_storage_rejected():
    bc = Bytecode().push1(0x11).push1(0x01).sstore().push1(0x01).sload().pop().stop()
    block = Block(base_fee=int(1e9))
    tx = Transaction(id=1, gas=100000, gas_price=int(2e9),
                     caller_address=0xFE, callee_address=0xFF)
    witness = trace_block(block, [(tx, bc)])
    from zkevm_specs_tpu.tables.schemas import Target

    for row in witness.rw.rws:
        if row["key0"] == int(Target.AccountStorage) and row["rw"] == 0:
            row["value"] ^= 1
            break
    with pytest.raises(AssertionError):
        verify_super_circuit(witness)


def test_block_conformance_mega():
    """Widest single-block trace: the wide program plus the full CALL family
    (CALL with value, STATICCALL, DELEGATECALL, CALLCODE into a returning
    callee), RETURNDATACOPY, and taken/not-taken jumps — ~55 execution
    states verified through every sub-circuit in one coherent witness."""
    bc = wide_program()
    callee = Bytecode().push1(0x42).push1(0).mstore().push1(32).push1(0).return_()
    bc.push1(32).push1(0).push1(0).push1(0).push1(5).push2(0x5000).push2(0xFFFF).call().pop()
    bc.push1(8).push1(0).push2(0x0100).returndatacopy()
    bc.push1(32).push1(0).push1(0).push1(0).push2(0x5000).push2(0xFFFF).staticcall().pop()
    bc.push1(32).push1(0).push1(0).push1(0).push2(0x5000).push2(0xFFFF).delegatecall().pop()
    bc.push1(32).push1(0).push1(0).push1(0).push1(0).push2(0x5000).push2(0xFFFF).callcode().pop()
    # flow: forward JUMP over a dead STOP, then a not-taken JUMPI
    target = len(bc.code) + 5
    bc.push2(target).jump()
    bc.stop()
    bc.jumpdest()
    bc.push1(0).push2(target + 9).jumpi()
    bc.stop()
    block = Block(base_fee=int(1e9), number=256,
                  history_hashes=[0x1000 + i for i in range(256)])
    tx = Transaction(id=1, gas=2000000, gas_price=int(2e9),
                     caller_address=0xFE, callee_address=0xFF, value=10,
                     call_data=bytes(range(1, 33)))
    accounts = {
        0xCAFE: Account(address=0xCAFE, balance=1234,
                        code=Bytecode().push1(1).stop()),
        0x5000: Account(address=0x5000, balance=0, code=callee),
    }
    witness = trace_block(block, [(tx, bc)], accounts=accounts)
    states = {s.execution_state for s in witness.steps}
    assert len(states) >= 55, (
        f"only {len(states)} states touched: {sorted(s.name for s in states)}")
    verify_super_circuit(witness)


# -- full mega block: >=75 of the 83 registered states -----------------------

def mega_full_witness(small_pi: bool = False):
    """Three-tx block covering the success states, the reachable error
    family, reverting frames, CREATE/CREATE2 and the precompiles — the
    widest coherent witness the tracer can produce (>= 75 of 83 registered
    execution states) plus withdrawals.

    ``small_pi``: carry 1 history hash instead of 256 — the CPU jit path's
    LLVM codegen cannot hold the full 256-hash pi program in memory (the
    spec-mode mega keeps the full block table)."""
    from zkevm_specs_tpu.ops.ecc import bn254, secp256k1
    from zkevm_specs_tpu.ops.keccak import keccak256
    from zkevm_specs_tpu.witness.typing import Withdrawal

    # --- tx 1: the wide program + the call family (the original mega) ---
    bc1 = wide_program()
    callee = Bytecode().push1(0x42).push1(0).mstore().push1(32).push1(0).return_()
    bc1.push1(32).push1(0).push1(0).push1(0).push1(5).push2(0x5000).push2(0xFFFF).call().pop()
    bc1.push1(8).push1(0).push2(0x0100).returndatacopy()
    bc1.push1(32).push1(0).push1(0).push1(0).push2(0x5000).push2(0xFFFF).staticcall().pop()
    bc1.push1(32).push1(0).push1(0).push1(0).push2(0x5000).push2(0xFFFF).delegatecall().pop()
    bc1.push1(32).push1(0).push1(0).push1(0).push1(0).push2(0x5000).push2(0xFFFF).callcode().pop()
    target = len(bc1.code) + 5
    bc1.push2(target).jump()
    bc1.stop()
    bc1.jumpdest()
    bc1.push1(0).push2(target + 9).jumpi()
    bc1.stop()

    # --- tx 2: reverting frames + the error family ---
    def subcall(bc, addr, gas_arg):
        bc.push1(0).push1(0).push1(0).push1(0).push1(0).push2(addr) \
          .push3(gas_arg).call().pop()

    bc2 = Bytecode()
    err_callees = {
        0x6001: (Bytecode().push1(0x55).push1(0x09).sstore()
                 .push1(0).push1(0).log1().push1(0).push1(0).revert(), 0xFFFF),
        0x6002: (Bytecode().push1(9).jump(), 0xFFFF),            # invalid jump
        0x6003: (Bytecode().pop(), 0xFFFF),                      # stack underflow
        0x6004: (Bytecode().push1(1).push1(2).add(), 5),         # OOG constant
        0x6005: (Bytecode().push1(0xAB).balance(), 300),         # OOG account access
        0x6006: (Bytecode().push1(0).push3(0x100000).mstore(), 5000),
        0x6007: (Bytecode().push3(0x100000).push1(0).return_(), 5000),
        0x6008: (Bytecode().push3(0x100000).push1(0).push1(0).calldatacopy(), 5000),
        0x6009: (Bytecode().push1(1).push1(2).sstore(), 2000),   # SSTORE sentry
        0x600A: (Bytecode().push3(0x100000).push1(0).log0(), 5000),
        0x600B: (Bytecode().push32(1 << 200).push1(2).exp(), 100),
        0x600C: (Bytecode().push3(0x100000).push1(0).sha3(), 5000),
        0x600D: (Bytecode(), 0xFFFF),                            # placeholder
    }
    invalid = Bytecode()
    invalid.code.append(0xEF)
    invalid.is_code.append(True)
    err_callees[0x600D] = (invalid, 0xFFFF)
    # OOG CALL: callee calls an inner stop contract with too little gas
    inner_stop = Bytecode().stop()
    oog_call = Bytecode()
    oog_call.push1(0).push1(0).push1(0).push1(0).push1(0).push2(0x600F).push2(0xFF).call()
    err_callees[0x600E] = (oog_call, 150)
    err_callees[0x600F] = (inner_stop, 0xFFFF)
    # write protection: STATICCALL into an SSTORE
    wp = Bytecode().push1(1).push1(2).sstore()
    err_callees[0x6010] = (wp, 0)
    # returndata out of bound
    ret1 = Bytecode().push1(1).push1(0).mstore8().push1(1).push1(0).return_()
    rdoob = Bytecode()
    rdoob.push1(1).push1(0).push1(0).push1(0).push2(0x6012).push2(0xFFFF).staticcall().pop()
    rdoob.push1(32).push1(16).push1(0).returndatacopy()
    err_callees[0x6011] = (rdoob, 0xFFFF)
    err_callees[0x6012] = (ret1, 0xFFFF)

    # initcode-halt errors: factories whose CREATE/initcode fails
    def _factory(ic_bytes):
        f = Bytecode()
        data = bytes(ic_bytes.code)
        for i in range(0, len(data), 32):
            word = int.from_bytes(data[i:i + 32].ljust(32, b"\x00"), "big")
            f.push32(word).push1(i).mstore()
        f.push1(len(data)).push1(0).push1(0).create().pop()
        return f

    ic_bad_byte = Bytecode().push1(0xEF).push1(0).mstore8() \
        .push1(1).push1(0).return_()
    ic_self = Bytecode()
    ic_self.push1(12).push1(0).push1(0).codecopy().push1(12).push1(0).return_()
    ic_huge = Bytecode().push3(30000).push1(0).return_()
    err_callees[0x6013] = (_factory(ic_bad_byte), 40000)
    err_callees[0x6014] = (_factory(ic_huge), 40000)
    err_callees[0x6015] = (_factory(ic_self), 34000)
    err_callees[0x6016] = (_factory(ic_self), 32022)
    err_callees[0x6017] = (Bytecode().push32(1 << 65).mload(), 0xFFFF)

    for addr, (code, gas_arg) in err_callees.items():
        if addr in (0x600F, 0x6012):
            continue  # inner helpers, called indirectly
        if addr == 0x6010:
            bc2.push1(0).push1(0).push1(0).push1(0).push2(addr) \
               .push2(0xFFFF).staticcall().pop()
        else:
            subcall(bc2, addr, gas_arg)
    bc2.stop()
    accounts = {0x5000: Account(address=0x5000, balance=0, code=callee)}
    for addr, (code, _) in err_callees.items():
        accounts[addr] = Account(address=addr, code=code)

    # --- tx 3: CREATE/CREATE2 + precompiles ---
    bc3 = Bytecode()
    ic = Bytecode()
    ic.push1(12).push1(0).push1(0).codecopy().push1(12).push1(0).return_()
    data = bytes(ic.code)
    for i in range(0, len(data), 32):
        word = int.from_bytes(data[i:i + 32].ljust(32, b"\x00"), "big")
        bc3.push32(word).push1(i).mstore()
    bc3.push1(len(data)).push1(0).push1(0).create().pop()
    bc3.push1(0x77).push1(len(data)).push1(0).push1(0).create2().pop()
    # ecrecover
    priv = 0xA5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5
    msg_hash = keccak256(b"mega block ecrecover")
    v, r, s = secp256k1.sign(int.from_bytes(msg_hash, "big"), priv, k=0x999)
    calldata = (msg_hash + (27 + v).to_bytes(32, "big")
                + r.to_bytes(32, "big") + s.to_bytes(32, "big"))
    base = 0x200
    for i in range(0, 128, 32):
        bc3.push32(int.from_bytes(calldata[i:i + 32], "big")).push2(base + i).mstore()
    bc3.push1(32).push1(0).push2(128).push2(base).push1(0).push1(0x01) \
       .push3(0xFFFFF).call().pop()
    # identity
    bc3.push1(64).push1(0).push1(64).push2(base).push1(0).push1(0x04) \
       .push3(0xFFFFF).call().pop()
    # bn254 add + mul
    p = bn254.g1_mul(bn254.G1, 2)
    q = bn254.g1_mul(bn254.G1, 3)
    add_cd = b"".join(x.to_bytes(32, "big") for x in (*p, *q))
    b2 = 0x400
    for i in range(0, 128, 32):
        bc3.push32(int.from_bytes(add_cd[i:i + 32], "big")).push2(b2 + i).mstore()
    bc3.push1(64).push1(0).push2(128).push2(b2).push1(0).push1(0x06) \
       .push3(0xFFFFF).call().pop()
    bc3.push1(64).push1(0).push1(96).push2(b2).push1(0).push1(0x07) \
       .push3(0xFFFFF).call().pop()
    # bn254 pairing: e(a*G1, b*G2) * e(-ab*G1, G2) == 1
    a, b = 4, 9
    pp1 = bn254.g1_mul(bn254.G1, a)
    qq1 = bn254.g2_mul(bn254.G2, b)
    pp2 = bn254.g1_mul(bn254.G1, (bn254.R - a * b) % bn254.R)
    qq2 = bn254.G2
    pair_cd = bytearray()
    for (pt, q) in ((pp1, qq1), (pp2, qq2)):
        pair_cd += pt[0].to_bytes(32, "big") + pt[1].to_bytes(32, "big")
        # EVM order: x_c1, x_c0, y_c1, y_c0
        pair_cd += q[0].c[1].to_bytes(32, "big") + q[0].c[0].to_bytes(32, "big")
        pair_cd += q[1].c[1].to_bytes(32, "big") + q[1].c[0].to_bytes(32, "big")
    b3 = 0x600
    for i in range(0, 384, 32):
        bc3.push32(int.from_bytes(pair_cd[i:i + 32], "big")).push2(b3 + i).mstore()
    bc3.push1(32).push1(0).push2(384).push2(b3).push1(0).push1(0x08) \
       .push3(0x3FFFF).call().pop()
    # out-of-gas precompile: ecrecover with only 100 gas (needs 3000)
    bc3.push1(0).push1(0).push1(0).push1(0).push1(0x01).push1(100) \
       .staticcall().pop()
    bc3.stop()

    n_hist = 1 if small_pi else 256
    block = Block(base_fee=int(1e9), number=n_hist,
                  history_hashes=[0x1000 + i for i in range(n_hist)])
    txs = [
        (Transaction(id=1, gas=2000000, gas_price=int(2e9), caller_address=0xFE,
                     callee_address=0xFF, value=10, call_data=bytes(range(1, 33))), bc1),
        (Transaction(id=2, gas=2000000, gas_price=int(2e9), caller_address=0xFE,
                     callee_address=0xF2, nonce=1), bc2),
        (Transaction(id=3, gas=3000000, gas_price=int(2e9), caller_address=0xFE,
                     callee_address=0xF3, nonce=2), bc3),
    ]
    wds = [Withdrawal(id=7, validator_id=1, address=0xD00D, amount=int(2e9)),
           Withdrawal(id=8, validator_id=2, address=0xD00E, amount=int(3e9))]
    return trace_block(block, txs, accounts=accounts, withdrawals=wds)


def test_block_conformance_mega_full():
    from zkevm_specs_tpu.evm.execution import EXECUTION_STATE_IMPL

    w = mega_full_witness()
    states = {s.execution_state for s in w.steps}
    missing = set(EXECUTION_STATE_IMPL) - states
    assert not missing, (
        f"only {len(states)}/{len(EXECUTION_STATE_IMPL)} registered states "
        f"touched; missing: {sorted(s.name for s in missing)}")
    assert w.tx_success == [True, True, True]
    verify_super_circuit(w)
