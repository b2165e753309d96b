"""CompiledBlockVerifier: production (jit) whole-block verification must
reproduce the spec-mode super-circuit verdict exactly."""
import numpy as np
import pytest

from zkevm_specs_tpu.circuits.super_circuit import verify_super_circuit
from zkevm_specs_tpu.runtime.block import CompiledBlockVerifier
from zkevm_specs_tpu.witness.tracer import trace_block
from zkevm_specs_tpu.witness.typing import Block, Bytecode, Transaction


pytestmark = pytest.mark.slow  # compile-heavy: excluded from `make test-fast`


def _block(n_txs=2, n_ops=6):
    block = Block(base_fee=int(1e9))
    txs = []
    for i in range(n_txs):
        bytecode = Bytecode()
        for j in range(n_ops):
            bytecode.push1(j).push1(j + 1).add().pop()
        bytecode.stop()
        txs.append((Transaction(id=i + 1, gas=100000, gas_price=int(2e9),
                                caller_address=0xFE, callee_address=0xFF + i),
                    bytecode))
    return trace_block(block, txs)


def test_block_jit_ok():
    witness = _block()
    verify_super_circuit(witness)  # spec mode accepts
    CompiledBlockVerifier(witness).verify()  # production mode agrees


def test_block_jit_flags_corrupt_step():
    witness = _block()
    # corrupt one ADD step's gas accounting
    for s in witness.steps:
        if s.execution_state.name == "ADD":
            s.gas_left += 1
            break
    bv = CompiledBlockVerifier(witness)
    with pytest.raises(AssertionError):
        bv.verify()


def test_block_jit_flags_corrupt_rw_value():
    from zkevm_specs_tpu.tables.schemas import RW, Target

    witness = _block()
    # corrupt a stack write in the rw table: EVM circuit lookup or the
    # state circuit consistency must flag it
    corrupted = False
    for row in witness.rw.rws:
        if row["key0"] == int(Target.Stack) and row["rw"] == int(RW.Write):
            row["value"] = (row["value"] + 1) % (1 << 256)
            corrupted = True
            break
    assert corrupted, "no stack write row found to corrupt"
    with pytest.raises(AssertionError):
        CompiledBlockVerifier(witness).verify()


def test_block_jit_padding_lanes_ignored():
    # a 3-step group pads to 4 lanes; the padded lane must not leak into
    # the verdict
    witness = _block(n_txs=1, n_ops=3)
    bv = CompiledBlockVerifier(witness, pad_pow2=True)
    assert all(len(g["curr"]) >= len(g["idxs"]) for g in bv.groups)
    bv.verify()


def _full_witness():
    """A block exercising every sub-circuit kernel: withdrawals (pi + wd),
    signed txs (tx + sig, attached by default tracing), bytecode/keccak."""
    from zkevm_specs_tpu.witness.typing import Withdrawal

    bc = Bytecode().push1(1).push1(2).add().pop().stop()
    txs = [(Transaction(id=1, gas=100000, gas_price=int(2e9),
                        caller_address=0xFE, callee_address=0xFF), bc)]
    wds = [Withdrawal(0, 9, 0xABCD, 100), Withdrawal(1, 10, 0xABCE, 200)]
    w = trace_block(Block(base_fee=int(1e9)), txs, withdrawals=wds)
    assert w.signed_txs is not None  # tracer signs by default
    return w, w.signed_txs


def test_block_jit_all_subcircuits():
    w, signed = _full_witness()
    verify_super_circuit(w)
    bv = CompiledBlockVerifier(w)
    assert {n for n, _ in bv.circuit_kernels} == {
        "prologue", "bytecode", "keccak", "tx", "sig", "withdrawal", "pi"}
    bv.verify()


def test_block_jit_flags_corrupt_subcircuit():
    w, signed = _full_witness()
    w.withdrawals[1].amount = 0  # breaks pi's non-zero-amount rule
    bv = CompiledBlockVerifier(w)
    with pytest.raises(AssertionError):
        bv.verify()


def test_block_jit_corrupt_signature_rejected():
    """A signature from the wrong key recovers a different sender, breaking
    the tx circuit's EVM-table/recovered-signer binding (the block's most
    expensive crypto must actually gate the verdict)."""
    from zkevm_specs_tpu.circuits.tx import sign_tx

    w, signed = _full_witness()
    # re-sign tx 0 with a different (valid) key over the same payload
    w.signed_txs[0] = sign_tx(0xBAD, signed[0], w.chain_id)
    bv = CompiledBlockVerifier(w)
    with pytest.raises(AssertionError):
        bv.verify()


def test_block_spec_corrupt_signature_rejected():
    from zkevm_specs_tpu.circuits.tx import sign_tx

    w, signed = _full_witness()
    w.signed_txs[0] = sign_tx(0xBAD, signed[0], w.chain_id)
    with pytest.raises(AssertionError):
        verify_super_circuit(w)


# -- full mega block through the production path -----------------------------

def test_block_jit_mega_full():
    """The 76-state mega block (reverts, error halts, CREATE/CREATE2,
    precompiles) through CompiledBlockVerifier: forces the copy/exp/ecc/
    sig_trace kernels to execute in production mode alongside the always-on
    prologue/bytecode/keccak/withdrawal/pi kernels."""
    import jax

    from test_block_conformance import mega_full_witness

    # jaxlib's persistent-cache WRITE segfaults serializing this block's
    # largest CPU executables (jax compilation_cache.put_executable_and_time
    # on the AOT export path); disable the on-disk cache for this test only
    cache_dir = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    try:
        w = mega_full_witness(small_pi=True)
        bv = CompiledBlockVerifier(w)
        names = {n for n, _ in bv.circuit_kernels}
        assert {"prologue", "bytecode", "keccak", "copy", "exp", "ecc",
                "sig_trace", "withdrawal", "pi"} <= names, names
        bv.verify()
    finally:
        jax.config.update("jax_compilation_cache_dir", cache_dir)


def _mini_revert_witness():
    bc = Bytecode().push1(0x2A).push1(0x07).sstore().push1(0).push1(0).revert()
    return trace_block(Block(base_fee=int(1e9)),
                       [(Transaction(id=1, gas=100000, gas_price=int(2e9),
                                     caller_address=0xFE, callee_address=0xFF),
                         bc)])


def test_block_jit_revert_and_corrupt_mirror():
    """A reverting block verifies in production mode; corrupting the
    reversion mirror row is caught by the compiled state circuit."""
    w = _mini_revert_witness()
    CompiledBlockVerifier(w).verify()
    from zkevm_specs_tpu.tables.schemas import Target

    w2 = _mini_revert_witness()
    mirrors = [r for r in w2.rw.rws
               if r["key0"] == int(Target.AccountStorage) and r["rw"] == 1]
    mirrors.sort(key=lambda r: r["rw_counter"])
    mirrors[-1]["value"] = 99
    with pytest.raises(AssertionError):
        CompiledBlockVerifier(w2).verify()


# -- one corrupt-witness vector per producer kernel --------------------------

def _events_witness():
    """Small block with copy + exp events and an ecRecover call."""
    from zkevm_specs_tpu.ops.ecc import secp256k1
    from zkevm_specs_tpu.ops.keccak import keccak256

    bc = Bytecode()
    bc.push1(3).push1(2).exp().pop()
    bc.push1(8).push1(0).push1(0).calldatacopy()
    priv = 0xC1C1C1C1C1C1C1C1C1C1C1C1C1C1C1C1C1C1C1C1C1C1C1C1C1C1C1C1C1
    msg_hash = keccak256(b"kernel corrupt vectors")
    v, r, s = secp256k1.sign(int.from_bytes(msg_hash, "big"), priv, k=0x31337)
    calldata = (msg_hash + (27 + v).to_bytes(32, "big")
                + r.to_bytes(32, "big") + s.to_bytes(32, "big"))
    base = 0x100
    for i in range(0, 128, 32):
        bc.push32(int.from_bytes(calldata[i:i + 32], "big")).push2(base + i).mstore()
    bc.push1(32).push1(0).push2(128).push2(base).push1(0).push1(0x01) \
      .push3(0xFFFFF).call().pop()
    bc.stop()
    return trace_block(Block(base_fee=int(1e9)),
                       [(Transaction(id=1, gas=2000000, gas_price=int(2e9),
                                     caller_address=0xFE, callee_address=0xFF,
                                     call_data=bytes(range(8))), bc)])


def test_block_jit_corrupt_copy_kernel():
    w = _events_witness()
    CompiledBlockVerifier(w).verify()  # clean baseline exercises copy kernel
    w2 = _events_witness()
    w2.copy_circuit.rows[0]["value"] += 1
    with pytest.raises(AssertionError):
        CompiledBlockVerifier(w2).verify()


def test_block_jit_corrupt_exp_kernel():
    w = _events_witness()
    w.exp_circuit.rows[0]["exponentiation"] += 1
    with pytest.raises(AssertionError):
        CompiledBlockVerifier(w).verify()


def test_block_jit_corrupt_sig_trace_kernel():
    w = _events_witness()
    w.sig_rows[0].is_valid = not w.sig_rows[0].is_valid
    with pytest.raises(AssertionError):
        CompiledBlockVerifier(w).verify()


def test_block_jit_corrupt_ecc_kernel():
    from zkevm_specs_tpu.circuits.ecc import EcAdd
    from zkevm_specs_tpu.ops.ecc import bn254

    from test_block_precompiles import _call_precompile, _store

    p = bn254.g1_mul(bn254.G1, 2)
    q = bn254.g1_mul(bn254.G1, 3)
    calldata = b"".join(x.to_bytes(32, "big") for x in (*p, *q))
    bc = Bytecode()
    _store(bc, calldata)
    _call_precompile(bc, 0x06, cd=(0, 128), rd=(0, 64))
    bc.stop()
    w = trace_block(Block(base_fee=int(1e9)),
                    [(Transaction(id=1, gas=2000000, gas_price=int(2e9),
                                  caller_address=0xFE, callee_address=0xFF), bc)])
    op = w.ecc_circuit.add_ops[0]
    w.ecc_circuit.add_ops[0] = EcAdd(p=op.p, q=op.q,
                                     out=(op.out[0], op.out[1] + 1))
    with pytest.raises(AssertionError):
        CompiledBlockVerifier(w).verify()


def test_block_jit_corrupt_bytecode_kernel():
    """Unit-level corrupt vector for the bytecode kernel: a flipped byte
    value no longer matches the keccak-table hash."""
    from zkevm_specs_tpu.circuits.bytecode import (
        assign_bytecode_circuit, assign_keccak_table, bytecode_kernel, unroll)

    code = bytes(Bytecode().push1(1).push1(2).add().stop().code)
    keccak_rows = assign_keccak_table([code], 0x100)
    rows = assign_bytecode_circuit(8, [unroll(code)], 0x100)
    rows[2]["value"] ^= 1
    k = bytecode_kernel(rows, keccak_rows, 0x100)
    out = np.asarray(k(k.device_args()))
    assert out.any(), "corrupt bytecode row not flagged"


def test_block_jit_corrupt_keccak_kernel():
    from zkevm_specs_tpu.circuits.bytecode import assign_keccak_table
    from zkevm_specs_tpu.circuits.keccak import keccak_kernel

    data = [b"corrupt keccak"]
    rows = assign_keccak_table(data, 0x100)
    rows[-1]["output"] += 1
    k = keccak_kernel(data, rows, 0x100)
    out = np.asarray(k(k.device_args()))
    assert out.any(), "corrupt keccak output not flagged"


def test_block_jit_corrupt_tx_sig_kernels():
    """Corrupt vectors for the tx and sig kernels (signed-tx path)."""
    from zkevm_specs_tpu.circuits.sig import sig_kernel
    from zkevm_specs_tpu.circuits.super_circuit import sig_witness_from_txs
    from zkevm_specs_tpu.circuits.tx import Transaction as SignedTx
    from zkevm_specs_tpu.circuits.tx import sign_tx, tx_kernel, txs2witness

    signed = [sign_tx(7, SignedTx(nonce=0, gas_price=int(2e9), gas=100000,
                                  to=0xFF, value=0, data=b"", sig_v=0,
                                  sig_r=0, sig_s=0), 1337)]
    from zkevm_specs_tpu.tables.schemas import TxContextFieldTag

    tx_witness = txs2witness(signed, 1337, 2, 8, 0x100)
    for i, row in enumerate(tx_witness.rows):
        if row.tag == int(TxContextFieldTag.CallerAddress):
            # the caller address is bound to the recovered signer
            tx_witness.rows[i] = row._replace(value=row.value + 1)
            break
    k = tx_kernel(tx_witness, 2, 0x100)
    assert np.asarray(k(k.device_args())).any()

    sw = sig_witness_from_txs(signed, 1337, 0x100)
    sw.rows[0].recovered_addr += 1
    k2 = sig_kernel(sw, 0x100)
    assert np.asarray(k2(k2.device_args())).any()


def test_block_jit_corrupt_pi_kernel():
    w, signed = _full_witness()
    # tamper a block-table value AFTER tracing: pi commits the block table,
    # so the raw-byte stream no longer matches the tampered table value
    w.block.coinbase += 1
    with pytest.raises(AssertionError):
        CompiledBlockVerifier(w).verify()


def test_block_jit_combined_pass_matches():
    """The fused single-launch device pass returns the same verdicts as
    the per-kernel path, for both clean and corrupt witnesses."""
    w = _block()
    bv = CompiledBlockVerifier(w)
    prepared = bv.prepare()
    assert bv.run_device(prepared) == {}
    assert bv.run_device_combined(prepared) == {}

    w2 = _block()
    for s in w2.steps:
        if s.execution_state.name == "ADD":
            s.gas_left += 1
            break
    bv2 = CompiledBlockVerifier(w2)
    p2 = bv2.prepare()
    f_per_kernel = bv2.run_device(p2)
    f_combined = bv2.run_device_combined(p2)
    assert f_per_kernel and f_per_kernel == f_combined
