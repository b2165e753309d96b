"""Tx + sig circuit conformance vectors (mirrors reference
tests/test_tx_circuit.py and tests/test_sig_circuit.py)."""
import pytest

from zkevm_specs_tpu.circuits import sig as sig_circuit
from zkevm_specs_tpu.circuits import tx as tx_mod
from zkevm_specs_tpu.circuits.tx import Transaction, sign_tx, txs2witness, verify_circuit
from zkevm_specs_tpu.ops.ecc import secp256k1
from zkevm_specs_tpu.ops.keccak import keccak256

CHAIN_ID = 1337
MAX_TXS = 3
MAX_CALLDATA = 64
R = 12345678901234567890


def make_tx(sk, nonce=0, data=b"", to=0xDEADBEEF):
    tx = Transaction(nonce=nonce, gas_price=int(2e9), gas=21000, to=to,
                     value=int(1e16), data=data, sig_v=0, sig_r=0, sig_s=0)
    return sign_tx(sk, tx, CHAIN_ID)


def test_dummy_signature_valid():
    # the padding chip must pass ECDSA verification (reference
    # tx_circuit.py:405-413 derives it from sk=1, msg=1)
    assert secp256k1.verify(
        tx_mod.DUMMY_MSG_HASH, tx_mod.DUMMY_SIGNATURE[0], tx_mod.DUMMY_SIGNATURE[1],
        tx_mod.DUMMY_PUBLIC_KEY,
    )


def test_tx_circuit_ok():
    txs = [make_tx(3, 0, b"hello"), make_tx(7, 5, b"")]
    witness = txs2witness(txs, CHAIN_ID, MAX_TXS, MAX_CALLDATA, R)
    verify_circuit(witness, MAX_TXS, MAX_CALLDATA, R)


def test_tx_circuit_create_tx():
    txs = [make_tx(11, 1, b"\x60\x00", to=None)]
    witness = txs2witness(txs, CHAIN_ID, MAX_TXS, MAX_CALLDATA, R)
    verify_circuit(witness, MAX_TXS, MAX_CALLDATA, R)


def test_tx_circuit_bad_address():
    txs = [make_tx(3)]
    witness = txs2witness(txs, CHAIN_ID, MAX_TXS, MAX_CALLDATA, R)
    rows = list(witness.rows)
    # corrupt the caller address row
    i = int(tx_mod.Tag.CallerAddress) - 1
    rows[i] = rows[i]._replace(value=rows[i].value ^ 1)
    with pytest.raises(AssertionError):
        verify_circuit(tx_mod.Witness(rows, witness.keccak_table, witness.sign_verifications),
                       MAX_TXS, MAX_CALLDATA, R)


def test_tx_circuit_bad_sig():
    txs = [make_tx(3)]
    witness = txs2witness(txs, CHAIN_ID, MAX_TXS, MAX_CALLDATA, R)
    sv = witness.sign_verifications[0]
    bad = tx_mod.SignVerifyChip(sv.pub_key_hash, sv.address, sv.msg_hash,
                                (sv.signature[0], sv.signature[1] ^ 1),
                                sv.pub_key, sv.msg_hash_int)
    with pytest.raises(AssertionError):
        verify_circuit(
            tx_mod.Witness(witness.rows, witness.keccak_table,
                           [bad] + witness.sign_verifications[1:]),
            MAX_TXS, MAX_CALLDATA, R,
        )


# -- sig circuit ------------------------------------------------------------

def make_sig_row(sk=5, msg=b"zkevm on tpu", valid=True):
    h = keccak256(msg)
    hi = int.from_bytes(h, "big")
    v, r, s = secp256k1.sign(hi, sk, k=0x1234567)
    pub = secp256k1.priv_to_pub(sk)
    if not valid:
        s = (s + 1) % secp256k1.N
    return sig_circuit.SigRow.assign((v, r, s), pub, h, is_valid=valid)


def test_sig_circuit_ok():
    kt = sig_circuit.KeccakTable()
    rows = [make_sig_row(5), make_sig_row(7), make_sig_row(9, valid=False)]
    for row in rows:
        kt.add(secp256k1.pubkey_bytes(row.pub_key), R)
    sig_circuit.verify_circuit(sig_circuit.Witness(rows, kt), R)


def test_sig_circuit_wrong_validity_flag():
    kt = sig_circuit.KeccakTable()
    row = make_sig_row(5, valid=True)
    row.is_valid = False  # claims invalid but signature verifies
    kt.add(secp256k1.pubkey_bytes(row.pub_key), R)
    with pytest.raises(AssertionError):
        sig_circuit.verify_circuit(sig_circuit.Witness([row], kt), R)


def test_sig_circuit_missing_keccak_entry():
    kt = sig_circuit.KeccakTable()
    row = make_sig_row(5)
    with pytest.raises(AssertionError):
        sig_circuit.verify_circuit(sig_circuit.Witness([row], kt), R)
