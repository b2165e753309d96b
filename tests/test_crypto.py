"""Crypto primitive tests: secp256k1 ECDSA and BN254 incl. pairing."""
import pytest

from zkevm_specs_tpu.ops.ecc import bn254, secp256k1 as s


def test_secp256k1_sign_verify_recover():
    priv = 0x1234567890ABCDEF1234567890ABCDEF1234567890ABCDEF1234567890ABCDEF
    pub = s.priv_to_pub(priv)
    assert s.is_on_curve(pub)
    msg = 0xDEADBEEF * 7919
    v, r, sig_s = s.sign(msg, priv, k=0xABCDEF0102030405)
    assert s.verify(msg, r, sig_s, pub)
    assert not s.verify(msg + 1, r, sig_s, pub)
    recovered = s.recover(msg, v, r, sig_s)
    assert recovered == pub


def test_secp256k1_reject_bad_sig():
    priv = 7
    pub = s.priv_to_pub(priv)
    assert not s.verify(123, 0, 5, pub)
    assert not s.verify(123, 5, 0, pub)
    assert s.recover(123, 0, 0, 5) is None


def test_bn254_group_ops():
    g = bn254.G1
    assert bn254.g1_is_on_curve(g)
    g2 = bn254.g1_add(g, g)
    g3 = bn254.g1_add(g2, g)
    assert g3 == bn254.g1_mul(g, 3)
    assert bn254.g1_mul(g, bn254.R) is None  # curve order

    h = bn254.G2
    assert bn254.g2_is_on_curve(h)
    assert bn254.g2_in_subgroup(h)
    h5 = bn254.g2_mul(h, 5)
    assert bn254.g2_add(bn254.g2_mul(h, 2), bn254.g2_mul(h, 3)) == h5


def test_bn254_fq2_fq12():
    a = bn254.FQ2([3, 5])
    assert (a * a.inv()) == bn254.FQ2.one()
    b = bn254.FQ12([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12])
    assert (b * b.inv()) == bn254.FQ12.one()


@pytest.mark.slow
def test_bn254_pairing_bilinear():
    g1, g2 = bn254.G1, bn254.G2
    neg_g1 = (g1[0], (-g1[1]) % bn254.P)
    # e(G1,G2) * e(-G1,G2) == 1
    assert bn254.pairing_check([(g1, g2), (neg_g1, g2)])
    # e(2G1, 3G2) * e(-6G1, G2) == 1
    p2 = bn254.g1_mul(g1, 2)
    q3 = bn254.g2_mul(g2, 3)
    p6n = bn254.g1_mul(neg_g1, 6)
    assert bn254.pairing_check([(p2, q3), (p6n, g2)])
    # and a failing case
    assert not bn254.pairing_check([(p2, q3), (neg_g1, g2)])
