"""PI circuit conformance vectors (mirrors reference tests/test_public_inputs.py)."""
import random

import pytest

from zkevm_specs_tpu.circuits.pi import (
    Block,
    PublicData,
    Transaction,
    Withdrawal,
    public_data2witness,
    verify_circuit,
)

rng = random.Random(1234)

MAX_TXS = 2
MAX_CALLDATA = 8
MAX_WD = 3


def rand_u256():
    return rng.randrange(0, 2**256)


def rand_u160():
    return rng.randrange(0, 2**160)


def rand_u64():
    return rng.randrange(0, 2**64)


def rand_block():
    return Block(
        hash=rand_u256(), parent_hash=rand_u256(), uncle_hash=rand_u256(),
        coinbase=rand_u160(), state_root=rand_u256(), tx_hash=rand_u256(),
        receipt_hash=rand_u256(), bloom=bytes(256), prev_randao=rand_u256(),
        number=rand_u64(), gas_limit=rand_u64(), gas_used=rand_u64(),
        time=rand_u64(), extra=b"", mix_digest=rand_u256(), nonce=rand_u64(),
        base_fee=0, withdrawals_root=rand_u256(),
    )


def rand_tx(calldata_len):
    return Transaction(
        nonce=rand_u64(), gas_price=rand_u256(), gas=rand_u64(),
        from_addr=rand_u160(), to_addr=rand_u160(), value=rand_u256(),
        data=bytes(rng.randrange(0, 256) for _ in range(calldata_len)),
        tx_sign_hash=rand_u256(),
    )


def rand_public_data(n_txs, n_wds=MAX_WD):
    # the reference vectors always fill the withdrawal table (positional ids)
    return PublicData(
        chain_id=rand_u64(),
        block=rand_block(),
        state_root_prev=rand_u256(),
        block_hashes=[rand_u256() for _ in range(256)],
        txs=[rand_tx(3) for _ in range(n_txs)],
        withdrawals=[
            Withdrawal(i, rand_u64(), rand_u160(), rand_u64() or 1)
            for i in range(n_wds)
        ],
    )


def test_pi_ok():
    pd = rand_public_data(2)
    witness = public_data2witness(pd, MAX_TXS, MAX_CALLDATA, MAX_WD)
    verify_circuit(witness, MAX_TXS, MAX_CALLDATA, MAX_WD)


def test_pi_single_tx():
    pd = rand_public_data(1)
    witness = public_data2witness(pd, MAX_TXS, MAX_CALLDATA, MAX_WD)
    verify_circuit(witness, MAX_TXS, MAX_CALLDATA, MAX_WD)


def test_pi_bad_digest():
    pd = rand_public_data(1)
    witness = public_data2witness(pd, MAX_TXS, MAX_CALLDATA, MAX_WD)
    witness.rows[0]["rpi_digest"] ^= 1
    witness.public_inputs.pi_keccak ^= 1
    verify_circuit(witness, MAX_TXS, MAX_CALLDATA, MAX_WD, success=False)


def test_pi_bad_byte():
    pd = rand_public_data(1)
    witness = public_data2witness(pd, MAX_TXS, MAX_CALLDATA, MAX_WD)
    witness.rows[100]["rpi_bytes"] = (witness.rows[100]["rpi_bytes"] + 1) % 256
    verify_circuit(witness, MAX_TXS, MAX_CALLDATA, MAX_WD, success=False)


def test_pi_bad_calldata_gas_acc():
    pd = rand_public_data(1)
    witness = public_data2witness(pd, MAX_TXS, MAX_CALLDATA, MAX_WD)
    # corrupt a calldata gas accumulator row
    for r in witness.rows:
        if r["q_tx_calldata"] and r["calldata_gas_cost"]:
            r["calldata_gas_cost"] += 1
            break
    verify_circuit(witness, MAX_TXS, MAX_CALLDATA, MAX_WD, success=False)
