"""SHA-256 fixture circuit: satisfiability + digest correctness vs
hashlib (the native replacement for the reference's circom sha256
fixture, fixtures/sha256/sha256.circom)."""

import hashlib

from zksaas_tpu.circom.sha256 import sha256_two_inputs


def test_sha256_two_inputs_builds_and_matches_hashlib():
    a, b = 1, 2
    r1cs, z, digest = sha256_two_inputs(a, b)
    msg = a.to_bytes(27, "big") + b.to_bytes(27, "big")
    assert digest == hashlib.sha256(msg).digest()
    assert r1cs.is_satisfied(z)
    # public inputs = the two digest halves
    d = int.from_bytes(digest, "big")
    assert z[1] == d >> 128
    assert z[2] == d & ((1 << 128) - 1)
    assert r1cs.num_constraints > 30000  # real SHA-256 scale


def test_sha256_bad_witness_rejected():
    r1cs, z, _ = sha256_two_inputs(3, 11)
    z_bad = list(z)
    z_bad[5] = (z_bad[5] + 1) % r1cs.spec.p
    assert not r1cs.is_satisfied(z_bad)
