"""Serialization round trips (arkworks CanonicalSerialize formats)."""

import random

import pytest

from zksaas_tpu.curves import ref as cref
from zksaas_tpu.fields import BN254_FR
from zksaas_tpu.utils.serial import (
    fr_from_bytes,
    fr_to_bytes,
    g1_from_bytes,
    g1_to_bytes,
    g2_from_bytes,
    g2_to_bytes,
    proof_from_bytes,
    proof_to_bytes,
)


def test_fr_roundtrip():
    rng = random.Random(91)
    for x in [0, 1, BN254_FR.p - 1] + [rng.randrange(BN254_FR.p) for _ in range(8)]:
        data = fr_to_bytes(BN254_FR, x)
        assert len(data) == 32
        assert fr_from_bytes(BN254_FR, data) == x


def test_g1_compressed_roundtrip():
    rng = random.Random(92)
    pts = [cref.BN254_G1.rand(rng) for _ in range(8)] + [None]
    for P in pts:
        data = g1_to_bytes(cref.BN254_G1, P)
        assert len(data) == 32
        assert g1_from_bytes(cref.BN254_G1, data) == P
        # negated point differs only in the flag bit
        if P is not None:
            neg = g1_to_bytes(cref.BN254_G1, cref.BN254_G1.neg(P))
            assert neg[:-1] == data[:-1] and neg != data


def test_g2_compressed_roundtrip():
    rng = random.Random(93)
    pts = [cref.BN254_G2.rand(rng) for _ in range(6)] + [None]
    for P in pts:
        data = g2_to_bytes(cref.BN254_G2, P)
        assert len(data) == 64
        assert g2_from_bytes(cref.BN254_G2, data) == P


def test_proof_roundtrip():
    import random as _r

    from zksaas_tpu.circom import ConstraintBuilder
    from zksaas_tpu.groth16 import local_prove, setup, verify

    cb = ConstraintBuilder()
    x = cb.witness(5)
    y = cb.mul(x, x)
    out = cb.pub_input(25)
    cb.constrain([(1, y)], [(1, 0)], [(1, out)])
    r1cs, z = cb.finalize()
    rng = _r.Random(7)
    keys = setup(r1cs, rng)
    proof = local_prove(keys, r1cs, z, rng.randrange(r1cs.spec.p), rng.randrange(r1cs.spec.p))
    blob = proof_to_bytes(proof)
    assert len(blob) == 128
    back = proof_from_bytes(blob)
    assert (back.a, back.b, back.c) == (proof.a, proof.b, proof.c)
    assert verify(keys, z[1 : r1cs.num_instance], back)
