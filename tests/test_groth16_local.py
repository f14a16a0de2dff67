"""Host Groth16 oracle: setup -> prove -> pairing-verify round trips.

This is the stack's stand-in for the arkworks ground truth
(sha256.rs:191-199, :389-415): the distributed prover is later asserted
bit-exact against local_prove."""

import random

import pytest

from zksaas_tpu.circom import ConstraintBuilder
from zksaas_tpu.groth16 import local_prove, setup, verify


def mul_chain_circuit(n_muls: int, x0: int = 3, seed: int = 0):
    """z = x^(2^n) style multiplication chain with one public output."""
    cb = ConstraintBuilder()
    rng = random.Random(seed)
    x = cb.witness(x0)
    val = x0
    for _ in range(n_muls):
        x = cb.mul(x, x)
        val = val * val % cb.spec.p
    # public output: out == x  (linear constraint via mul by 1)
    out = cb.pub_input(val)
    cb.constrain([(1, x)], [(1, 0)], [(1, out)])
    return cb.finalize()


@pytest.mark.parametrize("reduction", ["circom", "libsnark"])
def test_setup_prove_verify(reduction):
    r1cs, z = mul_chain_circuit(6)
    rng = random.Random(99)
    keys = setup(r1cs, rng, reduction=reduction)
    r, s = rng.randrange(r1cs.spec.p), rng.randrange(r1cs.spec.p)
    proof = local_prove(keys, r1cs, z, r, s)
    assert verify(keys, z[1 : r1cs.num_instance], proof)
    # wrong public input must fail
    bad = [(z[1] + 1) % r1cs.spec.p]
    assert not verify(keys, bad, proof)


@pytest.mark.parametrize("fr_name", ["bls12_377_fr", "bls12_381_fr"])
def test_setup_prove_verify_bls(fr_name):
    """Groth16 over the BLS curves (the reference's dist-primitives run
    on BLS12-377, dist-primitives/Cargo.toml:12) — host oracle path."""
    from zksaas_tpu.fields.spec import FIELDS

    cb_spec = FIELDS[fr_name]
    cb = ConstraintBuilder(spec=cb_spec)
    x = cb.witness(3)
    val = 3
    for _ in range(4):
        x = cb.mul(x, x)
        val = val * val % cb_spec.p
    out = cb.pub_input(val)
    cb.constrain([(1, x)], [(1, 0)], [(1, out)])
    r1cs, z = cb.finalize()

    rng = random.Random(7)
    keys = setup(r1cs, rng, reduction="circom")
    r, s = rng.randrange(r1cs.spec.p), rng.randrange(r1cs.spec.p)
    proof = local_prove(keys, r1cs, z, r, s)
    assert verify(keys, z[1 : r1cs.num_instance], proof)
    bad = [(z[1] + 1) % r1cs.spec.p]
    assert not verify(keys, bad, proof)


def test_r1cs_builder_satisfiability():
    r1cs, z = mul_chain_circuit(3)
    assert r1cs.is_satisfied(z)
    z_bad = list(z)
    z_bad[-1] = (z_bad[-1] + 1) % r1cs.spec.p
    assert not r1cs.is_satisfied(z_bad)
