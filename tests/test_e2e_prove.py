"""End-to-end distributed Groth16 prove == local prove, verified.

The TPU analog of the reference's flagship integration test
(groth16/examples/sha256.rs): dealer packs CRS/QAP/witness/masks, 8
parties run the full d_prove protocol over LocalNet, the dealer
unpack2s the proof shares, and the result must be bit-identical to the
single-machine prover with the same (r, s) AND verify under the pairing
check."""

import random

import jax
import pytest

from zksaas_tpu.circom import ConstraintBuilder
from zksaas_tpu.comm import LocalNet
from zksaas_tpu.curves import curve_g1, curve_g2
from zksaas_tpu.fields import BN254_FR
from zksaas_tpu.groth16 import (
    ProveMasks,
    d_prove,
    local_prove,
    pack_proving_key,
    pack_scalar_repeated,
    pack_witness,
    qap_pack,
    setup,
    verify,
)
from zksaas_tpu.pss import pss

L = 2


def build_circuit():
    """Small mul-chain circuit; domain size 16 (8 constraints + pads)."""
    cb = ConstraintBuilder()
    x = cb.witness(3)
    val = 3
    for _ in range(10):
        x = cb.mul(x, x)
        val = val * val % cb.spec.p
    out = cb.pub_input(val)
    cb.constrain([(1, x)], [(1, 0)], [(1, out)])
    return cb.finalize()


@pytest.mark.slow
def test_distributed_prove_matches_local():
    r1cs, z = build_circuit()
    rng = random.Random(123)
    keys = setup(r1cs, rng, reduction="circom")
    r = rng.randrange(r1cs.spec.p)
    s = rng.randrange(r1cs.spec.p)
    expected = local_prove(keys, r1cs, z, r, s)
    assert verify(keys, z[1 : r1cs.num_instance], expected)

    pp = pss(BN254_FR, L)
    g1, g2 = curve_g1(), curve_g2()
    key = jax.random.PRNGKey(777)
    ks = jax.random.split(key, 7)

    qap_share = qap_pack(pp, r1cs, z, ks[0])
    m = qap_share.dom.n
    crs = pack_proving_key(keys, pp, g1, g2)
    a_share = pack_witness(pp, z[1:], ks[1])
    ax_share = pack_witness(pp, z[r1cs.num_instance :], ks[2])
    r_share = pack_scalar_repeated(pp, r, ks[3])
    s_share = pack_scalar_repeated(pp, s, ks[4])
    masks = ProveMasks.sample(pp, g1, g2, m, ks[5])

    net = LocalNet(pp.n)
    pi_a, pi_b2, pi_c = d_prove(
        pp, g1, g2, crs, qap_share, a_share, ax_share, r_share, s_share,
        masks, net, ks[6],
    )

    # dealer: unpack2 the proof shares (sha256.rs:375-377)
    a = g1.decode(tuple(c[:1] for c in pp.unpack2_g(g1, pi_a)))[0]
    b = g2.decode(tuple(c[:1] for c in pp.unpack2_g(g2, pi_b2)))[0]
    c = g1.decode(tuple(c[:1] for c in pp.unpack2_g(g1, pi_c)))[0]

    assert a == expected.a, "pi_a mismatch"
    assert b == expected.b, "pi_b mismatch"
    assert c == expected.c, "pi_c mismatch"

    from zksaas_tpu.groth16 import Proof

    assert verify(keys, z[1 : r1cs.num_instance], Proof(a=a, b=b, c=c))
