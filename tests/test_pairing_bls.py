"""Pairing oracle across curve families: bilinearity + G2 group law.

The pairing is the strongest possible self-check: e(aP, bQ) ==
e(P, Q)^(ab) only holds if the twist construction, untwist map, Miller
loop, and tower arithmetic are all simultaneously correct.  (Reference
scope: ark-bn254/ark-bls12-377 pairing engines used by ark-groth16's
verifier; the reference benches dist-primitives on BLS12-377,
dist-primitives/Cargo.toml:12.)
"""

import random

import pytest

from zksaas_tpu.curves import ref as cref


@pytest.mark.parametrize("family,g1,g2", [
    ("bn254", cref.BN254_G1, cref.BN254_G2),
    ("bls12_381", cref.BLS12_381_G1, cref.BLS12_381_G2),
    ("bls12_377", cref.BLS12_377_G1, cref.BLS12_377_G2),
])
def test_g2_group_and_bilinearity(family, g1, g2):
    rng = random.Random(42)
    r = g1.order
    # G2 sanity: generator on twist, has order r
    assert g2.on_curve(g2.gen)
    assert g2.mul(g2.gen, r) is None
    Q = g2.rand(rng)
    assert g2.on_curve(Q)

    ctx = cref.pairing_ctx(family)
    a = rng.randrange(2, 1 << 64)
    b = rng.randrange(2, 1 << 64)
    P = g1.gen
    Qg = g2.gen
    e_ab = ctx.pairing(g1.mul(P, a), g2.mul(Qg, b))
    e_base = ctx.pairing(P, Qg)
    assert e_ab == e_base ** ((a * b) % r), f"{family}: bilinearity failed"
    assert e_base != ctx.FQ12.one(), f"{family}: degenerate pairing"

    # multi_pairing telescoping: e(aP, Q) * e(-aP, Q) == 1
    one = ctx.multi_pairing(
        [(g1.mul(P, a), Qg), (g1.neg(g1.mul(P, a)), Qg)]
    )
    assert one == ctx.FQ12.one(), f"{family}: multi_pairing not telescoping"
