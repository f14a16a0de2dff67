"""Field-kernel correctness vs Python-int oracle.

Oracle pattern mirrors the reference's unit tests (pure-math round trips
with deterministic seeds, secret-sharing/src/pss.rs:226-324): every
device op is checked bit-exact against host big-int arithmetic.
"""

import random

import numpy as np
import pytest

from zksaas_tpu.fields import (
    BLS12_377_FR,
    BLS12_381_FQ,
    BLS12_381_FR,
    BN254_FQ,
    BN254_FR,
    field,
)

SPECS = [BN254_FR, BN254_FQ, BLS12_381_FR, BLS12_381_FQ, BLS12_377_FR]


def rand_elems(spec, n, seed=0):
    rng = random.Random(seed)
    return [rng.randrange(spec.p) for _ in range(n)]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_encode_decode_roundtrip(spec):
    F = field(spec)
    xs = rand_elems(spec, 17) + [0, 1, spec.p - 1]
    arr = F.encode(xs)
    back = F.decode(arr)
    assert list(back) == xs


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_add_sub_neg(spec):
    F = field(spec)
    xs = rand_elems(spec, 32, 1) + [0, 0, spec.p - 1, spec.p - 1]
    ys = rand_elems(spec, 32, 2) + [0, spec.p - 1, 0, spec.p - 1]
    a, b = F.encode(xs), F.encode(ys)
    assert list(F.decode(F.add(a, b))) == [(x + y) % spec.p for x, y in zip(xs, ys)]
    assert list(F.decode(F.sub(a, b))) == [(x - y) % spec.p for x, y in zip(xs, ys)]
    assert list(F.decode(F.neg(a))) == [(-x) % spec.p for x in xs]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_mul(spec):
    F = field(spec)
    xs = rand_elems(spec, 64, 3) + [0, 1, spec.p - 1, spec.p - 1]
    ys = rand_elems(spec, 64, 4) + [spec.p - 1, spec.p - 1, 1, spec.p - 1]
    a, b = F.encode(xs), F.encode(ys)
    assert list(F.decode(F.mul(a, b))) == [(x * y) % spec.p for x, y in zip(xs, ys)]
    assert list(F.decode(F.square(a))) == [(x * x) % spec.p for x in xs]


def test_inv_and_batch_inv():
    spec = BN254_FR
    F = field(spec)
    xs = rand_elems(spec, 16, 5) + [1, spec.p - 1]
    a = F.encode(xs)
    got = list(F.decode(F.inv(a)))
    assert got == [pow(x, -1, spec.p) for x in xs]
    # batch_inv with zeros interleaved (zeros must map to zeros)
    xs2 = xs + [0]
    a2 = F.encode(xs2)
    got2 = list(F.decode(F.batch_inv(a2)))
    expect2 = [pow(x, -1, spec.p) if x else 0 for x in xs2]
    assert got2 == expect2


def test_pow_const_and_muli():
    spec = BLS12_381_FR
    F = field(spec)
    xs = rand_elems(spec, 8, 6)
    a = F.encode(xs)
    for e in (1, 2, 3, 7, 1 << 16, 12345):
        assert list(F.decode(F.pow_const(a, e))) == [pow(x, e, spec.p) for x in xs]
    assert list(F.decode(F.muli(a, 97))) == [(97 * x) % spec.p for x in xs]


def test_rand_uniform_smoke():
    import jax

    spec = BN254_FR
    F = field(spec)
    key = jax.random.PRNGKey(0)
    out = F.decode(F.rand(key, (64,)))
    vals = list(out)
    assert len(set(vals)) == 64  # no collisions
    assert all(0 <= v < spec.p for v in vals)
    # different key -> different values
    out2 = list(F.decode(F.rand(jax.random.PRNGKey(1), (64,))))
    assert out2 != vals


def test_root_of_unity_matches_arkworks_derivation():
    # group_gen for a size-8 domain must satisfy g^8 = 1, g^4 != 1
    for spec in (BN254_FR, BLS12_381_FR, BLS12_377_FR):
        g = spec.root_of_unity(8)
        assert pow(g, 8, spec.p) == 1
        assert pow(g, 4, spec.p) != 1
