"""BLS12-381 / BLS12-377 G1 device curves (BASELINE.md names BLS12-381
Fr as the primitives field; the reference's dist-primitives run on
BLS12-377)."""

import random

import numpy as np
import pytest

from zksaas_tpu.curves import curve_g1
from zksaas_tpu.curves.fixed_base import fixed_base_mul


@pytest.mark.parametrize("name", ["bls12_381", "bls12_377"])
def test_bls_g1_ops(name):
    C = curve_g1(name)
    ref = C.ref
    rng = random.Random(101)
    assert ref.on_curve(ref.gen)
    pts = [ref.rand(rng) for _ in range(4)]
    ss = [rng.randrange(ref.order) for _ in range(3)] + [0]
    P = C.encode(pts)
    got = C.decode(C.add(P, P))
    assert got == [ref.add(p, p) for p in pts]
    s = np.asarray(C.fr.encode(ss))
    got = C.decode(C.scalar_mul(P, s))
    assert got == [ref.mul(p, k) for p, k in zip(pts, ss)]


@pytest.mark.parametrize("name", ["bls12_381"])
def test_bls_fixed_base(name):
    C = curve_g1(name)
    rng = random.Random(102)
    ss = [rng.randrange(C.order) for _ in range(4)] + [0, 1]
    s = np.asarray(C.fr.encode(ss))
    got = C.decode(fixed_base_mul(C, s))
    assert got == [C.ref.mul(C.ref.gen, k) for k in ss]
