"""BLS12-381 / BLS12-377 G1 device curves (BASELINE.md names BLS12-381
Fr as the primitives field; the reference's dist-primitives run on
BLS12-377)."""

import random

import numpy as np
import pytest

from zksaas_tpu.curves import curve_g1, curve_g2
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


@pytest.mark.parametrize("name", ["bls12_381", "bls12_377"])
def test_bls_g2_ops(name):
    """Device G2 over Fq2 with per-curve nonresidue (-1 vs -5):
    add/double/scalar_mul vs the host twist oracle."""
    C = curve_g2(name)
    ref = C.ref
    rng = random.Random(103)
    assert ref.on_curve(ref.gen)
    pts = [ref.rand(rng) for _ in range(3)]
    P = C.encode(pts)
    assert C.decode(C.add(P, P)) == [ref.add(p, p) for p in pts]
    Q = C.encode(pts[::-1])
    assert C.decode(C.add(P, Q)) == [
        ref.add(p, q) for p, q in zip(pts, pts[::-1])
    ]
    ss = [rng.randrange(ref.order) for _ in range(2)] + [0]
    s = np.asarray(C.fr.encode(ss))
    assert C.decode(C.scalar_mul(P, s)) == [
        ref.mul(p, k) for p, k in zip(pts, ss)
    ]


@pytest.mark.parametrize("name", ["bls12_381", "bls12_377"])
def test_bls_g2_fused_core(name):
    """The fused-kernel Fq2 core (numpy eval) handles both nonresidues."""
    from zksaas_tpu.curves.fused import _add_core, _kring

    C = curve_g2(name)
    rng = random.Random(104)
    pts = [C.ref.rand(rng) for _ in range(3)]
    P = C.encode(pts)
    Q = C.encode(pts[::-1])
    ref = C.add(P, Q)
    R = _kring(C.R.F.spec, 2)

    def np_elem(c):
        a = np.asarray(c)
        return (
            [a[:, 0, k] for k in range(a.shape[-1])],
            [a[:, 1, k] for k in range(a.shape[-1])],
        )

    got = _add_core(R, *(np_elem(c) for c in P), *(np_elem(c) for c in Q))
    for r, g in zip(ref, got):
        back = np.stack(
            [np.stack(g[0], axis=-1), np.stack(g[1], axis=-1)], axis=-2
        )
        np.testing.assert_array_equal(np.asarray(r), back)
