"""Device NTT vs host big-int oracle (and arkworks-compatible domains)."""

import random

import numpy as np
import pytest

from zksaas_tpu.fields import BLS12_377_FR, BN254_FR, field
from zksaas_tpu.ntt import domain, fft_ref, ifft_ref


@pytest.mark.parametrize("spec", [BN254_FR, BLS12_377_FR], ids=lambda s: s.name)
@pytest.mark.parametrize("n", [1, 2, 8, 64, 256])
def test_fft_matches_oracle(spec, n):
    F = field(spec)
    rng = random.Random(7)
    xs = [rng.randrange(spec.p) for _ in range(n)]
    dom = domain(spec, n)
    got = list(F.decode(dom.fft(F.encode(xs))))
    assert got == fft_ref(spec, xs)


@pytest.mark.parametrize("n", [8, 64])
def test_ifft_roundtrip_and_oracle(n):
    spec = BN254_FR
    F = field(spec)
    rng = random.Random(8)
    xs = [rng.randrange(spec.p) for _ in range(n)]
    dom = domain(spec, n)
    coeffs = dom.ifft(F.encode(xs))
    assert list(F.decode(coeffs)) == ifft_ref(spec, xs)
    back = list(F.decode(dom.fft(coeffs)))
    assert back == xs


def test_coset_fft_ifft():
    spec = BN254_FR
    F = field(spec)
    n = 32
    rng = random.Random(9)
    xs = [rng.randrange(spec.p) for _ in range(n)]
    coset = domain(spec, n, spec.generator)
    evals = coset.fft(F.encode(xs))
    assert list(F.decode(evals)) == fft_ref(spec, xs, offset=spec.generator)
    back = coset.ifft(evals)
    assert list(F.decode(back)) == xs


def test_batched_fft():
    spec = BN254_FR
    F = field(spec)
    n, b = 16, 5
    rng = random.Random(10)
    xs = [[rng.randrange(spec.p) for _ in range(n)] for _ in range(b)]
    dom = domain(spec, n)
    got = F.decode(dom.fft(F.encode(xs)))
    for i in range(b):
        assert list(got[i]) == fft_ref(spec, xs[i])


def test_vanishing_and_elements():
    spec = BN254_FR
    n = 16
    dom = domain(spec, n)
    coset = domain(spec, n, spec.generator)
    g = spec.generator
    assert dom.evaluate_vanishing_polynomial(g) == (pow(g, n, spec.p) - 1) % spec.p
    els = coset.elements()
    assert els[0] == g % spec.p
    assert els[3] == (g * pow(dom.group_gen, 3, spec.p)) % spec.p
    # vanishing poly of coset vanishes on its own elements
    assert coset.evaluate_vanishing_polynomial(els[5]) == 0
