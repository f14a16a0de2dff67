"""Packed-secret-sharing round trips, mirroring the reference tests at
secret-sharing/src/pss.rs:226-324 and dmsm/mod.rs:127-180."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zksaas_tpu.curves import curve_g1
from zksaas_tpu.fields import BN254_FR
from zksaas_tpu.pss import pss

SPEC = BN254_FR
L = 2


@pytest.fixture(scope="module")
def pp():
    return pss(SPEC, L)


def test_initialize(pp):
    assert pp.t == L and pp.l == L and pp.n == 4 * L
    assert pp.share.n == pp.n
    assert pp.secret.n == L + L and pp.secret.offset == SPEC.generator
    assert pp.secret2.n == 2 * (L + L) and pp.secret2.offset == SPEC.generator


def test_pack_unpack_roundtrip(pp):
    F = pp.F
    rng = random.Random(21)
    secrets = [[rng.randrange(SPEC.p) for _ in range(L)] for _ in range(3)]
    sec = F.encode(secrets)  # (3, l, K)
    rand = pp.rand_pads(jax.random.PRNGKey(0), (3,))
    shares = pp.pack(sec, rand)
    assert shares.shape == (3, pp.n, F.k)
    got = F.decode(pp.unpack(shares))
    assert [list(r) for r in got] == secrets
    # lagrange reconstruction from a subset (degree t+l-1 needs 2l shares;
    # the reference uses n-t+1)
    subset = tuple(range(pp.n - pp.t + 1))
    got_lag = F.decode(pp.lagrange_unpack(shares[:, : pp.n - pp.t + 1], subset))
    # lagrange_unpack uses the secret2 even-index targets; for degree
    # t+l-1 polynomials those coincide with the secret domain points
    assert [list(r) for r in got_lag] == secrets


def test_det_pack_unpack(pp):
    F = pp.F
    rng = random.Random(22)
    secrets = [[rng.randrange(SPEC.p) for _ in range(L)]]
    shares = pp.det_pack(F.encode(secrets))
    got = F.decode(pp.unpack(shares))
    assert [list(r) for r in got] == secrets


def test_multiplication_unpack2_and_lagrange(pp):
    F = pp.F
    rng = random.Random(23)
    secrets = [[rng.randrange(SPEC.p) for _ in range(L)] for _ in range(2)]
    expected = [[(x * x) % SPEC.p for x in row] for row in secrets]
    sec = F.encode(secrets)
    shares = pp.pack(sec, pp.rand_pads(jax.random.PRNGKey(1), (2,)))
    mul_shares = F.mul(shares, shares)
    got = F.decode(pp.unpack2(mul_shares))
    assert [list(r) for r in got] == expected
    # tolerate one dropout (pss.rs:291-311)
    parties = tuple(range(pp.n - 1))
    got_lag = F.decode(pp.lagrange_unpack(mul_shares[:, : pp.n - 1], parties))
    assert [list(r) for r in got_lag] == expected


def test_unpack_missing_shares_dispatch(pp):
    F = pp.F
    rng = random.Random(24)
    secrets = [[rng.randrange(SPEC.p) for _ in range(L)]]
    shares = pp.pack(F.encode(secrets), pp.rand_pads(jax.random.PRNGKey(2), (1,)))
    mul_shares = F.mul(shares, shares)
    full = pp.unpack_missing_shares(mul_shares, tuple(range(pp.n)))
    part = pp.unpack_missing_shares(mul_shares[:, 1:], tuple(range(1, pp.n)))
    assert list(F.decode(full)[0]) == list(F.decode(part)[0])


def test_group_pack_unpack(pp):
    C = curve_g1()
    rng = random.Random(25)
    pts = [C.ref.rand(rng) for _ in range(L)]
    P = C.encode(pts, shape=(1, L))
    shares = pp.det_pack_g(C, P)  # (1?, n) -> matvec acts on last axis
    got = C.decode(pp.unpack_g(C, shares))
    assert got == pts


def test_group_msm_algebra(pp):
    """Packed-share MSM: sum_party MSM(g_shares, f_shares) unpack2-sums to
    the true MSM (reference: dmsm/mod.rs:139-180)."""
    C = curve_g1()
    F = pp.F
    rng = random.Random(26)
    m = 8
    pts = [C.ref.rand(rng) for _ in range(m)]
    scalars = [rng.randrange(SPEC.p) for _ in range(m)]
    expected = C.ref.msm(pts, scalars)

    # pack points (det) and scalars (rand) chunk-wise
    P = C.encode(pts, shape=(m // L, L))
    gshares = pp.det_pack_g(C, P)  # (m/L, n)
    f = F.encode(np.asarray(scalars, dtype=object).reshape(m // L, L))
    fshares = pp.pack(f, pp.rand_pads(jax.random.PRNGKey(3), (m // L,)))  # (m/L, n, K)

    # per-party local MSM over chunks
    gp = tuple(jnp.swapaxes(c, 0, 1) for c in gshares)  # (n, m/L)
    fp = jnp.swapaxes(fshares, 0, 1)  # (n, m/L, K)
    local = jax.jit(lambda g, s: C.sum(C.scalar_mul(g, s), axis=1))(gp, fp)  # (n,) points

    # unpack2 the n result shares -> l secrets, sum them
    result = pp.unpack2_g(C, local)
    total = C.sum(result, axis=0)
    got = C.decode(tuple(c[None] for c in total))[0]
    assert got == expected
