"""Device curve ops vs host affine oracle (G1 over Fq, G2 over Fq2)."""

import random

import numpy as np
import pytest

from zksaas_tpu.curves import curve_g1, curve_g2


def _rand_pts(curve_ref, n, seed):
    rng = random.Random(seed)
    return [curve_ref.rand(rng) for _ in range(n)]


@pytest.mark.parametrize("which", ["g1", "g2"])
def test_add_double_vs_oracle(which):
    C = curve_g1() if which == "g1" else curve_g2()
    ref = C.ref
    pts = _rand_pts(ref, 6, 11)
    qts = _rand_pts(ref, 6, 12)
    # include special cases: inf + P, P + inf, P + P, P + (-P)
    pts += [None, pts[0], pts[1], pts[2]]
    qts += [qts[0], None, pts[1], ref.neg(pts[2])]
    P = C.encode(pts)
    Q = C.encode(qts)
    got = C.decode(C.add(P, Q))
    expect = [ref.add(p, q) for p, q in zip(pts, qts)]
    assert got == expect
    got_dbl = C.decode(C.double(P))
    expect_dbl = [ref.add(p, p) if p is not None else None for p in pts]
    # double of infinity decodes as None; formula yields Z=0 ✓
    assert got_dbl == expect_dbl


@pytest.mark.parametrize("which", ["g1", "g2"])
def test_scalar_mul(which):
    C = curve_g1() if which == "g1" else curve_g2()
    ref = C.ref
    rng = random.Random(13)
    pts = _rand_pts(ref, 4, 14)
    scalars = [rng.randrange(ref.order) for _ in range(3)] + [0]
    P = C.encode(pts)
    s = np.asarray(C.fr.encode(scalars))
    got = C.decode(C.scalar_mul(P, s))
    expect = [ref.mul(p, k) for p, k in zip(pts, scalars)]
    assert got == expect


def test_msm_vs_oracle():
    C = curve_g1()
    ref = C.ref
    rng = random.Random(15)
    m = 16
    pts = _rand_pts(ref, m - 1, 16) + [None]  # include an infinity point
    scalars = [rng.randrange(ref.order) for _ in range(m)]
    P = C.encode(pts)
    s = np.asarray(C.fr.encode(scalars))
    got = C.decode(tuple(c[None] for c in C.msm(P, s)))[0]
    assert got == ref.msm(pts, scalars)


# NOTE: the Pippenger deep-tree scan path and the m > MAX_VIRT HBM
# chunking fallback have NO CPU tests: XLA:CPU cannot compile the fused
# planes kernels at any useful width in CI time (measured > 50 min for
# a single m=16 MSM even with WINDOW=4; eager/disable_jit is just as
# bad at ~10^5 dispatched ops).  Their oracles run ON THE CHIP instead:
# scripts/tpu_fused_check.py asserts msm_pippenger == host big-int
# oracle with a forced small scan width (ku < L, stale-lane recycling
# live) and a forced-small MAX_VIRT (chunk-and-sum path) — part of the
# /verify surface.


def test_matvec():
    C = curve_g1()
    ref = C.ref
    rng = random.Random(17)
    c, r = 2, 4
    pts = _rand_pts(ref, c, 18)
    M = tuple(tuple(rng.randrange(ref.order) for _ in range(c)) for _ in range(r))
    P = C.encode(pts)
    got = C.decode(C.matvec(M, P))
    for i in range(r):
        expect = ref.msm(pts, M[i])
        assert got[i] == expect
