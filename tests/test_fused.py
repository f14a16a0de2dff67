"""Fused Pallas point-kernel tests (curves/fused.py, fields/kernel_lib.py).

Runs the exact TPU kernels under the Pallas CPU interpreter and asserts
them bit-identical to the composite jnp path (which is itself asserted
against host big-int oracles in test_curve.py / test_field.py).
Covers the complete-add special cases: P == Q, P == -Q, either side at
infinity.  Reference semantics: arkworks sw projective arithmetic
(/root/reference/dist-primitives/src/dmsm/mod.rs:73 hot loop).
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zksaas_tpu.curves import curve_g1
from zksaas_tpu.curves.fused import g1_add, g1_add_select, g1_double
from zksaas_tpu.fields import BN254_FQ, field
from zksaas_tpu.fields.kernel_lib import from_planes, kernel_field, to_planes


def _pts(C, n, seed=0):
    rng = random.Random(seed)
    pts = [C.ref.rand(rng) for _ in range(6)]
    return C.encode([pts[i % 6] for i in range(n)])


def _assert_group_eq(C, P, Q):
    """Equality as group elements (Jacobian reps may differ)."""
    Pa, Qa = C.to_affine(P), C.to_affine(Q)
    for a, b in zip(Pa, Qa):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_add_matches_jnp_path():
    C = curve_g1()
    n = 8
    P = _pts(C, n, seed=1)
    Q = _pts(C, n, seed=2)
    # interleave special cases: Q[0] = P[0] (double), Q[1] = -P[1]
    # (infinity result), P[2] = inf, Q[3] = inf
    Q = tuple(co.at[0].set(po[0]) for co, po in zip(Q, P))
    negP = C.neg(P)
    Q = tuple(co.at[1].set(po[1]) for co, po in zip(Q, negP))
    inf = C.infinity((1,))
    P = tuple(co.at[2].set(io[0]) for co, io in zip(P, inf))
    Q = tuple(co.at[3].set(io[0]) for co, io in zip(Q, inf))

    ref = C.add(P, Q)  # jnp path (fused off on CPU by default)
    got = g1_add(C.R.F.spec, P, Q)  # interpreter-mode kernel
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_double_matches_jnp_path():
    C = curve_g1()
    P = _pts(C, 5, seed=3)
    inf = C.infinity((1,))
    P = tuple(co.at[4].set(io[0]) for co, io in zip(P, inf))
    ref = C.double(P)
    got = g1_double(C.R.F.spec, P)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_add_select():
    C = curve_g1()
    P = _pts(C, 6, seed=4)
    Q = _pts(C, 6, seed=5)
    cond = jnp.asarray([1, 0, 1, 0, 1, 1], dtype=jnp.uint32) > 0
    ref = C.select(cond, C.add(P, Q), P)
    got = g1_add_select(C.R.F.spec, P, Q, cond)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_add_g2():
    """Fq2 (G2) variant: 2K-plane coordinates, Karatsuba in-kernel."""
    from zksaas_tpu.curves import curve_g2
    from zksaas_tpu.curves.fused import fused_add, fused_double

    C = curve_g2()
    n = 4
    P = _pts(C, n, seed=8)
    Q = _pts(C, n, seed=9)
    Q = tuple(co.at[0].set(po[0]) for co, po in zip(Q, P))  # double case
    inf = C.infinity((1,))
    Q = tuple(co.at[1].set(io[0]) for co, io in zip(Q, inf))

    ref = C.add(P, Q)
    got = fused_add(C.R.F.spec, 2, P, Q)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    refd = C.double(P)
    gotd = fused_double(C.R.F.spec, 2, P)
    for a, b in zip(refd, gotd):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_dispatch_env(monkeypatch):
    """ZKSAAS_FUSED=1 routes JCurve.add through the kernels and the
    result still matches the composite path as group elements."""
    C = curve_g1()
    P = _pts(C, 4, seed=6)
    Q = _pts(C, 4, seed=7)
    ref = C.add(P, Q)
    monkeypatch.setenv("ZKSAAS_FUSED", "1")
    got = C.add(P, Q)
    monkeypatch.delenv("ZKSAAS_FUSED")
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_kernel_field_muli_and_planes_roundtrip():
    F = field(BN254_FQ)
    kf = kernel_field(BN254_FQ)
    key = jax.random.PRNGKey(0)
    n = 1500  # exercises the pad-to-1024 path
    a = F.rand(key, (n,))
    ap, B = to_planes(a, F.k)
    assert B == n and ap.shape == (F.k, 2, 8, 128)
    back = from_planes(ap, B, (n, F.k))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(a))

    limbs = [ap[k, 0] for k in range(F.k)]
    for c in (2, 3, 8, 24):
        got_limbs = kf.muli(limbs, c)
        got = from_planes(
            jnp.stack(got_limbs)[:, None], 1024, (1024, F.k)
        )
        ref = F.muli(a[:1024], c)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
