"""Fused point-kernel core tests (curves/fused.py, fields/kernel_lib.py).

The kernel bodies are pure straight-line array code; here they are
evaluated on plain NUMPY arrays (via the fields/_xp dispatch shim) and
asserted bit-identical to the composite jnp path — which is itself
asserted against host big-int oracles in test_curve.py / test_field.py.
This runs the ~100k-op unrolled kernel math in milliseconds; JAX eager
dispatch or the Pallas CPU interpreter take minutes for the same code,
and XLA:CPU cannot compile it as one graph.  The Pallas plumbing
(BlockSpecs, grid, Mosaic lowering) is exercised on the real chip by
scripts/tpu_fused_check.py.

Covers the complete-add special cases: P == Q, P == -Q, either side at
infinity.  Reference semantics: arkworks sw projective arithmetic
(/root/reference/dist-primitives/src/dmsm/mod.rs:73 hot loop).
"""

import random

import jax
import jax.numpy as jnp
import numpy as np

from zksaas_tpu.curves import curve_g1, curve_g2
from zksaas_tpu.curves.fused import (
    _aadd_core,
    _add_core,
    _double_core,
    _kring,
    _madd_core,
)
from zksaas_tpu.fields import BN254_FQ, field
from zksaas_tpu.fields.kernel_lib import from_planes, kernel_field, to_planes


def _pts(C, n, seed=0):
    rng = random.Random(seed)
    pts = [C.ref.rand(rng) for _ in range(6)]
    return C.encode([pts[i % 6] for i in range(n)])


def _np_elem(ncoord, coord):
    """(n, K) / (n, 2, K) coord array -> numpy limb list(s)."""
    a = np.asarray(coord)
    if ncoord == 1:
        return [a[:, k] for k in range(a.shape[-1])]
    return (
        [a[:, 0, k] for k in range(a.shape[-1])],
        [a[:, 1, k] for k in range(a.shape[-1])],
    )


def _np_point(ncoord, P):
    return [_np_elem(ncoord, c) for c in P]


def _back(ncoord, elem):
    if ncoord == 1:
        return np.stack(elem, axis=-1)
    return np.stack([np.stack(c, axis=-1) for c in elem], axis=-2)


def _check_point_eq(ncoord, ref, got_elems):
    for r, g in zip(ref, got_elems):
        np.testing.assert_array_equal(np.asarray(r), _back(ncoord, g))


def _specials(C, P, Q):
    """Inject the complete-add special cases into a batch."""
    Q = tuple(co.at[0].set(po[0]) for co, po in zip(Q, P))  # P == Q
    negP = C.neg(P)
    Q = tuple(co.at[1].set(po[1]) for co, po in zip(Q, negP))  # P == -Q
    inf = C.infinity((1,))
    P = tuple(co.at[2].set(io[0]) for co, io in zip(P, inf))  # P = inf
    Q = tuple(co.at[3].set(io[0]) for co, io in zip(Q, inf))  # Q = inf
    return P, Q


def test_core_add_g1():
    C = curve_g1()
    P, Q = _specials(C, _pts(C, 8, seed=1), _pts(C, 8, seed=2))
    ref = C.add(P, Q)  # composite jnp path (fused off on CPU)
    R = _kring(C.R.F.spec, 1)
    got = _add_core(R, *_np_point(1, P), *_np_point(1, Q))
    _check_point_eq(1, ref, got)


def test_core_double_g1():
    C = curve_g1()
    P = _pts(C, 5, seed=3)
    inf = C.infinity((1,))
    P = tuple(co.at[4].set(io[0]) for co, io in zip(P, inf))
    ref = C.double(P)
    R = _kring(C.R.F.spec, 1)
    got = _double_core(R, *_np_point(1, P))
    _check_point_eq(1, ref, got)


def test_core_add_double_g2():
    C = curve_g2()
    P, Q = _specials(C, _pts(C, 6, seed=8), _pts(C, 6, seed=9))
    R = _kring(C.R.F.spec, 2)
    ref = C.add(P, Q)
    got = _add_core(R, *_np_point(2, P), *_np_point(2, Q))
    _check_point_eq(2, ref, got)
    refd = C.double(P)
    gotd = _double_core(R, *_np_point(2, P))
    _check_point_eq(2, refd, gotd)


def _affine_case_batch(C, seed):
    """Affine (Z=1) point batch with every special case: doubling
    (P == Q), inverses (P == -Q), one/both sides at infinity."""
    P = _pts(C, 8, seed=seed)
    Q = _pts(C, 8, seed=seed + 100)
    Q = tuple(co.at[0].set(po[0]) for co, po in zip(Q, P))  # double
    negP = C.neg(P)
    Q = tuple(co.at[1].set(po[1]) for co, po in zip(Q, negP))  # P + (-P)
    infP = np.zeros(8, dtype=np.uint32)
    infQ = np.zeros(8, dtype=np.uint32)
    infP[2] = 1  # P = inf
    infQ[3] = 1  # Q = inf
    infP[4] = infQ[4] = 1  # both inf
    return P, Q, infP, infQ


def _check_aadd(C, ncoord, seed):
    P, Q, infP, infQ = _affine_case_batch(C, seed=seed)
    R = _kring(C.R.F.spec, ncoord)
    nP, nQ = _np_point(ncoord, P), _np_point(ncoord, Q)
    X3, Y3, Z3 = _aadd_core(R, nP[0], nP[1], nQ[0], nQ[1], infP > 0, infQ > 0)
    got = C.decode(tuple(jnp.asarray(_back(ncoord, c)) for c in (X3, Y3, Z3)))
    ref_pts = C.decode(P)
    ref_qts = C.decode(Q)
    for i in range(len(infP)):
        p = None if infP[i] else ref_pts[i]
        q = None if infQ[i] else ref_qts[i]
        assert got[i] == C.ref.add(p, q), f"i={i}: aadd mismatch"


def test_core_affine_affine_add_g1():
    """_aadd_core (affine + affine -> Jacobian, the widest MSM tree
    level) == host oracle, incl. double / inverse / infinity cases."""
    _check_aadd(curve_g1(), 1, seed=51)


def test_core_affine_affine_add_g2():
    _check_aadd(curve_g2(), 2, seed=61)


def test_core_mixed_add():
    """_madd_core (Jacobian + affine) == composite complete add, incl.
    acc == node (double), acc == -node (infinity), acc at infinity."""
    C = curve_g1()
    P = _pts(C, 8, seed=41)
    # make accumulators with general Z by doubling (Z = 2y != 1)
    A = C.double(P)
    refA = C.decode(A)
    N = _pts(C, 8, seed=42)
    # specials: node == acc (as points), node == -acc, acc = infinity
    two_p0 = refA[0]
    N = tuple(co.at[0].set(e[0]) for co, e in zip(N, C.encode([two_p0])))
    neg_a1 = C.ref.neg(refA[1])
    N = tuple(co.at[1].set(e[0]) for co, e in zip(N, C.encode([neg_a1])))
    inf = C.infinity((1,))
    A = tuple(co.at[2].set(io[0]) for co, io in zip(A, inf))
    ref = C.add(A, N)
    R = _kring(C.R.F.spec, 1)
    nA = _np_point(1, A)
    nN = _np_point(1, N)
    got = _madd_core(R, nA[0], nA[1], nA[2], nN[0], nN[1])
    want = C.decode(ref)
    z3 = jnp.asarray(_back(1, got[2]))
    x3 = jnp.asarray(_back(1, got[0]))
    y3 = jnp.asarray(_back(1, got[1]))
    got_pts = C.decode((x3, y3, z3))
    assert got_pts == want


def test_core_mm_matches_field_mul():
    """KernelField CIOS Montgomery product == Field.mul, numpy eval."""
    F = field(BN254_FQ)
    kf = kernel_field(BN254_FQ)
    n = 257
    a = F.rand(jax.random.PRNGKey(0), (n,))
    b = F.rand(jax.random.PRNGKey(1), (n,))
    ref = np.asarray(F.mul(a, b))
    got = kf.mm(_np_elem(1, a), _np_elem(1, b))
    np.testing.assert_array_equal(ref, np.stack(got, axis=-1))
    # squares and the add/sub/neg ring ops
    np.testing.assert_array_equal(
        np.asarray(F.square(a)), np.stack(kf.sqr(_np_elem(1, a)), axis=-1)
    )
    np.testing.assert_array_equal(
        np.asarray(F.add(a, b)), np.stack(kf.add(_np_elem(1, a), _np_elem(1, b)), axis=-1)
    )
    np.testing.assert_array_equal(
        np.asarray(F.sub(a, b)), np.stack(kf.sub(_np_elem(1, a), _np_elem(1, b)), axis=-1)
    )
    np.testing.assert_array_equal(
        np.asarray(F.neg(a)), np.stack(kf.neg(_np_elem(1, a)), axis=-1)
    )


def test_core_muli():
    F = field(BN254_FQ)
    kf = kernel_field(BN254_FQ)
    a = F.rand(jax.random.PRNGKey(2), (64,))
    for c in (1, 2, 3, 8, 24):
        ref = np.asarray(F.muli(a, c))
        got = kf.muli(_np_elem(1, a), c)
        np.testing.assert_array_equal(ref, np.stack(got, axis=-1))


def test_planes_layout_roundtrip():
    F = field(BN254_FQ)
    n = 1500  # exercises the pad-to-1024 path
    a = F.rand(jax.random.PRNGKey(0), (n,))
    ap, B = to_planes(a, F.k)
    assert B == n and ap.shape == (F.k, 2, 8, 128)
    back = from_planes(ap, B, (n, F.k))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(a))


def test_planes_point_layout():
    from zksaas_tpu.curves.fused import (
        pinfinity,
        points_from_planes,
        points_to_planes,
    )

    C = curve_g1()
    K = C.R.F.spec.nlimbs
    P = _pts(C, 5, seed=11)
    Pp, bshape = points_to_planes(1, P)
    back = points_from_planes(1, Pp, bshape, K)
    for a, b in zip(P, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    infp = pinfinity(C.R.F.spec, 1, 3)
    infref, _ = points_to_planes(1, C.infinity((3,)))
    for a, b in zip(infref, infp):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
