"""Fused Pallas point-operation kernels (G1 over Fq, G2 over Fq2).

One kernel call computes a whole batched Jacobian point operation —
every field multiply, carry chain, and special-case select stays in
VMEM/registers — replacing the round-1 composition of ~23 separate
Montgomery-multiply kernel launches glued by XLA limb graphs.  This is
the TPU-native shape of the reference's hot loop (arkworks projective
arithmetic inside G::msm, /root/reference/dist-primitives/src/dmsm/
mod.rs:73): the per-element branches (infinity, P == Q) become vector
selects computed in-kernel.

Layout: a coordinate crosses the kernel boundary as uint32 planes
(K, nb, 8, 128) — see fields/kernel_lib.py; an Fq2 coordinate uses
2K planes (c0 limbs then c1 limbs).  Wrappers accept the stack-wide
(..., K) / (..., 2, K) layouts and convert with one XLA transpose per
coordinate (bandwidth-trivial next to the ~20 field muls inside).

On CPU backends the kernels run (eagerly) under the Pallas
interpreter; the CPU test suite instead evaluates the kernel *cores*
on plain numpy arrays via the fields/_xp dispatch shim
(tests/test_fused.py) — same code, milliseconds instead of minutes —
and the Pallas plumbing is verified on the real chip by
scripts/tpu_fused_check.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import _xp as xp
from ..fields.kernel_lib import KernelField, from_planes, kernel_field, to_planes
from ..fields.spec import FieldSpec


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# in-kernel coordinate rings
# ---------------------------------------------------------------------------


class KRingFq:
    """Fq inside a kernel: elements are K-limb lists (see KernelField)."""

    def __init__(self, f: KernelField):
        self.f = f
        self.nplanes = f.K

    def load(self, ref, blk=0):
        return self.f.load(ref, blk)

    def store(self, ref, val, blk=0):
        self.f.store(ref, val, blk)

    def add(self, a, b):
        return self.f.add(a, b)

    def sub(self, a, b):
        return self.f.sub(a, b)

    def dbl(self, a):
        return self.f.dbl(a)

    def muli(self, a, c):
        return self.f.muli(a, c)

    def mm(self, a, b):
        return self.f.mm(a, b)

    def sqr(self, a):
        return self.f.sqr(a)

    def is_zero(self, a):
        return self.f.is_zero(a)

    def select(self, cond, a, b):
        return self.f.select(cond, a, b)

    def one(self, like):
        return self.f.const(self.f.one_mont, like[0])

    def zero(self, like):
        return [xp.zeros_like(like[0])] * self.f.K


class KRingFq2:
    """Fq2 = Fq[u]/(u^2 - nr) inside a kernel: elements are (c0, c1)
    pairs of limb lists; mirrors Fq2Ring (jcurve.py), Karatsuba mul."""

    def __init__(self, f: KernelField):
        from ..fields.spec import fq2_nonresidue

        self.f = f
        self.nplanes = 2 * f.K
        self.nr = fq2_nonresidue(f.spec)

    def load(self, ref, blk=0):
        K = self.f.K
        return (
            [ref[k, blk] for k in range(K)],
            [ref[K + k, blk] for k in range(K)],
        )

    def store(self, ref, val, blk=0):
        K = self.f.K
        for k in range(K):
            ref[k, blk] = val[0][k]
            ref[K + k, blk] = val[1][k]

    def add(self, a, b):
        return (self.f.add(a[0], b[0]), self.f.add(a[1], b[1]))

    def sub(self, a, b):
        return (self.f.sub(a[0], b[0]), self.f.sub(a[1], b[1]))

    def dbl(self, a):
        return (self.f.dbl(a[0]), self.f.dbl(a[1]))

    def muli(self, a, c):
        return (self.f.muli(a[0], c), self.f.muli(a[1], c))

    def mm(self, a, b):
        f = self.f
        t0 = f.mm(a[0], b[0])
        t1 = f.mm(a[1], b[1])
        t2 = f.mm(f.add(a[0], a[1]), f.add(b[0], b[1]))
        nr_t1 = t1 if self.nr == -1 else f.muli(t1, -self.nr)
        return (f.sub(t0, nr_t1), f.sub(f.sub(t2, t0), t1))

    def sqr(self, a):
        return self.mm(a, a)

    def is_zero(self, a):
        return xp.logical_and(self.f.is_zero(a[0]), self.f.is_zero(a[1]))

    def select(self, cond, a, b):
        return (self.f.select(cond, a[0], b[0]), self.f.select(cond, a[1], b[1]))

    def one(self, like):
        return (self.f.const(self.f.one_mont, like[0][0]), self.zero(like)[1])

    def zero(self, like):
        z = [xp.zeros_like(like[0][0])] * self.f.K
        return (z, z)


def _kring(spec: FieldSpec, ncoord: int):
    f = kernel_field(spec)
    return KRingFq(f) if ncoord == 1 else KRingFq2(f)


# ---------------------------------------------------------------------------
# in-kernel point formulas (complete, a = 0 curves)
# ---------------------------------------------------------------------------


def _double_core(R, X, Y, Z):
    """a=0 Jacobian doubling; identical formula to JCurve.double
    (reference semantics: arkworks sw projective double)."""
    A = R.sqr(X)
    B = R.sqr(Y)
    C = R.sqr(B)
    D = R.dbl(R.sub(R.sub(R.sqr(R.add(X, B)), A), C))
    E = R.muli(A, 3)
    F_ = R.sqr(E)
    X3 = R.sub(F_, R.dbl(D))
    Y3 = R.sub(R.mm(E, R.sub(D, X3)), R.muli(C, 8))
    Z3 = R.dbl(R.mm(Y, Z))
    return X3, Y3, Z3


def _add_core(R, X1, Y1, Z1, X2, Y2, Z2):
    """Complete Jacobian add matching JCurve.add's select semantics."""
    Z1Z1 = R.sqr(Z1)
    Z2Z2 = R.sqr(Z2)
    U1 = R.mm(X1, Z2Z2)
    U2 = R.mm(X2, Z1Z1)
    S1 = R.mm(R.mm(Y1, Z2), Z2Z2)
    S2 = R.mm(R.mm(Y2, Z1), Z1Z1)
    H = R.sub(U2, U1)
    rr = R.dbl(R.sub(S2, S1))
    I = R.sqr(R.dbl(H))
    J = R.mm(H, I)
    V = R.mm(U1, I)
    X3 = R.sub(R.sub(R.sqr(rr), J), R.dbl(V))
    Y3 = R.sub(R.mm(rr, R.sub(V, X3)), R.dbl(R.mm(S1, J)))
    Z3 = R.mm(R.dbl(R.mm(Z1, Z2)), H)

    h0 = R.is_zero(H)
    r0 = R.is_zero(rr)
    p_inf = R.is_zero(Z1)
    q_inf = R.is_zero(Z2)

    dX, dY, dZ = _double_core(R, X1, Y1, Z1)
    one = R.one(X1)
    zero = R.zero(X1)

    is_dbl = xp.logical_and(h0, r0)
    is_inf_res = xp.logical_and(h0, xp.logical_not(r0))

    out = [X3, Y3, Z3]
    out = [R.select(is_dbl, d, o) for d, o in zip((dX, dY, dZ), out)]
    out = [R.select(is_inf_res, i, o) for i, o in zip((one, one, zero), out)]
    out = [R.select(p_inf, q, o) for q, o in zip((X2, Y2, Z2), out)]
    out = [R.select(q_inf, p, o) for p, o in zip((X1, Y1, Z1), out)]
    return out


# ---------------------------------------------------------------------------
# kernel builders
# ---------------------------------------------------------------------------


def _make_call(kernel, nplanes: int, n_in: int, n_out: int, n_cond: int = 0):
    coord_spec = pl.BlockSpec(
        (nplanes, 1, 8, 128), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
    )
    cond_spec = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    def call(*arrays):
        nb = arrays[0].shape[1]
        return pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[coord_spec] * n_in + [cond_spec] * n_cond,
            out_specs=[coord_spec] * n_out,
            out_shape=[jax.ShapeDtypeStruct(arrays[0].shape, jnp.uint32)] * n_out,
            interpret=_interpret(),
        )(*arrays)

    # On TPU the call is jitted (one Mosaic kernel).  Under the CPU
    # interpreter it must stay eager: the unrolled kernel body is a
    # ~100k-op graph that XLA:CPU cannot compile in reasonable time,
    # while eager interpretation is seconds.
    if not _interpret():
        call = jax.jit(call)
    return call


@functools.cache
def _add_call(spec: FieldSpec, ncoord: int):
    R = _kring(spec, ncoord)

    def kernel(x1, y1, z1, x2, y2, z2, ox, oy, oz):
        ins = [R.load(r) for r in (x1, y1, z1, x2, y2, z2)]
        X3, Y3, Z3 = _add_core(R, *ins)
        R.store(ox, X3)
        R.store(oy, Y3)
        R.store(oz, Z3)

    return _make_call(kernel, R.nplanes, n_in=6, n_out=3)


@functools.cache
def _add_select_call(spec: FieldSpec, ncoord: int):
    """out = cond ? P + Q : P  — the Pippenger accumulate step fused
    with its predicate (cond: one uint32 0/1 per element)."""
    R = _kring(spec, ncoord)

    def kernel(x1, y1, z1, x2, y2, z2, c_ref, ox, oy, oz):
        ins = [R.load(r) for r in (x1, y1, z1, x2, y2, z2)]
        X3, Y3, Z3 = _add_core(R, *ins)
        cond = c_ref[0] > 0
        R.store(ox, R.select(cond, X3, ins[0]))
        R.store(oy, R.select(cond, Y3, ins[1]))
        R.store(oz, R.select(cond, Z3, ins[2]))

    return _make_call(kernel, R.nplanes, n_in=6, n_out=3, n_cond=1)


@functools.cache
def _double_call(spec: FieldSpec, ncoord: int, k: int = 1):
    """k-fold doubling fused into one kernel (Horner's c doublings per
    window become a single launch)."""
    R = _kring(spec, ncoord)

    def kernel(x, y, z, ox, oy, oz):
        X, Y, Z = (R.load(r) for r in (x, y, z))
        for _ in range(k):
            X, Y, Z = _double_core(R, X, Y, Z)
        R.store(ox, X)
        R.store(oy, Y)
        R.store(oz, Z)

    return _make_call(kernel, R.nplanes, n_in=3, n_out=3)


# ---------------------------------------------------------------------------
# (..., K) / (..., 2, K)-layout wrappers
# ---------------------------------------------------------------------------


def _wrap(call, nplanes: int, ncoord_axes: int, coords, conds=()):
    """coords: flat list of (..., K) (ncoord_axes=1) or (..., 2, K)
    (ncoord_axes=2) arrays."""
    shape = jnp.broadcast_shapes(*(c.shape for c in coords))
    flatshape = shape[:-ncoord_axes] + (nplanes,)
    planes = []
    B = None
    for c in coords:
        c = jnp.broadcast_to(c, shape).reshape(flatshape)
        p, B = to_planes(c, nplanes)
        planes.append(p)
    cargs = []
    for cond in conds:
        cflat = jnp.broadcast_to(cond, shape[:-ncoord_axes]).astype(jnp.uint32).reshape(-1)
        Bp = planes[0].shape[1] * 1024
        if Bp != cflat.shape[0]:
            cflat = jnp.pad(cflat, (0, Bp - cflat.shape[0]))
        cargs.append(cflat.reshape(-1, 8, 128))
    outs = call(*planes, *cargs)
    return tuple(from_planes(o, B, flatshape).reshape(shape) for o in outs)


def _nplanes(spec: FieldSpec, ncoord: int) -> int:
    return spec.nlimbs * ncoord


def fused_add(spec: FieldSpec, ncoord: int, P, Q):
    """Complete Jacobian add on (..., K)/(..., 2, K) coordinate tuples."""
    return _wrap(_add_call(spec, ncoord), _nplanes(spec, ncoord), ncoord, (*P, *Q))


def fused_add_select(spec: FieldSpec, ncoord: int, P, Q, cond):
    """cond ? P + Q : P, with cond broadcast over the batch shape."""
    return _wrap(
        _add_select_call(spec, ncoord), _nplanes(spec, ncoord), ncoord, (*P, *Q), (cond,)
    )


def fused_double(spec: FieldSpec, ncoord: int, P):
    return _wrap(_double_call(spec, ncoord), _nplanes(spec, ncoord), ncoord, P)


# Backwards-compatible G1 aliases
def g1_add(spec, P, Q):
    return fused_add(spec, 1, P, Q)


def g1_add_select(spec, P, Q, cond):
    return fused_add_select(spec, 1, P, Q, cond)


def g1_double(spec, P):
    return fused_double(spec, 1, P)


# ---------------------------------------------------------------------------
# planes-level API: coordinates stay (nplanes, B) limb-major throughout
# (used by the MSM hot path, curves/pippenger.py, to avoid the
# (..., K) <-> planes transpose around every kernel call)
# ---------------------------------------------------------------------------


def _wrap_planes(call, npl: int, coords, conds=()):
    """coords: (npl, B) uint32 arrays; pads B to a 1024 multiple."""
    B = coords[0].shape[1]
    Bp = -(-B // 1024) * 1024
    shaped = []
    for c in coords:
        if Bp != B:
            c = jnp.pad(c, ((0, 0), (0, Bp - B)))
        shaped.append(c.reshape(npl, Bp // 1024, 8, 128))
    cargs = []
    for cd in conds:
        cd = cd.astype(jnp.uint32)
        if Bp != B:
            cd = jnp.pad(cd, (0, Bp - B))
        cargs.append(cd.reshape(Bp // 1024, 8, 128))
    outs = call(*shaped, *cargs)
    return tuple(o.reshape(npl, Bp)[:, :B] for o in outs)


def padd(spec: FieldSpec, ncoord: int, P, Q):
    npl = _nplanes(spec, ncoord)
    return _wrap_planes(_add_call(spec, ncoord), npl, (*P, *Q))


def padd_if(spec: FieldSpec, ncoord: int, cond, P, Q):
    """cond ? P + Q : P on planes points; cond: (B,) bool/uint32."""
    npl = _nplanes(spec, ncoord)
    return _wrap_planes(_add_select_call(spec, ncoord), npl, (*P, *Q), (cond,))


def pdouble(spec: FieldSpec, ncoord: int, P, k: int = 1):
    npl = _nplanes(spec, ncoord)
    return _wrap_planes(_double_call(spec, ncoord, k), npl, P)


def pinfinity(spec: FieldSpec, ncoord: int, B: int):
    """Planes-layout (1, 1, 0) infinity points, shape (npl, B)."""
    K = spec.nlimbs
    one_limbs = np.zeros(K * ncoord, dtype=np.uint32)
    for i in range(K):
        one_limbs[i] = (spec.r_mod_p >> (16 * i)) & 0xFFFF
    one = jnp.broadcast_to(jnp.asarray(one_limbs)[:, None], (K * ncoord, B))
    zero = jnp.zeros((K * ncoord, B), jnp.uint32)
    return (one, one, zero)


def points_to_planes(ncoord: int, P):
    """(..., K)/(..., 2, K) coord tuple -> ((npl, B) tuple, batch shape)."""
    c0 = P[0]
    bshape = c0.shape[: c0.ndim - ncoord]
    npl = int(np.prod(c0.shape[c0.ndim - ncoord :]))
    out = tuple(c.reshape(-1, npl).T for c in P)
    return out, bshape


def points_from_planes(ncoord: int, Pp, bshape, K: int):
    """Inverse of points_to_planes."""
    tail = (K,) if ncoord == 1 else (2, K)
    return tuple(c.T.reshape(bshape + tail) for c in Pp)
