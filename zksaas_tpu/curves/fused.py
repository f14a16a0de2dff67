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


def _make_call(
    kernel, nplanes: int, n_in: int, n_out: int, n_cond: int = 0, n_cond_out: int = 0
):
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
            out_specs=[coord_spec] * n_out + [cond_spec] * n_cond_out,
            out_shape=[jax.ShapeDtypeStruct(arrays[0].shape, jnp.uint32)] * n_out
            + [jax.ShapeDtypeStruct((nb, 8, 128), jnp.uint32)] * n_cond_out,
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


@functools.cache
def _fmul_call(spec: FieldSpec, ncoord: int):
    """Plain coordinate-ring Montgomery multiply (for the simultaneous-
    inversion product tree of the batch-affine MSM)."""
    R = _kring(spec, ncoord)

    def kernel(a, b, o):
        R.store(o, R.mm(R.load(a), R.load(b)))

    return _make_call(kernel, R.nplanes, n_in=2, n_out=1)


def _madd_core(R, X1, Y1, Z1, x2, y2):
    """Complete mixed add: Jacobian (X1,Y1,Z1) + affine (x2,y2) with
    x2,y2 never infinity (callers mask that case out)."""
    Z1Z1 = R.sqr(Z1)
    U2 = R.mm(x2, Z1Z1)
    S2 = R.mm(R.mm(y2, Z1), Z1Z1)
    H = R.sub(U2, X1)
    rr = R.dbl(R.sub(S2, Y1))
    I = R.sqr(R.dbl(H))
    J = R.mm(H, I)
    V = R.mm(X1, I)
    X3 = R.sub(R.sub(R.sqr(rr), J), R.dbl(V))
    Y3 = R.sub(R.mm(rr, R.sub(V, X3)), R.dbl(R.mm(Y1, J)))
    Z3 = R.mm(R.dbl(Z1), H)

    h0 = R.is_zero(H)
    r0 = R.is_zero(rr)
    p_inf = R.is_zero(Z1)
    one = R.one(X1)
    zero = R.zero(X1)
    is_dbl = xp.logical_and(h0, r0)
    is_inf_res = xp.logical_and(h0, xp.logical_not(r0))
    dX, dY, dZ = _double_core(R, x2, y2, one)

    out = [X3, Y3, Z3]
    out = [R.select(is_dbl, d, o) for d, o in zip((dX, dY, dZ), out)]
    out = [R.select(is_inf_res, i, o) for i, o in zip((one, one, zero), out)]
    out = [R.select(p_inf, q, o) for q, o in zip((x2, y2, one), out)]
    return out


def _aadd_core(R, X1, Y1, X2, Y2, inf1, inf2):
    """Complete affine + affine -> Jacobian add (a = 0 curves):
    mmadd-2007-bl, 4M + 3S vs ~12M + 7S for the general Jacobian add.
    Powers the widest MSM reduction-tree level, where both inputs are
    still the affine-normalized leaves (half of all tree adds)."""
    one = R.one(X1)
    zero = R.zero(X1)
    H = R.sub(X2, X1)
    rr = R.dbl(R.sub(Y2, Y1))
    I = R.sqr(R.dbl(H))
    J = R.mm(H, I)
    V = R.mm(X1, I)
    X3 = R.sub(R.sub(R.sqr(rr), J), R.dbl(V))
    Y3 = R.sub(R.mm(rr, R.sub(V, X3)), R.dbl(R.mm(Y1, J)))
    Z3 = R.dbl(H)

    h0 = R.is_zero(H)
    r0 = R.is_zero(rr)
    is_dbl = xp.logical_and(h0, r0)
    is_inf_res = xp.logical_and(h0, xp.logical_not(r0))
    dX, dY, dZ = _double_core(R, X1, Y1, one)

    out = [X3, Y3, Z3]
    out = [R.select(is_dbl, d, o) for d, o in zip((dX, dY, dZ), out)]
    out = [R.select(is_inf_res, i, o) for i, o in zip((one, one, zero), out)]
    Zq = R.select(inf2, zero, one)
    out = [R.select(inf1, q, o) for q, o in zip((X2, Y2, Zq), out)]
    Zp = R.select(inf1, zero, one)
    out = [R.select(inf2, p, o) for p, o in zip((X1, Y1, Zp), out)]
    return out


@functools.cache
def _aadd_call(spec: FieldSpec, ncoord: int):
    R = _kring(spec, ncoord)

    def kernel(x1, y1, x2, y2, i1, i2, ox, oy, oz):
        X1, Y1 = R.load(x1), R.load(y1)
        X2, Y2 = R.load(x2), R.load(y2)
        inf1 = i1[0] > 0
        inf2 = i2[0] > 0
        X3, Y3, Z3 = _aadd_core(R, X1, Y1, X2, Y2, inf1, inf2)
        R.store(ox, X3)
        R.store(oy, Y3)
        R.store(oz, Z3)

    return _make_call(kernel, R.nplanes, n_in=4, n_out=3, n_cond=2)


@functools.cache
def _finv_call(spec: FieldSpec, ncoord: int):
    """Batched Fermat inversion in ONE kernel: a^(p-2) via a fori_loop
    over the fixed exponent bits (held in SMEM), ~2 muls per bit, all
    in VMEM.  Replaces a 255-step XLA limb-graph chain whose serial
    dispatch latency dominated per-level batch inversion.  Fq2 inverts
    through the norm: (c0 + c1 u)^-1 = (c0 - c1 u)/(c0^2 - nr*c1^2)."""
    f = kernel_field(spec)
    ebits = np.asarray([int(b) for b in bin(spec.p - 2)[2:]], dtype=np.int32)
    nbits = int(ebits.shape[0])

    def fermat(bits_ref, x):
        def body(i, acc):
            acc = f.sqr(list(acc))
            mul = f.mm(acc, x)
            b = bits_ref[i]
            return tuple(xp.where(b > 0, u, v) for u, v in zip(mul, acc))

        return list(jax.lax.fori_loop(1, nbits, body, tuple(x)))

    if ncoord == 1:

        def kernel(bits_ref, a, o):
            x = f.load(a)
            f.store(o, fermat(bits_ref, x))

    else:
        from ..fields.spec import fq2_nonresidue

        nr = fq2_nonresidue(spec)
        K = f.K

        def kernel(bits_ref, a, o):
            c0 = [a[k, 0] for k in range(K)]
            c1 = [a[K + k, 0] for k in range(K)]
            n1 = f.sqr(c1)
            norm = f.add(f.sqr(c0), n1 if nr == -1 else f.muli(n1, -nr))
            ninv = fermat(bits_ref, norm)
            r0 = f.mm(c0, ninv)
            r1 = f.neg(f.mm(c1, ninv))
            for k in range(K):
                o[k, 0] = r0[k]
                o[K + k, 0] = r1[k]

    nplanes = f.K * ncoord
    coord_spec = pl.BlockSpec(
        (nplanes, 1, 8, 128), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
    )
    bits_spec = pl.BlockSpec((nbits,), lambda i: (0,), memory_space=pltpu.SMEM)

    def call(a):
        nb = a.shape[1]
        return pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[bits_spec, coord_spec],
            out_specs=[coord_spec],
            out_shape=[jax.ShapeDtypeStruct(a.shape, jnp.uint32)],
            interpret=_interpret(),
        )(jnp.asarray(ebits), a)

    if not _interpret():
        call = jax.jit(call)
    return call


def pfinv(spec: FieldSpec, ncoord: int, a):
    """Coordinate-ring inversion of (npl, B) planes elements (nonzero)."""
    npl = _nplanes(spec, ncoord)
    return _wrap_planes(_finv_call(spec, ncoord), npl, (a,))[0]


@functools.cache
def _madd_select_call(spec: FieldSpec, ncoord: int):
    """out = cond ? P + Q : P with Jacobian P and AFFINE Q (Z2 = 1,
    never infinity — the caller folds Q's infinity flag into cond):
    the mixed add saves ~6M + 1S over the general add."""
    R = _kring(spec, ncoord)

    def kernel(ax, ay, az, nx, ny, c_ref, ox, oy, oz):
        X1, Y1, Z1 = R.load(ax), R.load(ay), R.load(az)
        x2, y2 = R.load(nx), R.load(ny)
        cond = c_ref[0] > 0
        out = _madd_core(R, X1, Y1, Z1, x2, y2)
        for ref, o, orig in zip((ox, oy, oz), out, (X1, Y1, Z1)):
            R.store(ref, R.select(cond, o, orig))

    return _make_call(kernel, R.nplanes, n_in=5, n_out=3, n_cond=1)


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


def _wrap_planes(call, npl: int, coords, conds=(), n_cond_out: int = 0):
    """coords: (npl, B) uint32 arrays; pads B to a 1024 multiple.  The
    last n_cond_out outputs are flag-shaped (B,) instead of (npl, B)."""
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
    n_coord_out = len(outs) - n_cond_out
    res = [o.reshape(npl, Bp)[:, :B] for o in outs[:n_coord_out]]
    res += [o.reshape(Bp)[:B] for o in outs[n_coord_out:]]
    return tuple(res)


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


def pfmul(spec: FieldSpec, ncoord: int, a, b):
    """Coordinate-ring product on (npl, B) planes operands."""
    npl = _nplanes(spec, ncoord)
    return _wrap_planes(_fmul_call(spec, ncoord), npl, (a, b))[0]


def paddaa(spec: FieldSpec, ncoord: int, P, Q, infP, infQ):
    """Complete affine + affine -> Jacobian add on planes points.
    P, Q: (x, y) planes tuples; infP/infQ: (B,) flags."""
    npl = _nplanes(spec, ncoord)
    return _wrap_planes(_aadd_call(spec, ncoord), npl, (*P, *Q), (infP, infQ))


def pmadd_if(spec: FieldSpec, ncoord: int, cond, P, Q):
    """cond ? P + Q : P with Jacobian P and affine (x, y) Q planes."""
    npl = _nplanes(spec, ncoord)
    return _wrap_planes(_madd_select_call(spec, ncoord), npl, (*P, *Q), (cond,))


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
