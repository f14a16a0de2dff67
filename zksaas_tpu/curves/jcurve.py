"""Batched short-Weierstrass point arithmetic on device.

Jacobian coordinates over Fq (G1) or Fq2 (G2), with every coordinate a
16-bit-limb uint32 array (see fields/jfield.py).  All ops are
elementwise over leading batch dims: one `add` call advances a whole
vector of independent point additions, which is how the MSM/packing
kernels keep the VPU busy.

Replaces arkworks ark-ec projective arithmetic (reference hot loop:
G::msm at dist-primitives/src/dmsm/mod.rs:73, point packing at
groth16/src/proving_key.rs:72-86).  Branchy special cases (infinity,
P==Q) become jnp.where selects, the TPU-native form of the same
complete-addition logic; scalar multiplication is a fori_loop
double-and-add so the traced graph stays one butterfly deep regardless
of scalar width.

Only a=0 curves are supported (BN254, BLS12-377/381 are all a=0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.jfield import Field, field
from ..fields.spec import (
    LIMB_BITS,
    BLS12_377_FQ,
    BLS12_377_FR,
    BLS12_381_FQ,
    BLS12_381_FR,
    BN254_FQ,
    BN254_FR,
)
from . import ref as _ref


class FqRing:
    """Coordinate ring Fq: elements are (..., K) limb arrays."""

    def __init__(self, F: Field):
        self.F = F
        self.coord_shape = (F.k,)

    def add(self, a, b):
        return self.F.add(a, b)

    def sub(self, a, b):
        return self.F.sub(a, b)

    def mul(self, a, b):
        return self.F.mul(a, b)

    def square(self, a):
        return self.F.square(a)

    def muli(self, a, c):
        return self.F.muli(a, c)

    def neg(self, a):
        return self.F.neg(a)

    def zeros(self, shape=()):
        return self.F.zeros(shape)

    def ones(self, shape=()):
        return self.F.ones(shape)

    def is_zero(self, a):
        return self.F.is_zero(a)

    def select(self, cond, a, b):
        return jnp.where(cond[..., None], a, b)

    def batch_inv(self, a, axis=0):
        return self.F.batch_inv(a, axis=axis)

    def encode(self, xs):
        return self.F.encode(xs)

    def decode(self, a):
        return self.F.decode(a)


class Fq2Ring:
    """Coordinate ring Fq2 = Fq[u]/(u^2 - nr): elements are (..., 2, K).

    nr = -1 for BN254/BLS12-381; -5 for BLS12-377 (fields/spec.py)."""

    def __init__(self, F: Field):
        self.F = F
        self.coord_shape = (2, F.k)
        from ..fields.spec import fq2_nonresidue

        self.nr = fq2_nonresidue(F.spec)
        assert self.nr < 0

    def add(self, a, b):
        return self.F.add(a, b)

    def sub(self, a, b):
        return self.F.sub(a, b)

    def _nr_t1(self, t1):
        """(-nr) * t1 (nr is a small negative int)."""
        return t1 if self.nr == -1 else self.F.muli(t1, -self.nr)

    def mul(self, a, b):
        F = self.F
        a0, a1 = a[..., 0, :], a[..., 1, :]
        b0, b1 = b[..., 0, :], b[..., 1, :]
        t0 = F.mul(a0, b0)
        t1 = F.mul(a1, b1)
        t2 = F.mul(F.add(a0, a1), F.add(b0, b1))
        return jnp.stack(
            [F.sub(t0, self._nr_t1(t1)), F.sub(F.sub(t2, t0), t1)], axis=-2
        )

    def square(self, a):
        return self.mul(a, a)

    def muli(self, a, c):
        return self.F.muli(a, c)

    def neg(self, a):
        return self.F.neg(a)

    def zeros(self, shape=()):
        return self.F.zeros(tuple(shape) + (2,))

    def ones(self, shape=()):
        F = self.F
        return jnp.stack([F.ones(shape), F.zeros(shape)], axis=-2)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(-1, -2))

    def select(self, cond, a, b):
        return jnp.where(cond[..., None, None], a, b)

    def batch_inv(self, a, axis=0):
        F = self.F
        a0, a1 = a[..., 0, :], a[..., 1, :]
        norm = F.add(F.square(a0), self._nr_t1(F.square(a1)))
        ninv = F.batch_inv(norm, axis=axis)
        return jnp.stack([F.mul(a0, ninv), F.neg(F.mul(a1, ninv))], axis=-2)

    def encode(self, xs):
        """xs: nested lists of (c0, c1) pairs of ints."""
        return self.F.encode(np.asarray(xs, dtype=object))

    def decode(self, a):
        return self.F.decode(a)


def _vary_like(init, like, *extra):
    """Make a constant loop-carry init inherit the varying manual axes
    of `like` (and any `extra` arrays) so fori_loop carries type-match
    under shard_map (the `x & 0` contributes nothing numerically but
    carries the vma).  `extra` matters when the point operand is
    replicated but the scalars are per-party shares: the loop body's
    output then varies through the scalar bits alone (e.g. prove_a's
    delta_g1 * r_share)."""
    mask = 0
    for e in extra:
        # scalar zero carrying e's vma (broadcasts against any coord
        # layout, incl. G2's extra component axis)
        mask = mask ^ jnp.min(e & 0)
    return tuple(i ^ (c & 0) ^ mask for i, c in zip(init, like))


class JCurve:
    """One curve group; points are (X, Y, Z) tuples of ring elements.

    Infinity is Z == 0 (with X = Y = 1, arkworks-style)."""

    _instances: dict[str, "JCurve"] = {}

    def __init__(self, name: str, ring, curve_ref: _ref.CurveRef, fr: Field):
        self.name = name
        self.R = ring
        self.ref = curve_ref
        self.fr = fr  # scalar field
        self.order = curve_ref.order
        self._ncoord = len(ring.coord_shape)

    def batch_shape(self, P):
        return P[0].shape[: P[0].ndim - self._ncoord]

    # -- constructors ---------------------------------------------------

    def infinity(self, shape=()):
        R = self.R
        return (R.ones(shape), R.ones(shape), R.zeros(shape))

    def encode(self, pts, shape=None):
        """Flat list of affine points ((x, y) or None) -> device Jacobian
        arrays; optionally reshaped to `shape` leading dims."""
        R = self.R
        is2 = self._ncoord == 2
        one = (1, 0) if is2 else 1
        zero = (0, 0) if is2 else 0
        xs = [p[0] if p is not None else one for p in pts]
        ys = [p[1] if p is not None else one for p in pts]
        zs = [zero if p is None else one for p in pts]
        X, Y, Z = R.encode(xs), R.encode(ys), R.encode(zs)
        if shape is not None:
            X = X.reshape(tuple(shape) + R.coord_shape)
            Y = Y.reshape(tuple(shape) + R.coord_shape)
            Z = Z.reshape(tuple(shape) + R.coord_shape)
        return (jnp.asarray(X), jnp.asarray(Y), jnp.asarray(Z))

    def decode(self, P):
        """Device Jacobian -> flat list of affine ((x, y) ints or None)."""
        X, Y, Z = self.to_affine(P)
        R = self.R
        xs, ys = R.decode(X), R.decode(Y)
        inf = np.asarray(jax.device_get(self.is_inf(P))).reshape(-1)
        is2 = self._ncoord == 2
        fx = np.asarray(xs, dtype=object).reshape(inf.shape[0], -1)
        fy = np.asarray(ys, dtype=object).reshape(inf.shape[0], -1)
        out = []
        for i in range(inf.shape[0]):
            if inf[i]:
                out.append(None)
            elif is2:
                out.append((tuple(fx[i]), tuple(fy[i])))
            else:
                out.append((fx[i][0], fy[i][0]))
        return out

    # -- predicates -----------------------------------------------------

    def is_inf(self, P):
        return self.R.is_zero(P[2])

    def select(self, cond, P, Q):
        R = self.R
        return tuple(R.select(cond, a, b) for a, b in zip(P, Q))

    # -- group law (a = 0) ----------------------------------------------

    def _use_fused(self) -> bool:
        """Fused whole-point Pallas kernels (curves/fused.py): on by
        default on TPU backends; ZKSAAS_FUSED=1/0 overrides (tests run
        the same kernels under the Pallas CPU interpreter)."""
        import os

        v = os.environ.get("ZKSAAS_FUSED")
        if v is not None:
            return v == "1"
        return self.R.F._pallas_enabled()

    def double(self, P):
        if self._use_fused():
            from .fused import fused_double

            return fused_double(self.R.F.spec, self._ncoord, P)
        R = self.R
        X, Y, Z = P
        A = R.square(X)
        B = R.square(Y)
        C = R.square(B)
        D = R.muli(R.sub(R.sub(R.square(R.add(X, B)), A), C), 2)
        E = R.muli(A, 3)
        F_ = R.square(E)
        X3 = R.sub(F_, R.muli(D, 2))
        Y3 = R.sub(R.mul(E, R.sub(D, X3)), R.muli(C, 8))
        Z3 = R.muli(R.mul(Y, Z), 2)
        return (X3, Y3, Z3)

    def add(self, P, Q):
        if self._use_fused():
            from .fused import fused_add

            return fused_add(self.R.F.spec, self._ncoord, P, Q)
        R = self.R
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        Z1Z1 = R.square(Z1)
        Z2Z2 = R.square(Z2)
        U1 = R.mul(X1, Z2Z2)
        U2 = R.mul(X2, Z1Z1)
        S1 = R.mul(R.mul(Y1, Z2), Z2Z2)
        S2 = R.mul(R.mul(Y2, Z1), Z1Z1)
        H = R.sub(U2, U1)
        rr = R.muli(R.sub(S2, S1), 2)
        I = R.square(R.muli(H, 2))
        J = R.mul(H, I)
        V = R.mul(U1, I)
        X3 = R.sub(R.sub(R.square(rr), J), R.muli(V, 2))
        Y3 = R.sub(R.mul(rr, R.sub(V, X3)), R.muli(R.mul(S1, J), 2))
        Z3 = R.mul(R.muli(R.mul(Z1, Z2), 2), H)

        h_zero = R.is_zero(H)
        r_zero = R.is_zero(rr)
        p_inf = self.is_inf(P)
        q_inf = self.is_inf(Q)

        out = (X3, Y3, Z3)
        out = self.select(jnp.logical_and(h_zero, r_zero), self.double(P), out)
        out = self.select(
            jnp.logical_and(h_zero, jnp.logical_not(r_zero)),
            self.infinity(h_zero.shape),
            out,
        )
        out = self.select(p_inf, Q, out)
        out = self.select(q_inf, P, out)
        return out

    def add_if(self, cond, P, Q):
        """cond ? P + Q : P — the accumulate step of scalar_mul /
        Pippenger, with the predicate fused into the add kernel."""
        if self._use_fused():
            from .fused import fused_add_select

            return fused_add_select(self.R.F.spec, self._ncoord, P, Q, cond)
        return self.select(cond, self.add(P, Q), P)

    def neg(self, P):
        return (P[0], self.R.neg(P[1]), P[2])

    # -- conversions ----------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def to_affine(self, P):
        """Normalize Z -> 1 via batched inversion (mirrors arkworks
        batch_normalization)."""
        R = self.R
        X, Y, Z = P
        bshape = self.batch_shape(P)
        flatZ = Z.reshape((-1,) + R.coord_shape)
        zinv = R.batch_inv(flatZ, axis=0).reshape(Z.shape)
        zinv2 = R.square(zinv)
        zinv3 = R.mul(zinv2, zinv)
        return (
            R.mul(X, zinv2),
            R.mul(Y, zinv3),
            R.select(self.is_inf(P), R.zeros(bshape), R.ones(bshape)),
        )

    # -- scalar multiplication ------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def scalar_mul(self, P, scalars_mont):
        """Batched variable-base scalar mul: out[...] = P[...] * s[...]
        (binary double-and-add; small traced graph, used for modest
        batches — the MSM hot path uses scalar_mul_w4).

        scalars_mont: Fr elements in Montgomery form, batch-shaped like
        P with a trailing (Kr,) limb axis."""
        fr = self.fr
        raw = fr.from_mont(scalars_mont)
        nbits = fr.spec.bits

        def body(j, acc):
            acc = self.double(acc)
            jj = nbits - 1 - j
            limb = jnp.take(raw, jj // LIMB_BITS, axis=-1)
            bit = (limb >> (jj % np.uint32(LIMB_BITS))) & 1
            return self.add_if(bit > 0, acc, P)

        acc0 = _vary_like(self.infinity(self.batch_shape(P)), P, raw)
        return jax.lax.fori_loop(0, nbits, body, acc0)

    @functools.partial(jax.jit, static_argnums=0)
    def scalar_mul_w4(self, P, scalars_mont):
        """Windowed (c = 4) variable-base scalar mul for the MSM hot
        loop: a per-element 16-entry multiples table (14 adds), then 64
        iterations of 4 doublings + one table add.  Table lookup is a
        4-level binary select tree on the digit bits — pure vector
        selects, no gathers.  ~334 point ops/scalar vs ~508 binary."""
        fr = self.fr
        raw = fr.from_mont(scalars_mont)
        c = 4
        nbits = fr.spec.bits
        n_windows = -(-nbits // c)
        per_limb = LIMB_BITS // c

        tbl = [self.infinity(self.batch_shape(P)), P]
        for _ in range(14):
            tbl.append(self.add(tbl[-1], P))
        T = tuple(jnp.stack([t[k] for t in tbl], axis=0) for k in range(3))

        def lookup(digit):
            cur = T
            size = 16
            for b in reversed(range(c)):
                size //= 2
                bit = ((digit >> b) & 1) > 0
                cur = tuple(
                    jnp.where(
                        bit[(None,) + (...,) + (None,) * (co.ndim - 1 - bit.ndim)],
                        co[size:],
                        co[:size],
                    )
                    for co in cur
                )
            return tuple(co[0] for co in cur)

        def body(i, acc):
            j = n_windows - 1 - i
            for _ in range(c):
                acc = self.double(acc)
            limb = jnp.take(raw, j // per_limb, axis=-1)
            shift = (np.uint32(c) * (j % per_limb).astype(jnp.uint32))
            digit = (limb >> shift) & ((1 << c) - 1)
            return self.add(acc, lookup(digit))

        acc0 = _vary_like(self.infinity(self.batch_shape(P)), P, raw)
        return jax.lax.fori_loop(0, n_windows, body, acc0)

    def scalar_mul_int(self, P, c: int):
        """P * c for a host-int scalar (encoded then batched scalar_mul)."""
        s = jnp.asarray(self.fr.encode([c % self.order]))[0]
        bshape = self.batch_shape(P)
        s = jnp.broadcast_to(s, bshape + s.shape)
        return self.scalar_mul(P, s)

    def sum(self, P, axis: int = 0):
        """Tree-reduce point sum along a batch axis."""
        nb = len(self.batch_shape(P))
        if axis < 0:
            axis += nb
        P = tuple(jnp.moveaxis(c, axis, 0) for c in P)
        n = P[0].shape[0]
        while n > 1:
            half = n // 2
            even = tuple(c[: 2 * half : 2] for c in P)
            odd = tuple(c[1 : 2 * half : 2] for c in P)
            s = self.add(even, odd)
            if n % 2:
                tail = tuple(c[-1:] for c in P)
                s = tuple(jnp.concatenate([a, b], axis=0) for a, b in zip(s, tail))
            P = s
            n = P[0].shape[0]
        return tuple(c[0] for c in P)

    @functools.partial(jax.jit, static_argnums=0)
    def msm(self, P, scalars_mont):
        """sum_i P[i] * s[i] along axis 0 (the d_msm local hot loop,
        dmsm/mod.rs:73).  On TPU: bucket-Pippenger for large m,
        windowed double-and-add otherwise; binary double-and-add on CPU
        where compile time of the bigger graphs would dominate the test
        suite."""
        m = self.batch_shape(P)[0]
        if self.fr._pallas_enabled():
            if m >= 256:
                from .pippenger import msm_best

                return msm_best(self, P, scalars_mont)
            prods = self.scalar_mul_w4(P, scalars_mont)
        else:
            prods = self.scalar_mul(P, scalars_mont)
        return self.sum(prods, axis=0)

    # -- linear maps (for PSS packing over group elements) ---------------

    @functools.partial(jax.jit, static_argnums=(0, 1))
    def matvec(self, M: tuple, P):
        """out[..., i] = sum_j M[i][j] * P[..., j].

        M: static tuple-of-tuples of host ints (r x c); P: points whose
        LAST batch axis has size c.  Implemented as one batched
        double-and-add over all r*c products then a tree reduction —
        this is the tiny-domain 'FFT in the exponent' the reference runs
        for point packing (proving_key.rs:72-86), recast as a static
        scalar matrix so the TPU sees a single fused kernel."""
        r, c = len(M), len(M[0])
        flat = [M[i][j] for i in range(r) for j in range(c)]
        S = jnp.asarray(self.fr.encode(flat)).reshape(r, c, self.fr.k)
        bshape = self.batch_shape(P)  # (..., c)
        # tile P: (..., c) -> (..., r, c)
        Pt = tuple(
            jnp.broadcast_to(
                x[..., None, :, *([slice(None)] * self._ncoord)],
                bshape[:-1] + (r, c) + self.R.coord_shape,
            )
            for x in P
        )
        Sb = jnp.broadcast_to(S, bshape[:-1] + (r, c, self.fr.k))
        prods = self.scalar_mul(Pt, Sb)
        return self.sum(prods, axis=-1)


@functools.cache
def curve_g1(name: str = "bn254") -> JCurve:
    if name == "bn254":
        return JCurve("bn254_g1", FqRing(field(BN254_FQ)), _ref.BN254_G1, field(BN254_FR))
    if name == "bls12_381":
        return JCurve(
            "bls12_381_g1", FqRing(field(BLS12_381_FQ)), _ref.BLS12_381_G1, field(BLS12_381_FR)
        )
    if name == "bls12_377":
        return JCurve(
            "bls12_377_g1", FqRing(field(BLS12_377_FQ)), _ref.BLS12_377_G1, field(BLS12_377_FR)
        )
    raise ValueError(name)


@functools.cache
def curve_g2(name: str = "bn254") -> JCurve:
    if name == "bn254":
        return JCurve("bn254_g2", Fq2Ring(field(BN254_FQ)), _ref.BN254_G2, field(BN254_FR))
    if name == "bls12_381":
        return JCurve(
            "bls12_381_g2", Fq2Ring(field(BLS12_381_FQ)), _ref.BLS12_381_G2, field(BLS12_381_FR)
        )
    if name == "bls12_377":
        return JCurve(
            "bls12_377_g2", Fq2Ring(field(BLS12_377_FQ)), _ref.BLS12_377_G2, field(BLS12_377_FR)
        )
    raise ValueError(name)
