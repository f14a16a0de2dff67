"""Pippenger bucket MSM, recast for TPU (no scatters, planes-native).

Classic Pippenger splits scalars into c-bit windows and accumulates
per-bucket sums — a data-dependent scatter, which TPUs hate.  This
formulation gets the same O(m) adds per window with only sorts,
gathers, and tree reductions:

  window sum  S_j = sum_k k * B_jk  =  sum_{k=1}^{2^c-1} T_jk,
  where T_jk = sum of P_i with digit_ij >= k   (suffix sums).

Per window: sort points by digit (XLA sort + gather), build a binary
reduction tree over the sorted points (m-1 fused point-adds in log m
kernel calls), then answer the 2^c-1 suffix queries [b_k, m) with
O(log m) tree-node adds each — the queries are batched, so the whole
query phase costs ~log m fused add_if calls of width 2^c.  Final
combine is a Horner walk over windows (one fused c-fold-double kernel
+ 1 add each).

Point data stays in limb-major "planes" layout (npl, B) end to end —
one transpose in, one out — so every kernel call is pure compute (see
curves/fused.py).  Point-op count: ~(256/c) * m adds total.  (The
reference's hot loop is arkworks' Pippenger, dmsm/mod.rs:73; this is
its TPU-native shape.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.spec import LIMB_BITS
from .fused import (
    padd,
    padd_if,
    pdouble,
    pinfinity,
    points_from_planes,
    points_to_planes,
)
from .jcurve import JCurve

WINDOW = 8


def _psum(spec, ncoord, Pp):
    """Tree-reduce point sum along the planes batch axis -> (npl, 1)."""
    n = Pp[0].shape[1]
    while n > 1:
        half = n // 2
        even = tuple(c[:, : 2 * half : 2] for c in Pp)
        odd = tuple(c[:, 1 : 2 * half : 2] for c in Pp)
        s = padd(spec, ncoord, even, odd)
        if n % 2:
            s = tuple(
                jnp.concatenate([a, c[:, -1:]], axis=1) for a, c in zip(s, Pp)
            )
        Pp = s
        n = Pp[0].shape[1]
    return Pp


@functools.partial(jax.jit, static_argnums=0)
def msm_pippenger(curve: JCurve, P, scalars_mont):
    """sum_i P[i] * s[i] over axis 0.  P: points (m, ...); scalars:
    (m, K) Montgomery form.  Returns a (..., K)-layout point tuple."""
    fr = curve.fr
    spec = curve.R.F.spec
    ncoord = curve._ncoord
    raw = fr.from_mont(scalars_mont)  # (m, Kr)
    m = raw.shape[0]
    assert m & (m - 1) == 0, "pippenger path expects power-of-two m (pad with zeros)"
    c = WINDOW
    nbits = fr.spec.bits
    n_windows = -(-nbits // c)
    per_limb = LIMB_BITS // c
    L = m.bit_length() - 1  # log2(m)

    Pp, _ = points_to_planes(ncoord, P)  # coords (npl, m)
    npl = Pp[0].shape[0]
    # one stacked (3*npl, m) array so each permutation is a single take
    Pstack = jnp.concatenate(Pp, axis=0)

    def window_sum(j):
        limb = jnp.take(raw, j // per_limb, axis=-1)
        shift = np.uint32(c) * (j % per_limb).astype(jnp.uint32)
        digits = (limb >> shift) & ((1 << c) - 1)  # (m,)
        # single key-only sort: digit in the high bits, index below —
        # replaces argsort (key+payload) AND searchsorted reads the
        # digit back from the key
        keys = (digits << np.uint32(L)) | jnp.arange(m, dtype=jnp.uint32)
        sorted_keys = jnp.sort(keys)
        order = sorted_keys & np.uint32(m - 1)
        dsort = sorted_keys >> np.uint32(L)
        Ss = jnp.take(Pstack, order, axis=1)

        def unstack(s):
            return tuple(s[i * npl : (i + 1) * npl] for i in range(3))

        # reduction tree (stacked coords): levels[l] has m >> l nodes
        levels = [Ss]
        cur = Ss
        for _l in range(L):
            nxt = padd(spec, ncoord, unstack(cur[:, 0::2]), unstack(cur[:, 1::2]))
            cur = jnp.concatenate(nxt, axis=0)
            levels.append(cur)

        # suffix-query start indices: b_k = first idx with dsort >= k
        ks = jnp.arange(1, 1 << c, dtype=dsort.dtype)  # (2^c - 1,)
        bs = jnp.searchsorted(dsort, ks, side="left").astype(jnp.int32)

        # batched segment-tree suffix sums over [b, m): include the
        # level-l node iff bit l of the remaining count r = m - b is
        # set; the node index is (b + (r mod 2^l)) >> l (alignment is
        # guaranteed because m is a power of two).
        r = m - bs
        acc = pinfinity(spec, ncoord, bs.shape[0])
        for l in range(L + 1):
            has = ((r >> l) & 1) == 1
            cur_l = bs + (r & ((1 << l) - 1))
            idx = jnp.clip(cur_l >> l, 0, (m >> l) - 1)
            node = unstack(jnp.take(levels[l], idx, axis=1))
            acc = padd_if(spec, ncoord, has, acc, node)

        return _psum(spec, ncoord, acc)  # (npl, 1) — S_j

    # Horner over windows, MSB first
    def body(i, total):
        j = n_windows - 1 - i
        S_j = window_sum(j)
        total = pdouble(spec, ncoord, total, k=c)
        return padd(spec, ncoord, total, S_j)

    total = jax.lax.fori_loop(0, n_windows, body, pinfinity(spec, ncoord, 1))
    out = points_from_planes(ncoord, total, (1,), spec.nlimbs)
    return tuple(co[0] for co in out)


@functools.partial(jax.jit, static_argnums=0)
def msm_best(curve: JCurve, P, scalars_mont):
    """MSM with leading batch dims: bucket-Pippenger per batch element
    (vmapped), padding the point axis to a power of two with
    (infinity, zero-scalar) pairs.  P: points (..., m); scalars:
    (..., m, K)."""
    bshape = curve.batch_shape(P)[:-1]
    m = curve.batch_shape(P)[-1]
    mp = 1 << (m - 1).bit_length()
    if mp != m:
        ncoord = len(curve.R.coord_shape)
        inf = curve.infinity(bshape + (mp - m,))
        P = tuple(
            jnp.concatenate([co, ico], axis=len(bshape))
            for co, ico in zip(P, inf)
        )
        pad = [(0, 0)] * len(bshape) + [(0, mp - m), (0, 0)]
        scalars_mont = jnp.pad(scalars_mont, pad)
    flatP = tuple(co.reshape((-1, mp) + co.shape[len(bshape) + 1 :]) for co in P)
    flats = scalars_mont.reshape(-1, mp, scalars_mont.shape[-1])
    nb = flats.shape[0]
    if nb == 1:
        out = msm_pippenger(curve, tuple(co[0] for co in flatP), flats[0])
        out = tuple(co[None] for co in out)
    else:
        fn = jax.vmap(
            lambda p, s: msm_pippenger(curve, p, s), in_axes=((0,) * len(flatP), 0)
        )
        out = fn(flatP, flats)
    return tuple(co.reshape(bshape + co.shape[1:]) for co in out)
