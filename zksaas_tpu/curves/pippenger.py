"""Pippenger bucket MSM, recast for TPU (no scatters).

Classic Pippenger splits scalars into c-bit windows and accumulates
per-bucket sums — a data-dependent scatter, which TPUs hate.  This
formulation gets the same O(m) adds per window with only sorts,
gathers, and tree reductions:

  window sum  S_j = sum_k k * B_jk  =  sum_{k=1}^{2^c-1} T_jk,
  where T_jk = sum of P_i with digit_ij >= k   (suffix sums).

Per window: sort points by digit (XLA sort + gather), build a binary
reduction tree over the sorted points (m-1 batched adds in log m
levels), then answer the 2^c-1 suffix queries [b_k, m) with O(log m)
tree-node adds each — the queries are batched, so the whole query
phase costs ~log m point-add steps of width 2^c.  Final combine is a
Horner walk over windows (c doublings + 1 add each).

Point-op count: ~(256/c) * m adds total vs ~(4*doubles+add)*64 per
point for windowed double-and-add — about 8x fewer field muls at
c = 8.  (The reference's hot loop is arkworks' Pippenger,
dmsm/mod.rs:73; this is its TPU-native shape.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.spec import LIMB_BITS
from .jcurve import JCurve

WINDOW = 8


@functools.partial(jax.jit, static_argnums=0)
def msm_pippenger(curve: JCurve, P, scalars_mont):
    """sum_i P[i] * s[i] over axis 0.  P: points (m, ...); scalars:
    (m, K) Montgomery form."""
    fr = curve.fr
    raw = fr.from_mont(scalars_mont)  # (m, K)
    m = raw.shape[0]
    assert m & (m - 1) == 0, "pippenger path expects power-of-two m (pad with zeros)"
    c = WINDOW
    nbits = fr.spec.bits
    n_windows = -(-nbits // c)
    per_limb = LIMB_BITS // c
    L = m.bit_length() - 1  # log2(m)

    def window_sum(j):
        limb = jnp.take(raw, j // per_limb, axis=-1)
        shift = np.uint32(c) * (j % per_limb).astype(jnp.uint32)
        digits = (limb >> shift) & ((1 << c) - 1)  # (m,)
        order = jnp.argsort(digits)
        dsort = jnp.take(digits, order)
        Psort = tuple(jnp.take(coord, order, axis=0) for coord in P)

        # reduction tree: levels[l] has m >> l nodes
        levels = [Psort]
        cur = Psort
        for _l in range(L):
            cur = curve.add(
                tuple(co[0::2] for co in cur), tuple(co[1::2] for co in cur)
            )
            levels.append(cur)

        # suffix-query start indices: b_k = first idx with dsort >= k
        ks = jnp.arange(1, 1 << c, dtype=dsort.dtype)  # (2^c - 1,)
        bs = jnp.searchsorted(dsort, ks, side="left").astype(jnp.int32)

        # batched segment-tree suffix sums over [b, m): include the
        # level-l node iff bit l of the remaining count r = m - b is
        # set; the node index is (b + (r mod 2^l)) >> l (alignment is
        # guaranteed because m is a power of two).
        r = m - bs
        acc = curve.infinity(bs.shape)
        for l in range(L + 1):
            has = ((r >> l) & 1) == 1
            cur_l = bs + (r & ((1 << l) - 1))
            idx = jnp.clip(cur_l >> l, 0, (m >> l) - 1)
            node = tuple(jnp.take(co, idx, axis=0) for co in levels[l])
            acc = curve.add_if(has, acc, node)

        return curve.sum(acc, axis=0)  # S_j

    # Horner over windows, MSB first
    def body(i, total):
        j = n_windows - 1 - i
        S_j = window_sum(j)
        for _ in range(c):
            total = curve.double(total)
        return curve.add(total, S_j)

    return jax.lax.fori_loop(0, n_windows, body, curve.infinity(()))


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
    fn = jax.vmap(lambda p, s: msm_pippenger(curve, p, s), in_axes=((0, 0, 0), 0))
    out = fn(flatP, flats)
    return tuple(co.reshape(bshape + co.shape[1:]) for co in out)
