"""Pippenger bucket MSM, recast for TPU (no scatters, planes-native).

Classic Pippenger splits scalars into c-bit windows and accumulates
per-bucket sums — a data-dependent scatter, which TPUs hate.  This
formulation gets the same O(m) adds per window with only sorts,
gathers, and tree reductions:

  window sum  S_j = sum_k k * B_jk  =  sum_{k=1}^{2^c-1} T_jk,
  where T_jk = sum of P_i with digit_ij >= k   (suffix sums).

All windows are processed as ONE flat virtual array of up to 2^21
slots (slot (w, i) holds P[i mod m] keyed by (w, digit_iw)): a single
two-operand sort groups every (window, bucket) segment, ONE gather
permutes the points, ONE reduction tree serves every suffix query.
Batching all windows together matters because each kernel launch has
a fixed cost comparable to its compute at small widths — per-window
trees spent most of their time in launch overhead.

The reduction tree is hybrid batch-affine/Jacobian: input points are
normalized to affine once (batched inversion), and tree levels with
>= AFF_MIN adds use the batch-affine add — 2M+2S per add plus ~3
ring muls of simultaneous-inversion overhead (product tree up, one
in-kernel Fermat at the root, walk down) versus ~14M+9S for the
complete Jacobian add.  Deep (narrow) levels switch to Jacobian adds
where one inversion round-trip would cost more than it saves.  Suffix
queries [b, seg_end) are answered with O(log m) tree-node adds each,
batched across all 2^c-1 buckets of all windows (mixed Jacobian +
affine-node adds).  The final combine is a Horner walk over windows
(one fused c-fold-double kernel + 1 add each).

Point data stays in limb-major "planes" layout (npl, B) end to end —
one transpose in, one out — so every kernel call is pure compute (see
curves/fused.py).  Point-op count: ~(256/c) * m adds total, ~7 ring
muls each on the wide levels.  (The reference's hot loop is arkworks'
Pippenger, dmsm/mod.rs:73; this is its TPU-native shape.)
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
    paddaa,
    paff_apply,
    paff_denom,
    pdouble,
    pfinv,
    pfmul,
    pinfinity,
    pmadd_if,
    points_from_planes,
    points_to_planes,
)
from .jcurve import JCurve

import os

WINDOW = int(os.environ.get("ZKSAAS_MSM_WINDOW", 8))
# max slots in the flat all-windows virtual array (memory guard: the
# affine tree keeps ~2x this many (x, y) coordinate pairs live)
MAX_VIRT = 1 << int(os.environ.get("ZKSAAS_MSM_MAXVIRT", 21))
# use batch-affine adds while a tree level has at least this many adds
# (0 = disabled).  Disabled by default: measured on TPU v5e the
# batch-affine level (denom kernel + multi-level inversion product tree
# + apply kernel) is ~65x SLOWER than the single fused-Jacobian padd
# kernel — the saved multiplies are dwarfed by the extra HBM round
# trips between kernels (4k vs 260k pts/s at m=2^14).  The path is kept
# for architectures where compute, not bandwidth, is the bottleneck.
AFF_MIN = int(os.environ.get("ZKSAAS_MSM_AFF_MIN", 0))
if AFF_MIN == 0:
    AFF_MIN = 1 << 62


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


def _psum_seg(spec, ncoord, Pp, groups: int):
    """Tree-reduce (npl, groups * q) planes points within each length-q
    segment -> (npl, groups)."""
    npl = Pp[0].shape[0]
    n = Pp[0].shape[1] // groups
    while n > 1:
        half = n // 2
        v = tuple(c.reshape(npl, groups, n) for c in Pp)
        even = tuple(c[:, :, : 2 * half : 2].reshape(npl, -1) for c in v)
        odd = tuple(c[:, :, 1 : 2 * half : 2].reshape(npl, -1) for c in v)
        s = padd(spec, ncoord, even, odd)
        if n % 2:
            tail = tuple(c[:, :, -1:] for c in v)
            s = tuple(
                jnp.concatenate([a.reshape(npl, groups, half), t], axis=2).reshape(npl, -1)
                for a, t in zip(s, tail)
            )
        Pp = s
        n = Pp[0].shape[1] // groups
    return Pp


def _pbatch_inv(spec, ncoord: int, d):
    """Simultaneous inversion of (npl, B) planes elements (all nonzero;
    B a power of two): product tree up via fused pfmul kernels, one
    in-kernel batched Fermat inversion at the root (width <= 1024),
    then walk down — inv(left) = inv(parent) * right and vice versa.
    ~3 ring muls per element, the classic Montgomery-trick tree."""
    levels = []
    cur = d
    while cur.shape[1] > 1024:
        levels.append(cur)
        cur = pfmul(spec, ncoord, cur[:, 0::2], cur[:, 1::2])
    cur = pfinv(spec, ncoord, cur)
    for lev in reversed(levels):
        il = pfmul(spec, ncoord, cur, lev[:, 1::2])
        ir = pfmul(spec, ncoord, cur, lev[:, 0::2])
        cur = jnp.stack([il, ir], axis=2).reshape(lev.shape[0], -1)
    return cur


def _to_affine_planes(spec, ncoord: int, Pp):
    """Jacobian planes (X, Y, Z) -> affine planes ((x, y), inf flag):
    one batched inversion + 4 products for the whole array.  Affine
    inputs make every tree add 2M+2S instead of the ~23-mul complete
    Jacobian add (and cut gather bandwidth by a third)."""
    X, Y, Z = Pp
    B = Z.shape[1]
    inf = jnp.all(Z == 0, axis=0)
    pone = pinfinity(spec, ncoord, B)[0]
    zsafe = jnp.where(inf[None, :], pone, Z)
    zi = _pbatch_inv(spec, ncoord, zsafe)
    zi2 = pfmul(spec, ncoord, zi, zi)
    zi3 = pfmul(spec, ncoord, zi2, zi)
    xa = pfmul(spec, ncoord, X, zi2)
    ya = pfmul(spec, ncoord, Y, zi3)
    return xa, ya, inf.astype(jnp.uint32)


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

    # windows per flat batch (all of them when the virtual array fits)
    WG = 1
    while WG < n_windows and WG * 2 * m <= MAX_VIRT:
        WG *= 2
    n_groups = -(-n_windows // WG)

    Pp, _ = points_to_planes(ncoord, P)  # coords (npl, m)
    npl = Pp[0].shape[0]
    # normalize once to affine (batched inversion); one stacked
    # (2*npl, m) array so each permutation is a single take
    # (point for virtual slot (w, i) is P[i] — gather by index mod m)
    xa, ya, infP = _to_affine_planes(spec, ncoord, Pp)
    Pstack = jnp.concatenate([xa, ya], axis=0)

    def unstack3(s):
        return tuple(s[i * npl : (i + 1) * npl] for i in range(3))

    def group_sums(g):
        """Window sums S_j for the WG windows [g*WG, g*WG + WG), as a
        (npl, WG)-planes Jacobian tuple (padded windows produce an
        unused duplicate of the last window)."""
        # digits for each window in the group: (WG, m)
        j = g * WG + jnp.arange(WG, dtype=jnp.uint32)
        j = jnp.minimum(j, n_windows - 1)
        limb = jnp.take(raw, j // per_limb, axis=-1).T  # (WG, m)
        shift = (np.uint32(c) * (j % per_limb))[:, None]
        digits = (limb >> shift) & ((1 << c) - 1)
        # two-operand sort by [window | digit]; payload = virtual index
        wtag = jnp.repeat(jnp.arange(WG, dtype=jnp.uint32), m)
        keys = (wtag << np.uint32(c)) | digits.reshape(-1)
        gidx = jnp.arange(WG * m, dtype=jnp.uint32)
        sorted_keys, sorted_idx = jax.lax.sort((keys, gidx), num_keys=1)
        order = sorted_idx & np.uint32(m - 1)  # virtual idx mod m
        Sx = jnp.take(Pstack, order, axis=1)  # (2npl, WG*m) affine
        Sinf = jnp.take(infP, order)

        # hybrid reduction tree over the virtual array, levels 0..L
        # (nodes of size <= m never span a window segment)
        levels = [("aff", Sx, Sinf)]
        cur, curinf = Sx, Sinf
        kind = "aff"
        for _l in range(L):
            w = cur.shape[1]
            if kind == "aff" and w // 2 >= AFF_MIN:
                Pe = (cur[:npl, 0::2], cur[npl:, 0::2])
                Po = (cur[:npl, 1::2], cur[npl:, 1::2])
                ie, io = curinf[0::2], curinf[1::2]
                d, inf3 = paff_denom(spec, ncoord, Pe, Po, ie, io)
                ivd = _pbatch_inv(spec, ncoord, d)
                x3, y3 = paff_apply(spec, ncoord, Pe, Po, ivd, ie, io)
                cur = jnp.concatenate([x3, y3], axis=0)
                curinf = inf3
                levels.append(("aff", cur, curinf))
            elif kind == "aff":
                # widest Jacobian level: both inputs still affine —
                # one fused affine+affine->Jacobian kernel (4M+3S per
                # add, no _aff_to_jac materialization)
                nxt = paddaa(
                    spec,
                    ncoord,
                    (cur[:npl, 0::2], cur[npl:, 0::2]),
                    (cur[:npl, 1::2], cur[npl:, 1::2]),
                    curinf[0::2],
                    curinf[1::2],
                )
                cur = jnp.concatenate(nxt, axis=0)
                curinf = None
                kind = "jac"
                levels.append(("jac", cur, None))
            else:
                nxt = padd(spec, ncoord, unstack3(cur[:, 0::2]), unstack3(cur[:, 1::2]))
                cur = jnp.concatenate(nxt, axis=0)
                levels.append(("jac", cur, None))

        # suffix-query targets: for window w, bucket k: first sorted
        # position with key >= [w | k]
        ws = jnp.repeat(jnp.arange(WG, dtype=jnp.uint32), (1 << c) - 1)
        ks = jnp.tile(jnp.arange(1, 1 << c, dtype=jnp.uint32), WG)
        targets = (ws << np.uint32(c)) | ks
        bs = jnp.searchsorted(sorted_keys, targets, side="left").astype(jnp.int32)
        seg_end = (ws.astype(jnp.int32) + 1) * m

        # batched segment-tree suffix sums over [b, seg_end): include
        # the level-l node iff bit l of r = seg_end - b is set; node
        # index (b + (r mod 2^l)) >> l (segment alignment guarantees
        # in-window nodes).
        r = seg_end - bs
        acc = pinfinity(spec, ncoord, bs.shape[0])
        for l in range(L + 1):
            has = ((r >> l) & 1) == 1
            cur_l = bs + (r & ((1 << l) - 1))
            idx = jnp.clip(cur_l >> l, 0, (WG * m >> l) - 1)
            lkind, lv, lvinf = levels[l]
            if lkind == "aff":
                node = (jnp.take(lv[:npl], idx, axis=1), jnp.take(lv[npl:], idx, axis=1))
                ninf = jnp.take(lvinf, idx)
                acc = pmadd_if(spec, ncoord, has & (ninf == 0), acc, node)
            else:
                node = unstack3(jnp.take(lv, idx, axis=1))
                acc = padd_if(spec, ncoord, has, acc, node)

        return _psum_seg(spec, ncoord, acc, WG)  # (npl, WG)

    def vary(Pt):
        # make constant carry inits inherit Pstack's varying manual
        # axes (shard_map loop-carry typing; numerically a no-op)
        return tuple(co ^ (Pstack[:npl, :1] & 0) for co in Pt)

    if n_groups == 1:
        S = group_sums(0)
    else:
        def collect(g, bufs):
            Sg = group_sums(g)
            return tuple(
                jax.lax.dynamic_update_slice_in_dim(b, s, g * WG, axis=1)
                for b, s in zip(bufs, Sg)
            )

        S = jax.lax.fori_loop(
            0, n_groups, collect, vary(pinfinity(spec, ncoord, n_groups * WG))
        )

    # Horner over windows, MSB first
    def horner(i, total):
        j = n_windows - 1 - i
        total = pdouble(spec, ncoord, total, k=c)
        Sj = tuple(jax.lax.dynamic_slice_in_dim(co, j, 1, axis=1) for co in S)
        return padd(spec, ncoord, total, Sj)

    total = jax.lax.fori_loop(0, n_windows, horner, vary(pinfinity(spec, ncoord, 1)))
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
