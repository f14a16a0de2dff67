"""Pippenger bucket MSM, recast for TPU (no scatters, planes-native).

Classic Pippenger splits scalars into c-bit windows and accumulates
per-bucket sums — a data-dependent scatter, which TPUs hate.  This
formulation gets the same O(m) adds per window with only sorts,
gathers, and tree reductions:

  window sum  S_j = sum_k k * B_jk  =  sum_{k=1}^{2^c-1} T_jk,
  where T_jk = sum of P_i with digit_ij >= k   (suffix sums).

Measured cost model on the target chip (v5e): every fused point-kernel
launch carries ~0.45 ms fixed overhead and ~80 ns/add of linear work,
so the shape that wins batches ALL windows into ONE flat virtual array
(slot (w, i) holds P[i], keyed by (w, digit_iw)): one single-key sort
groups every (window, bucket) segment, one gather permutes the points,
one reduction tree serves every suffix query — ~45 kernel launches per
MSM instead of ~1200 for a per-window loop (which measured 0.97 s/iter
at m=2^14 against this design's ~0.1 s).

Key layout packs the permutation into the sort key —
(window | digit | slot) — so a SINGLE-operand bitonic sort (the Pallas
kernel in fields/sortperm.py; XLA's variadic sort measured orders of
magnitude slower) yields both the grouping and the gather order; when
the packed key would exceed 32 bits, windows are processed in groups
sized to fit (fori_loop over groups).  Bucket boundaries come from one
searchsorted over the sorted keys.

Input points are normalized to affine ONCE (a single batched
simultaneous inversion amortized over all ~(256/c) windows): the
widest tree level — half of all adds — runs the fused
affine+affine->Jacobian kernel (mmadd-2007-bl, 4M+3S vs ~14M+9S for
the complete Jacobian add), level-0 suffix-query nodes use the mixed
add, and gathers move 2 coordinates instead of 3.

Point data stays in limb-major "planes" layout (npl, B) end to end —
one transpose in, one out — so every kernel call is pure compute (see
curves/fused.py).  (The reference's hot loop is arkworks' Pippenger,
dmsm/mod.rs:73; this is its TPU-native shape.)
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.sortperm import sort_u32
from ..fields.spec import LIMB_BITS
from .fused import (
    padd,
    padd_if,
    paddaa,
    pdouble,
    pfinv,
    pfmul,
    pinfinity,
    pmadd_if,
    points_from_planes,
    points_to_planes,
)
from .jcurve import JCurve

WINDOW = int(os.environ.get("ZKSAAS_MSM_WINDOW", 8))
# max flat virtual-array slots per group: the sort kernel holds the
# packed keys plus unrolled-stage temporaries in VMEM (~100 bytes/slot
# of scoped stack at the deepest stages; 2^19 measured ~50 MB)
MAX_VIRT = 1 << int(os.environ.get("ZKSAAS_MSM_MAXVIRT", 19))
# floor for the deep-tree-levels fixed scan width (one pallas block =
# 1024 lanes; smaller only makes sense for exercising the scan path in
# tiny-m tests).  Must be a power of two: the ku derivation below
# ((V // scan_w).bit_length() - 1) and the scan carry width both assume
# it — a stray value would surface as an opaque shape mismatch at
# compile time.
_SCAN_W_MIN = int(os.environ.get("ZKSAAS_MSM_SCANW", 1024))
assert _SCAN_W_MIN >= 2 and _SCAN_W_MIN & (_SCAN_W_MIN - 1) == 0, (
    f"ZKSAAS_MSM_SCANW must be a power of two >= 2, got {_SCAN_W_MIN}"
)
# cap doublings fused into one kernel: each fused double is ~7 field
# muls of kernel body, and every distinct k is its own Mosaic compile
# (~5-15 s); k in {8, 16} covers the Horner folds with two small bodies
_DBL_CHUNK = 16


def _deinter(a):
    """Split even/odd lanes of (..., 2k) via reshape — NEVER a stride-2
    lane slice: XLA:TPU lowers `a[..., 0::2]` on wide arrays into a
    pathological relayout (measured 1.0 s for four such slices of a
    (32, 2^18) uint32 array vs 5 ms for this reshape form; the 2.5 s/iter
    BENCH_r02/r03 dMSM regression was exactly this on the paddaa level)."""
    v = a.reshape(a.shape[:-1] + (a.shape[-1] // 2, 2))
    return v[..., 0], v[..., 1]


def _pdouble_k(spec, ncoord, P, k: int):
    while k > 0:
        step = min(k, _DBL_CHUNK)
        P = pdouble(spec, ncoord, P, k=step)
        k -= step
    return P


def _psum_seg(spec, ncoord, Pp, groups: int):
    """Tree-reduce (npl, groups * q) planes points within each length-q
    segment -> (npl, groups).  Summation order is irrelevant, so each
    level adds contiguous halves of every segment."""
    npl = Pp[0].shape[0]
    n = Pp[0].shape[1] // groups
    while n > 1:
        half = n // 2
        v = tuple(c.reshape(npl, groups, n) for c in Pp)
        lo = tuple(c[:, :, :half].reshape(npl, -1) for c in v)
        hi = tuple(c[:, :, half : 2 * half].reshape(npl, -1) for c in v)
        s = padd(spec, ncoord, lo, hi)
        if n % 2:
            tail = tuple(c[:, :, -1:] for c in v)
            s = tuple(
                jnp.concatenate([a.reshape(npl, groups, half), t], axis=2).reshape(
                    npl, -1
                )
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
        lo, hi = _deinter(cur)
        cur = pfmul(spec, ncoord, lo, hi)
    cur = pfinv(spec, ncoord, cur)
    for lev in reversed(levels):
        lo, hi = _deinter(lev)
        il = pfmul(spec, ncoord, cur, hi)
        ir = pfmul(spec, ncoord, cur, lo)
        cur = jnp.stack([il, ir], axis=2).reshape(lev.shape[0], -1)
    return cur


def _to_affine_planes(spec, ncoord: int, Pp):
    """Jacobian planes (X, Y, Z) -> affine planes ((x, y), inf flag):
    one batched inversion + 4 products for the whole array."""
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
    m = scalars_mont.shape[0]
    assert m & (m - 1) == 0, "pippenger path expects power-of-two m (pad with zeros)"
    if m > MAX_VIRT:
        # HBM-tiled fallback: the in-VMEM bitonic sort (fields/sortperm.py)
        # holds at most MAX_VIRT keys, so beyond that split the point axis
        # into MAX_VIRT-point chunks — each a full Pippenger — and sum the
        # chunk results (m/MAX_VIRT - 1 extra complete adds, negligible).
        acc = None
        for i in range(0, m, MAX_VIRT):
            part = msm_pippenger(
                curve,
                tuple(co[i : i + MAX_VIRT] for co in P),
                scalars_mont[i : i + MAX_VIRT],
            )
            acc = part if acc is None else curve.add(acc, part)
        return acc
    raw = fr.from_mont(scalars_mont)  # (m, Kr)
    c = WINDOW
    nbits = fr.spec.bits
    n_windows = -(-nbits // c)
    per_limb = LIMB_BITS // c
    L = m.bit_length() - 1  # log2(m)

    # windows per group: the packed sort key (w | digit | slot) must
    # fit 32 bits (slot is the in-window point index, L bits) and the
    # key array must fit the sort kernel's VMEM budget
    WG = 1
    while (
        WG < n_windows
        and WG.bit_length() + c + L <= 32
        and 2 * WG * m <= MAX_VIRT
    ):
        WG *= 2  # (2*WG*m: the guard checks the size after doubling)
    n_groups = -(-n_windows // WG)
    V = WG * m

    Pp, _ = points_to_planes(ncoord, P)  # coords (npl, m)
    npl = Pp[0].shape[0]
    # normalize once to affine (amortized over all windows); one
    # stacked (2*npl, m) array so each permutation is a single take
    xa, ya, infP = _to_affine_planes(spec, ncoord, Pp)
    Pstack = jnp.concatenate([xa, ya], axis=0)

    def unstack3(s):
        return tuple(s[i * npl : (i + 1) * npl] for i in range(3))

    def vary(Pt):
        # make constant carry/accumulator inits inherit Pstack's
        # varying manual axes (shard_map loop-carry typing; a no-op
        # numerically)
        return tuple(co ^ (Pstack[:npl, :1] & 0) for co in Pt)

    def group_sums(g):
        """Window sums S_j for windows [g*WG, g*WG + WG) as an
        (npl, WG)-planes Jacobian tuple (padded window slots compute a
        duplicate of the last window, discarded by the caller)."""
        j = g * WG + jnp.arange(WG, dtype=jnp.uint32)
        j = jnp.minimum(j, n_windows - 1)
        limb = jnp.take(raw, j // per_limb, axis=-1).T  # (WG, m)
        shift = (np.uint32(c) * (j % per_limb))[:, None]
        digits = (limb >> shift) & ((1 << c) - 1)
        # single-key sort: [w | digit | slot] (<= 32 bits)
        wtag = jax.lax.broadcasted_iota(jnp.uint32, (WG, m), 0)
        keys = (
            (wtag << np.uint32(c + L))
            | (digits << np.uint32(L))
            | jax.lax.broadcasted_iota(jnp.uint32, (WG, m), 1)
        ).reshape(-1)
        sorted_keys = sort_u32(keys)
        order = sorted_keys & np.uint32(m - 1)  # slot = P index
        Sx = jnp.take(Pstack, order, axis=1)  # (2npl, V) affine
        Sinf = jnp.take(infP, order)

        # reduction tree over the flat array: level 0 = affine leaves,
        # level 1 = fused affine+affine->Jacobian, deeper = Jacobian.
        # Nodes of size <= m never span a window boundary.
        #
        # Every distinct pallas width is its own ~5-15 s Mosaic compile,
        # so only the top levels are unrolled at their true width; once
        # the width reaches scan_w the remaining levels run as ONE
        # lax.scan body at fixed width scan_w/2 (a single kernel for
        # all deep levels).  Scan step i computes level ku+1+i: only the
        # first V/2^(ku+1+i) lanes are meaningful, the tail recycles
        # stale lanes (valid field elements, never read back).
        scan_w = max(_SCAN_W_MIN, V >> 5)
        ku = L if V <= scan_w else min(L, (V // scan_w).bit_length() - 1)
        levels = [("aff", Sx, Sinf)]
        Slo, Shi = _deinter(Sx)
        ilo, ihi = _deinter(Sinf)
        cur = jnp.concatenate(
            paddaa(
                spec,
                ncoord,
                (Slo[:npl], Slo[npl:]),
                (Shi[:npl], Shi[npl:]),
                ilo,
                ihi,
            ),
            axis=0,
        )
        levels.append(("jac", cur, None))
        for _l in range(ku - 1):
            clo, chi = _deinter(cur)
            cur = jnp.concatenate(
                padd(spec, ncoord, unstack3(clo), unstack3(chi)),
                axis=0,
            )
            levels.append(("jac", cur, None))
        ys = None
        if L > ku:

            def tree_step(carry, _):
                lo, hi = _deinter(carry)
                s = jnp.concatenate(
                    padd(spec, ncoord, unstack3(lo), unstack3(hi)), axis=0
                )
                return jnp.concatenate([s, carry[:, : scan_w // 2]], axis=1), s

            _, ys = jax.lax.scan(tree_step, cur, None, length=L - ku)

        # suffix-query start positions: for window w, bucket k, the
        # first sorted position with key >= [w | k | 0]
        ws = jnp.repeat(jnp.arange(WG, dtype=jnp.uint32), (1 << c) - 1)
        ks = jnp.tile(jnp.arange(1, 1 << c, dtype=jnp.uint32), WG)
        targets = (ws << np.uint32(c + L)) | (ks << np.uint32(L))
        bs = jnp.searchsorted(sorted_keys, targets, side="left").astype(jnp.int32)
        seg_end = (ws.astype(jnp.int32) + 1) * m

        # batched segment-tree suffix sums over [b, seg_end): include
        # the level-l node iff bit l of r = seg_end - b is set; node
        # index (b + (r mod 2^l)) >> l (segment alignment guarantees
        # in-window nodes).  Tree stops at node size m (level L).
        r = seg_end - bs
        acc = vary(pinfinity(spec, ncoord, bs.shape[0]))
        for l in range(L + 1):
            has = ((r >> l) & 1) == 1
            cur_l = bs + (r & ((1 << l) - 1))
            idx = jnp.clip(cur_l >> l, 0, (V >> l) - 1)
            if l == 0:
                node = (
                    jnp.take(Sx[:npl], idx, axis=1),
                    jnp.take(Sx[npl:], idx, axis=1),
                )
                ninf = jnp.take(Sinf, idx)
                acc = pmadd_if(spec, ncoord, has & (ninf == 0), acc, node)
            else:
                lv = levels[l][1] if l <= ku else ys[l - ku - 1]
                node = unstack3(jnp.take(lv, idx, axis=1))
                acc = padd_if(spec, ncoord, has, acc, node)

        return _psum_seg(spec, ncoord, acc, WG)  # (npl, WG)

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
    S = tuple(co[:, :n_windows] for co in S)

    # combine windows: log-fold pairs — T_j = S_{2j} + 2^(c*2^level)
    # S_{2j+1} — so the whole Horner walk costs ~2 log(n_windows)
    # kernel launches instead of 2 per window
    k = c
    cur = S
    n = n_windows
    while n > 1:
        half = n // 2
        lo = tuple(co[:, 0 : 2 * half : 2] for co in cur)
        hi = tuple(co[:, 1 : 2 * half : 2] for co in cur)
        hi2 = _pdouble_k(spec, ncoord, hi, k)
        nxt = padd(spec, ncoord, lo, hi2)
        if n % 2:
            # odd tail pairs with nothing this level; fold it into the
            # last slot shifted by the level's doubling
            tail = tuple(co[:, -1:] for co in cur)
            nxt = tuple(jnp.concatenate([a, t], axis=1) for a, t in zip(nxt, tail))
            # tail now represents windows k..: its weight doubles next level
        cur = nxt
        n = cur[0].shape[1]
        k *= 2
    total = cur
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
            jnp.concatenate([co, ico], axis=len(bshape)) for co, ico in zip(P, inf)
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
