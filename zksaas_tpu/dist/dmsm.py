"""Distributed MSM (dist-primitives/src/dmsm/mod.rs).

Each party MSMs its packed base/scalar shares locally (the hot loop,
dmsm/mod.rs:73), masks, and sends ONE group element to the king; the
king unpacks (dropout-aware), sums the l unpacked secrets into the
final value, and re-broadcasts it as a repeated packed sharing
(dmsm/mod.rs:59-102).  Communication is O(1) group elements per party
regardless of m."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..curves.jcurve import JCurve
from ..pss.pss import PackedSharingParams


def d_msm_local(curve: JCurve, bases_share, scalars_share, mask):
    """Per-party local stage of d_msm: the MSM hot loop (G::msm,
    dmsm/mod.rs:73) plus the input mask — no communication."""
    with jax.named_scope("d_msm.local"):
        nchunks = scalars_share.shape[-2]
        if curve.fr._pallas_enabled() and nchunks >= 256:
            # bucket-Pippenger local MSM on TPU (see curves/pippenger.py)
            from ..curves.pippenger import msm_best

            c_share = msm_best(curve, bases_share, scalars_share)
        else:
            if curve.fr._pallas_enabled():
                prods = curve.scalar_mul_w4(bases_share, scalars_share)
            else:
                prods = curve.scalar_mul(bases_share, scalars_share)
            c_share = curve.sum(prods, axis=-1)
    return curve.add(c_share, mask.in_mask)


def d_msm_reduce(pp: PackedSharingParams, curve: JCurve, c_share, mask, net, channel=0):
    """Communication stage of d_msm: gather-to-king, unpack + sum,
    re-broadcast as a repeated packed sharing, unmask
    (dmsm/mod.rs:75-101)."""

    def king_fn(shares, parties):
        # shares: points with leading axis (n_present,)
        secrets = pp.unpack_missing_shares_g(curve, shares, parties)  # (l,)
        total = curve.sum(secrets, axis=0)
        return tuple(
            jnp.broadcast_to(c[None], (pp.n,) + c.shape) for c in total
        )

    result = net.round(c_share, king_fn, channel)
    return curve.add(result, mask.out_mask)


def d_msm(pp: PackedSharingParams, curve: JCurve, bases_share, scalars_share, mask, net, channel=0):
    """bases_share: points with trailing chunk axis (..., m/l);
    scalars_share: (..., m/l, K).  Returns one point per party (packed
    sharing of the MSM value, repeated l times)."""
    c_share = d_msm_local(curve, bases_share, scalars_share, mask)
    return d_msm_reduce(pp, curve, c_share, mask, net, channel)


@dataclass
class MsmMask:
    """One random group-element mask per party (dmsm/mod.rs:10-57).

    in_mask_pts / out_mask_pts: point tuples with leading party axis n;
    out masks sum-correct so that unpack2(results) - masks telescopes:
    out_mask value = -(sum of in_mask secrets) (dmsm/mod.rs:32-38)."""

    in_mask: tuple
    out_mask: tuple

    @staticmethod
    def sample(pp: PackedSharingParams, curve: JCurve, key):
        from ..curves.fixed_base import fixed_base_mul

        F = pp.F
        k_s, k_in, k_out = jax.random.split(key, 3)
        # l random group elements (gen * random scalar) — fixed-base
        # windowed tables (64 adds) instead of 254 double-and-adds
        scal = F.rand(k_s, (pp.l,))
        vals = fixed_base_mul(curve, scal)  # (l,) points
        out_val = curve.neg(curve.sum(vals, axis=0))
        # pack the l values -> n shares (random pads = random points)
        def rand_pts(k, cnt):
            return fixed_base_mul(curve, F.rand(k, (cnt,)))

        in_shares = pp.pack_g(curve, vals, rand_pts(k_in, pp.t))
        rep = tuple(jnp.broadcast_to(c[None], (pp.l,) + c.shape) for c in out_val)
        out_shares = pp.pack_g(curve, rep, rand_pts(k_out, pp.t))
        return MsmMask(in_mask=in_shares, out_mask=out_shares)

    @staticmethod
    def zero(pp: PackedSharingParams, curve: JCurve):
        inf = curve.infinity((pp.n,))
        return MsmMask(in_mask=inf, out_mask=inf)

    def party(self, i):
        return MsmMask(
            in_mask=tuple(c[i] for c in self.in_mask),
            out_mask=tuple(c[i] for c in self.out_mask),
        )
