"""Packed proving-key (CRS) shares (reference: groth16/src/proving_key.rs).

The big query vectors are chunk-wise det_pack'ed (deterministic — the
CRS is public, proving_key.rs:72-86) point sharings; small scalars
(alpha/beta/delta, query[0] elements) are replicated in the clear
(proving_key.rs:106-120).  Short tail chunks are zero-padded (the
arkworks resize-to-l behavior), i.e. padded with the point at infinity.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..curves.jcurve import JCurve
from ..pss.pss import PackedSharingParams
from .local import Groth16Keys


def _pack_query(pp: PackedSharingParams, curve: JCurve, pts: list):
    """points -> det-packed party-major shares (n, nchunks) (tail chunks
    padded with infinity)."""
    l = pp.l
    nch = -(-len(pts) // l)
    padded = list(pts) + [None] * (nch * l - len(pts))
    P = curve.encode(padded, shape=(nch, l))
    shares = pp.det_pack_g(curve, P)  # (nch, n)
    return tuple(jnp.swapaxes(c, 0, 1) for c in shares)  # (n, nch)


@dataclass
class PackedProvingKeyShare:
    """Party-major packed CRS (leading axis n on every shared tensor).

    Field names follow the reference (proving_key.rs:18-37):
      s = a_query[1:], u = h_query, w = l_query, h = b_g1_query[1:],
      v = b_g2_query[1:] (G2)."""

    s: tuple
    u: tuple
    w: tuple
    h: tuple
    v: tuple
    # replicated clear elements (host affine points)
    a_query0: tuple
    b_g1_query0: tuple
    b_g2_query0: tuple
    delta_g1: tuple
    delta_g2: tuple
    alpha_g1: tuple
    beta_g1: tuple
    beta_g2: tuple

    def party(self, i):
        pick = lambda P: tuple(c[i] for c in P)
        return PackedProvingKeyShare(
            s=pick(self.s),
            u=pick(self.u),
            w=pick(self.w),
            h=pick(self.h),
            v=pick(self.v),
            a_query0=self.a_query0,
            b_g1_query0=self.b_g1_query0,
            b_g2_query0=self.b_g2_query0,
            delta_g1=self.delta_g1,
            delta_g2=self.delta_g2,
            alpha_g1=self.alpha_g1,
            beta_g1=self.beta_g1,
            beta_g2=self.beta_g2,
        )


def pack_proving_key(
    keys: Groth16Keys, pp: PackedSharingParams, g1: JCurve, g2: JCurve
) -> PackedProvingKeyShare:
    """pack_from_arkworks_proving_key analog (proving_key.rs:47-123)."""
    return PackedProvingKeyShare(
        s=_pack_query(pp, g1, keys.a_query[1:]),
        u=_pack_query(pp, g1, keys.h_query),
        w=_pack_query(pp, g1, keys.l_query),
        h=_pack_query(pp, g1, keys.b_g1_query[1:]),
        v=_pack_query(pp, g2, keys.b_g2_query[1:]),
        a_query0=keys.a_query[0],
        b_g1_query0=keys.b_g1_query[0],
        b_g2_query0=keys.b_g2_query[0],
        delta_g1=keys.delta_g1,
        delta_g2=keys.delta_g2,
        alpha_g1=keys.alpha_g1,
        beta_g1=keys.beta_g1,
        beta_g2=keys.beta_g2,
    )
