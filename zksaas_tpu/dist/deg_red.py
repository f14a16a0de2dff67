"""Degree reduction (dist-primitives/src/utils/deg_red.rs).

After share-local multiplication the sharing degree doubles; the king
unpacks (degree-2(t+l-1)-aware) and re-packs fresh degree-(t+l-1)
shares: one gather + one scatter (deg_red.rs:80-126).  Parties blind
with in_mask before sending and un-blind with out_mask (= -mask,
re-packed) afterwards, so the king never sees true values
(deg_red.rs:94-123)."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..pss.pss import PackedSharingParams


def _deg_red_sharded(pp: PackedSharingParams, xm, key, net):
    """Sharded-king degree reduction for the SPMD mesh path: instead of
    gathering every share to a (replicated) king, the chunk axis is
    split across the mesh — each device unpacks and re-packs an equal
    shard of the sharings.  Two all_to_alls move 1/n of the all_gather
    bytes and the king compute runs n-way parallel ("butterfly"-style
    exchange per the north star; privacy unchanged — devices only ever
    see masked values, same as the king).  Bit-identical to the king
    path (same unpack2 matrix, same pads from the replicated key)."""
    F = pp.F
    n = pp.n
    num = xm.shape[-2]
    C = num // n
    me = jax.lax.axis_index(net.axis)
    # redistribute: my shares of chunk-range e -> device e
    blocks = xm.reshape(n, C, F.k)
    recv = jax.lax.all_to_all(blocks, net.axis, split_axis=0, concat_axis=0)
    sh = jnp.swapaxes(recv, 0, 1)  # (C, n, K): all parties' shares of MY chunks
    secrets = pp.unpack2(sh)  # (C, l, K)
    pads = pp.rand_pads(key, (num,))  # replicated; slice = king's pads
    my_pads = jax.lax.dynamic_slice_in_dim(pads, me * C, C, axis=0)
    out = pp.pack(secrets, my_pads)  # (C, n, K)
    back = jax.lax.all_to_all(out, net.axis, split_axis=1, concat_axis=0)
    return back.reshape(num, F.k)


def deg_red(pp: PackedSharingParams, x_share, mask, net, key, channel=0):
    """x_share: (..., num, K) packed-share values (num sharings per
    party); returns re-packed degree-(t+l-1) shares."""
    F = pp.F
    xm = F.add(x_share, mask.in_mask)

    num = x_share.shape[-2]
    if getattr(net, "axis", None) is not None and num % pp.n == 0 and x_share.ndim == 2:
        out_share = _deg_red_sharded(pp, xm, key, net)
        return F.add(out_share, mask.out_mask)

    def king_fn(shares, parties):
        # (n_present, num, K) -> (num, n_present, K)
        sh = jnp.swapaxes(shares, 0, 1)
        secrets = pp.unpack_missing_shares(sh, parties)  # (num, l, K)
        out = pp.pack(secrets, pp.rand_pads(key, (sh.shape[0],)))
        return jnp.swapaxes(out, 0, 1)  # (n, num, K)

    out_share = net.round(xm, king_fn, channel)
    return F.add(out_share, mask.out_mask)


@dataclass
class DegRedMask:
    """in_mask/out_mask: (n, num, K), leading party axis
    (deg_red.rs:14-77)."""

    in_mask: jnp.ndarray
    out_mask: jnp.ndarray

    @staticmethod
    def sample(pp: PackedSharingParams, num: int, key):
        F = pp.F
        k_vals, k_in, k_out = jax.random.split(key, 3)
        vals = F.rand(k_vals, (num, pp.l))
        in_shares = pp.pack(vals, pp.rand_pads(k_in, (num,)))
        out_shares = pp.pack(F.neg(vals), pp.rand_pads(k_out, (num,)))
        return DegRedMask(
            in_mask=jnp.swapaxes(in_shares, 0, 1),
            out_mask=jnp.swapaxes(out_shares, 0, 1),
        )

    @staticmethod
    def zero(pp: PackedSharingParams, num: int):
        z = pp.F.zeros((pp.n, num))
        return DegRedMask(in_mask=z, out_mask=z)

    def party(self, i):
        return DegRedMask(in_mask=self.in_mask[i], out_mask=self.out_mask[i])
