"""Distributed partial products (dist-primitives/src/dpp/mod.rs).

Given packed shares of numerators and denominators, computes shares of
the running products num_1/den_1, (num_1 num_2)/(den_1 den_2), ... —
the permutation-argument building block.  One king round: unpack,
batch-invert denominators, prefix-multiply, repack (dpp/mod.rs:15-87),
then a deg_red.  The king-side sequential prefix loop
(dpp/mod.rs:62-65) becomes a parallel associative_scan here.

The reference blinds with a dummy s = 1 (dpp/mod.rs:24-26, a noted
gap); we accept an optional packed share of a real blinding s and its
inverse."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..pss.pss import PackedSharingParams
from .deg_red import deg_red


def d_pp(pp: PackedSharingParams, num_share, den_share, degred_mask, net, key, channel=0, s_share=None, s_inv_share=None):
    """num_share/den_share: (..., num, K) packed shares.  Returns packed
    shares of partial products of num_i/den_i."""
    F = pp.F
    key, key_dr = jax.random.split(key)
    if s_share is not None:
        num_share = F.mul(num_share, s_share)
        den_share = F.mul(den_share, s_share)
    numden = jnp.concatenate([num_share, den_share], axis=-2)

    def king_fn(shares, parties):
        sh = jnp.swapaxes(shares, 0, 1)  # (2*num, n_present, K)
        secrets = pp.unpack_missing_shares(sh, parties)  # (2*num, l, K)
        flat = secrets.reshape(-1, F.k)  # length 2*num*l, chunk-major
        half = flat.shape[0] // 2
        nums, dens = flat[:half], flat[half:]
        ratios = F.mul(nums, F.batch_inv(dens, axis=0))
        prods = jax.lax.associative_scan(F.mul, ratios, axis=0)
        chunks = prods.reshape(-1, pp.l, F.k)
        out = pp.pack(chunks, pp.rand_pads(key, (chunks.shape[0],)))
        return jnp.swapaxes(out, 0, 1)  # (n, num, K)

    pp_rand = net.round(numden, king_fn, channel)
    if s_inv_share is not None:
        pp_rand = F.mul(pp_rand, s_inv_share)
    return deg_red(pp, pp_rand, degred_mask, net, key_dr, channel)
