"""Distributed partial products (dist-primitives/src/dpp/mod.rs).

Given packed shares of numerators and denominators, computes shares of
the running products num_1/den_1, (num_1 num_2)/(den_1 den_2), ... —
the permutation-argument building block.  One king round: unpack,
batch-invert denominators, prefix-multiply, repack (dpp/mod.rs:15-87),
then a deg_red.  The king-side sequential prefix loop
(dpp/mod.rs:62-65) becomes a parallel associative_scan here.

Blinding: the reference ships a dummy s = 1 (dpp/mod.rs:24-26, a noted
gap), and its single-scalar scheme cannot be fixed by substituting a
real s — blinding num AND den by the same s cancels inside the ratio,
so the king still learns every partial product, and the trailing
multiply by s^-1 would then corrupt the output.  The real scheme
(zkSaaS paper's preprocessed randomness) telescopes a random vector
r_1..r_m (r_0 = 1): parties blind num_i by r_{i-1} and den_i by r_i,
the king sees y_i = r_{i-1} x_i / r_i and prefix products
z_i = (x_1...x_i) / r_i — each uniformly random — and parties recover
the true products as z_i * r_i (then deg_red drops the doubled
degree).  PpBlind below is the dealer-side sampling of that vector."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..pss.pss import PackedSharingParams
from .deg_red import deg_red


@dataclass
class PpBlind:
    """Packed shares of the telescoping blinding vector: `num` holds
    shares of (r_0=1, r_1, ..., r_{m-1}) — multiplies the numerators —
    and `den` holds shares of (r_1, ..., r_m), which both multiplies
    the denominators and unblinds the king's output (z_i * r_i).
    Leading party axis, like the masks (deg_red.rs:14-77 shape)."""

    num: jnp.ndarray  # (n, nchunks, K) shares of r_{i-1}
    den: jnp.ndarray  # (n, nchunks, K) shares of r_i

    @staticmethod
    def sample(pp: PackedSharingParams, nchunks: int, key):
        F = pp.F
        m = nchunks * pp.l
        k_r, k_a, k_b = jax.random.split(key, 3)
        r = F.rand(k_r, (m,))  # nonzero w.p. 1 - m/p
        prev = jnp.concatenate([F.ones((1,)), r[:-1]], axis=0)
        a = pp.pack(prev.reshape(nchunks, pp.l, F.k), pp.rand_pads(k_a, (nchunks,)))
        b = pp.pack(r.reshape(nchunks, pp.l, F.k), pp.rand_pads(k_b, (nchunks,)))
        return PpBlind(num=jnp.swapaxes(a, 0, 1), den=jnp.swapaxes(b, 0, 1))

    def party(self, i):
        return PpBlind(num=self.num[i], den=self.den[i])


def d_pp(pp: PackedSharingParams, num_share, den_share, degred_mask, net, key, channel=0, blind: PpBlind | None = None):
    """num_share/den_share: (..., num, K) packed shares.  Returns packed
    shares of partial products of num_i/den_i.  With `blind` the king
    only ever sees uniformly random values (see module docstring);
    blinded inputs are degree-doubled share products, which the king's
    unpack2-aware reconstruction already handles."""
    F = pp.F
    key, key_dr = jax.random.split(key)
    if blind is not None:
        num_share = F.mul(num_share, blind.num)
        den_share = F.mul(den_share, blind.den)
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
    if blind is not None:
        pp_rand = F.mul(pp_rand, blind.den)
    return deg_red(pp, pp_rand, degred_mask, net, key_dr, channel)
