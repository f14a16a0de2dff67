"""Share-vector packing layouts.

The reference shuttles Vec<Vec<F>> between "chunk-major" and
"party-major" with pack_vec/transpose (dist-primitives/src/utils/
pack.rs:8-35); with arrays those are just reshapes/axis-moves, so this
module only hosts the *layout* helpers:

  chunk_pack      pack_vec analog: (m,) -> (n parties, m/l chunks)
  stride_chunks   the rearranged layout used by d_fft inputs
                  (qap.rs:100-113, dfft/mod.rs:284-303): bit-reverse the
                  vector, then chunk i holds elements i, i+m/l, ...
  rearrange_perm  fft_in_place_rearrange (dfft/mod.rs:322-335) as an
                  index permutation
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ntt.domain import bitrev_perm


def rearrange_perm(m: int) -> np.ndarray:
    """Index permutation equal to fft_in_place_rearrange (bit-reversal)."""
    return bitrev_perm(m)


def stride_chunks(x, l: int):
    """(..., m, K) rearranged vector -> (..., m/l, l, K) where chunk i =
    elements [i, i + m/l, i + 2m/l, ...] (skip(i).step_by(m/l))."""
    m = x.shape[-2]
    k = x.shape[-1]
    lead = x.shape[:-2]
    # element (i + j*(m/l)) -> chunk i, slot j : reshape (l, m/l) then swap
    return jnp.swapaxes(x.reshape(lead + (l, m // l, k)), -3, -2)


def unstride_chunks(x):
    """Inverse of stride_chunks: (..., m/l, l, K) -> (..., m, K)."""
    lead = x.shape[:-3]
    mbyl, l, k = x.shape[-3:]
    return jnp.swapaxes(x, -3, -2).reshape(lead + (mbyl * l, k))


def chunk_pack(pp, x, key):
    """pack_vec analog for field vectors: x (m, K) in natural order ->
    shares (n, m/l, K) (party-major, chunk j = x[j*l:(j+1)*l])."""
    m = x.shape[0]
    assert m % pp.l == 0
    chunks = x.reshape(m // pp.l, pp.l, x.shape[-1])
    rand = pp.rand_pads(key, (m // pp.l,))
    shares = pp.pack(chunks, rand)  # (m/l, n, K)
    return jnp.swapaxes(shares, 0, 1)


def chunk_pack_g(pp, curve, P, key=None):
    """pack_vec analog for point vectors: P points (m,) -> (n, m/l).

    Uses det_pack (the reference's choice for public CRS data); pass a
    key for randomized packing of secret points."""
    X, Y, Z = P
    m = X.shape[0]
    ncoord = len(curve.R.coord_shape)
    chunks = tuple(
        c.reshape((m // pp.l, pp.l) + c.shape[1:]) for c in (X, Y, Z)
    )
    if key is None:
        shares = pp.det_pack_g(curve, chunks)
    else:
        import jax

        scal = pp.F.rand(key, (m // pp.l, pp.t))
        gen = curve.encode([curve.ref.gen], shape=(1, 1))
        genb = tuple(
            jnp.broadcast_to(c, (m // pp.l, pp.t) + c.shape[2:]) for c in gen
        )
        rand_pts = curve.scalar_mul(genb, scal)
        shares = pp.pack_g(curve, chunks, rand_pts)
    return tuple(jnp.swapaxes(c, 0, 1) for c in shares)
