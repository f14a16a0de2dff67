"""Distributed two-stage FFT over packed shares.

Reference: dist-primitives/src/dfft/mod.rs.  A length-m vector is shared
as m/l packed sharings per party in the "rearranged" layout (bit-reverse
the vector, then chunk i = elements i, i+m/l, ...; dfft/mod.rs:322-335 +
qap.rs:100-113).  Because shares are linear in the secrets:

* FFT1 (dfft/mod.rs:178-208): the first log(m)-log(l) butterfly stages
  only combine slots *within* a party's local vector, so every party
  runs them share-locally.  Here that is a batched stage loop whose
  butterflies are fused limb kernels (and under SpmdNet every party is
  a TPU device running the same program).

* FFT2 (dfft/mod.rs:210-237): the final log(l) stages mix across the
  packed axis, so shares travel to the king who unpacks, finishes the
  butterflies, optionally coset-scales (distribute_powers), optionally
  bit-reverse-rearranges + repacks so the *next* transform needs no
  extra round (the `rearrange` fusion, dfft/mod.rs:283-303), and
  re-shares.

Masking (FftMask, dfft/mod.rs:16-95): parties add in_mask before the
gather and out_mask (= -transformed mask, re-packed) after the scatter,
so the king only ever sees uniformly-masked values.  Unlike the
reference (which repacks with ark_std::test_rng(), dfft/mod.rs:251) all
randomness here comes from explicit JAX PRNG keys.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..fields.jfield import Field, field
from ..fields.spec import FieldSpec
from ..ntt.domain import Radix2Domain
from ..pss.pss import PackedSharingParams
from ..utils.pack import rearrange_perm, stride_chunks


@functools.cache
def _stage_factors(spec: FieldSpec, m: int, l: int, gen: int, stage_set: str):
    """Per-stage butterfly factor tables (host-precomputed, device consts).

    fft1 stages: i = log(m) .. log(l)+1 ; fft2 stages: i = log(l) .. 1.
    Factor for (stage i, index k) is gen^(2^(i-1) * (k+1))
    (dfft/mod.rs:196-206, :222-232)."""
    F = field(spec)
    p = spec.p
    log_m = m.bit_length() - 1
    log_l = l.bit_length() - 1
    stages = (
        range(log_m, log_l, -1) if stage_set == "fft1" else range(log_l, 0, -1)
    )
    tables = {}
    for i in stages:
        ps = m >> i
        stride = pow(gen, 1 << (i - 1), p)
        vals = [0] * ps
        f = stride
        for k in range(ps):
            vals[k] = f
            f = (f * stride) % p
        tables[i] = jnp.asarray(F.encode(vals))
    return tables


def fft1_local(pp: PackedSharingParams, px, gen: int):
    """Share-local butterfly stages (fft1_in_place, dfft/mod.rs:178-208).

    px: (..., m/l, K); gen: the full-domain generator (int)."""
    F = pp.F
    mbyl = px.shape[-2]
    m = mbyl * pp.l
    k = F.k
    tables = _stage_factors(pp.spec, m, pp.l, gen, "fft1")
    log_m = m.bit_length() - 1
    log_l = pp.l.bit_length() - 1
    lead = px.shape[:-2]
    for i in range(log_m, log_l, -1):
        ps = m >> i
        rows = (1 << i) // pp.l
        v = px.reshape(lead + (rows // 2, 2, ps, k))
        x = v[..., 0, :, :]
        y = F.mul(v[..., 1, :, :], tables[i])
        px = jnp.stack([F.add(x, y), F.sub(x, y)], axis=-3).reshape(
            lead + (mbyl, k)
        )
    return px


def fft2_king(pp: PackedSharingParams, s1, gen: int):
    """King-side final stages (fft2_in_place, dfft/mod.rs:210-237).

    s1: (..., m, K) unpacked values in chunk-interleaved order."""
    F = pp.F
    m = s1.shape[-2]
    k = F.k
    tables = _stage_factors(pp.spec, m, pp.l, gen, "fft2")
    log_l = pp.l.bit_length() - 1
    lead = s1.shape[:-2]
    for i in range(log_l, 0, -1):
        ps = m >> i
        half = 1 << (i - 1)
        v = s1.reshape(lead + (ps, half, 2, k))
        x = v[..., 0, :]
        y = F.mul(v[..., 1, :], tables[i][..., None, :])
        s1 = jnp.concatenate(
            [F.add(x, y), F.sub(x, y)], axis=-3
        ).reshape(lead + (m, k))
    return jnp.roll(s1, 1, axis=-2)


def _distribute_powers(F: Field, x, g: int, m: int):
    p = F.spec.p
    pows = [1] * m
    for i in range(1, m):
        pows[i] = (pows[i - 1] * g) % p
    return F.mul(x, jnp.asarray(F.encode(pows)))


@jax.tree_util.register_static
@dataclass(frozen=True, eq=False)
class _FftKing:
    """The king computation for one (pp, m, gen, g, rearrange) config."""

    pp: PackedSharingParams
    m: int
    gen: int
    g: int
    rearrange: bool

    def __call__(self, shares_and_key, parties):
        shares, key = shares_and_key
        pp = self.pp
        F = pp.F
        mbyl = self.m // pp.l
        # (n_present, m/l, K) -> chunk-major (m/l, n_present, K)
        sh = jnp.swapaxes(shares, 0, 1)
        secrets = pp.unpack_missing_shares(sh, parties)  # (m/l, l, K)
        s1 = secrets.reshape(self.m, F.k)  # s1[i*l + j] = secret j of chunk i
        s1 = fft2_king(pp, s1, self.gen)
        if self.g != 1:
            s1 = _distribute_powers(F, s1, self.g, self.m)
        if self.rearrange:
            s1 = jnp.take(s1, jnp.asarray(rearrange_perm(self.m)), axis=-2)
            chunks = stride_chunks(s1, pp.l)  # (m/l, l, K)
        else:
            chunks = s1.reshape(mbyl, pp.l, F.k)
        out = pp.pack(chunks, pp.rand_pads(key, (mbyl,)))  # (m/l, n, K)
        return jnp.swapaxes(out, 0, 1)  # (n, m/l, K)


def _fft2_with_rearrange(pp, px, mask, rearrange, g, gen, net, key, channel):
    """dfft/mod.rs:240-320: mask -> gather -> king -> scatter -> unmask."""
    F = pp.F
    m = px.shape[-2] * pp.l
    out = F.add(px, mask.in_mask)
    king = _FftKing(pp, m, gen, g, rearrange)
    king_fn = lambda xs, parties: king((xs, key), parties)
    out_share = net.round(out, king_fn, channel)
    return F.add(out_share, mask.out_mask)


def d_fft(pp, pcoeff_share, mask, rearrange, dom: Radix2Domain, net, key, channel=0):
    """Packed shares of (rearranged) coefficients -> packed shares of
    evaluations (d_fft, dfft/mod.rs:99-134)."""
    assert pcoeff_share.shape[-2] * pp.l == dom.n
    with jax.named_scope("d_fft.fft1"):
        px = fft1_local(pp, pcoeff_share, dom.group_gen)
    return _fft2_with_rearrange(
        pp, px, mask, rearrange, 1, dom.group_gen, net, key, channel
    )


def d_ifft(pp, peval_share, mask, rearrange, dom: Radix2Domain, g: int, net, key, channel=0):
    """Packed shares of (rearranged) evaluations -> packed shares of
    coefficients, optionally scaled by powers of g (d_ifft,
    dfft/mod.rs:137-175)."""
    assert peval_share.shape[-2] * pp.l == dom.n
    px = pp.F.muli(peval_share, dom.size_inv)
    px = fft1_local(pp, px, dom.group_gen_inv)
    return _fft2_with_rearrange(
        pp, px, mask, rearrange, g, dom.group_gen_inv, net, key, channel
    )


@dataclass
class FftMask:
    """Per-party additive masks for one d_fft/d_ifft call
    (dfft/mod.rs:16-95).  in_mask/out_mask: (n, m/l, K) — leading party
    axis (slice one row per device under SpmdNet)."""

    in_mask: jnp.ndarray
    out_mask: jnp.ndarray

    @staticmethod
    def sample(rearrange: bool, g: int, gen: int, m: int, pp: PackedSharingParams, key):
        """Run the fft2 pipeline on fresh randomness (dfft/mod.rs:30-85)."""
        F = pp.F
        k_vals, k_in, k_out = jax.random.split(key, 3)
        vals = F.rand(k_vals, (m,))
        mbyl = m // pp.l
        in_chunks = vals.reshape(mbyl, pp.l, F.k)
        in_shares = pp.pack(in_chunks, pp.rand_pads(k_in, (mbyl,)))
        s = fft2_king(pp, vals, gen)
        if g != 1:
            s = _distribute_powers(F, s, g, m)
        s = F.neg(s)
        if rearrange:
            s = jnp.take(s, jnp.asarray(rearrange_perm(m)), axis=-2)
            out_chunks = stride_chunks(s, pp.l)
        else:
            out_chunks = s.reshape(mbyl, pp.l, F.k)
        out_shares = pp.pack(out_chunks, pp.rand_pads(k_out, (mbyl,)))
        return FftMask(
            in_mask=jnp.swapaxes(in_shares, 0, 1),
            out_mask=jnp.swapaxes(out_shares, 0, 1),
        )

    @staticmethod
    def zero(pp: PackedSharingParams, m: int):
        """Insecure all-zero mask (debugging only; dfft/mod.rs:87-95)."""
        z = pp.F.zeros((pp.n, m // pp.l))
        return FftMask(in_mask=z, out_mask=z)

    def party(self, i):
        return FftMask(in_mask=self.in_mask[i], out_mask=self.out_mask[i])
