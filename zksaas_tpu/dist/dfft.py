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
        """shares: (n_present, *B, m/l, K) — extra batch dims between the
        party and chunk axes carry independent transforms (e.g. the
        a/b/c polynomials batched into ONE round instead of the
        reference's three channels, ext_wit.rs:62-74)."""
        shares, key = shares_and_key
        pp = self.pp
        F = pp.F
        mbyl = self.m // pp.l
        lead = shares.shape[1:-2]
        # (n_present, *B, m/l, K) -> chunk-major (*B, m/l, n_present, K)
        sh = jnp.moveaxis(shares, 0, -2)
        secrets = pp.unpack_missing_shares(sh, parties)  # (*B, m/l, l, K)
        s1 = secrets.reshape(lead + (self.m, F.k))  # [i*l + j] = secret j of chunk i
        s1 = fft2_king(pp, s1, self.gen)
        if self.g != 1:
            s1 = _distribute_powers(F, s1, self.g, self.m)
        if self.rearrange:
            s1 = jnp.take(s1, jnp.asarray(rearrange_perm(self.m)), axis=-2)
            chunks = stride_chunks(s1, pp.l)  # (*B, m/l, l, K)
        else:
            chunks = s1.reshape(lead + (mbyl, pp.l, F.k))
        out = pp.pack(chunks, pp.rand_pads(key, lead + (mbyl,)))  # (*B, m/l, n, K)
        return jnp.moveaxis(out, -2, 0)  # (n, *B, m/l, K)


# ---------------------------------------------------------------------------
# Sharded-king fft2 (SPMD mesh path)
#
# The king's O(m log l) work decomposes exactly across the mesh: the
# fft2 butterfly stages only ever combine values originating from the
# SAME chunk (each stage pairs adjacent array elements, and the stage
# output permutation is pure bit bookkeeping — after all log(l) stages
# the array position of chunk c's q-th combination is q*(m/l) + c).
# So each device can unpack and transform an equal range of chunks:
#
#   all_to_all (redistribute masked shares by chunk range)
#   -> per-chunk unpack (M_unpack2 matvec)
#   -> per-chunk stage-composition matrix T[c] (host-precomputed)
#   -> the trailing roll-by-1 (one ppermute of the boundary column)
#   -> coset powers (static table slice)
#   -> re-pack in out-chunk order (static gather tables)
#   -> all_to_all (each party's fresh shares) -> static receiver perm
#
# Two all_to_alls move 1/n of the replicated-king all_gather bytes and
# the king compute runs n-way parallel — the north star's "butterfly
# stages exchanged all-to-all".  Bit-identical to the king path (same
# matrices, same pads).  Privacy unchanged: devices only see masked
# values, exactly like the king.
# ---------------------------------------------------------------------------


@functools.cache
def _fft2_chunk_mats(spec: FieldSpec, m: int, l: int, gen: int):
    """Simulate fft2_king's stage loop symbolically: returns host-int
    T of shape (m/l, l, l) with  stage_out[q*(m/l) + c] =
    sum_j T[c][q][j] * s1[c*l + j],  asserting the position structure."""
    import numpy as np

    p = spec.p
    log_l = l.bit_length() - 1
    state = [
        (g // l, tuple(1 if j == g % l else 0 for j in range(l)))
        for g in range(m)
    ]
    for i in range(log_l, 0, -1):
        ps = m >> i
        half = 1 << (i - 1)
        stride = pow(gen, 1 << (i - 1), p)
        tab = [0] * ps
        f = stride
        for a in range(ps):
            tab[a] = f
            f = (f * stride) % p
        new = [None] * m
        for a in range(ps):
            fa = tab[a]
            for h in range(half):
                cx, vx = state[a * 2 * half + 2 * h]
                cy, vy = state[a * 2 * half + 2 * h + 1]
                assert cx == cy, "fft2 stage mixed chunks"
                add = tuple((u + fa * v) % p for u, v in zip(vx, vy))
                sub = tuple((u - fa * v) % p for u, v in zip(vx, vy))
                new[a * half + h] = (cx, add)
                new[m // 2 + a * half + h] = (cx, sub)
        state = new
    T = [[None] * l for _ in range(m // l)]
    for x, (c, vec) in enumerate(state):
        q, cc = divmod(x, m // l)
        assert cc == c, "fft2 stage-out position structure violated"
        T[c][q] = vec
    return tuple(tuple(r) for r in T)


@functools.cache
def _sharded_fft_tables(m: int, l: int, n: int, rearrange: bool):
    """Static index tables for the sharded pack/scatter phase.

    Out-chunk k draws its slot-t value from stripe q'(k), column
    c'(k, t) of the stage-out array (x = q*(m/l) + c):
      rearrange: x' = bitrev_m(k + t*m/l) -> q' = rev_ll(k mod l),
                 c' = (rev_{lm-ll}(k) mod 2^{lm-2ll})*l + rev_ll(t)
      plain:     x' = k*l + t          -> q' = k >> (lm-2ll),
                 c' = (k mod 2^{lm-2ll})*l + t
    Device d owns columns [d*C, (d+1)*C) and packs the out-chunks whose
    column block falls in its range, ordered by ascending k.  Returns
    (gather_idx (n, C, l) into the flattened (l*C,) local stripe array,
     k_of (n, C) out-chunk ids, recv_perm (m/l,) receiver ordering)."""
    import numpy as np

    mbyl = m // l
    C = mbyl // n
    lm = m.bit_length() - 1
    ll = l.bit_length() - 1

    def rev(x, nb):
        r = 0
        for _ in range(nb):
            r = (r << 1) | (x & 1)
            x >>= 1
        return r

    per_dev = [[] for _ in range(n)]  # list of k, ascending
    qp = np.zeros(mbyl, dtype=np.int64)
    cp = np.zeros((mbyl, l), dtype=np.int64)
    for k in range(mbyl):
        if rearrange:
            rk = rev(k, lm - ll)
            q = rev(k & (l - 1), ll)
            base = (rk % (1 << (lm - 2 * ll))) * l
            cols = [base + rev(t, ll) for t in range(l)]
        else:
            q = k >> (lm - 2 * ll)
            base = (k % (1 << (lm - 2 * ll))) * l
            cols = [base + t for t in range(l)]
        qp[k] = q
        cp[k] = cols
        per_dev[cols[0] // C].append(k)

    gather_idx = np.zeros((n, C, l), dtype=np.int32)
    k_of = np.zeros((n, C), dtype=np.int32)
    recv_perm = np.zeros(mbyl, dtype=np.int32)
    for d in range(n):
        assert len(per_dev[d]) == C, "unbalanced out-chunk assignment"
        for u, k in enumerate(per_dev[d]):
            k_of[d, u] = k
            recv_perm[k] = d * C + u
            for t in range(l):
                # flattened (l, C) local stripe array index
                gather_idx[d, u, t] = qp[k] * C + (cp[k, t] - d * C)
    return gather_idx, k_of, recv_perm


@functools.cache
def _powers_table(spec: FieldSpec, g: int, m: int):
    """NUMPY (host) table — jnp conversion happens at the call site so
    no traced value is ever cached (shard_map wraps even asarray)."""
    import numpy as np

    F = field(spec)
    p = spec.p
    pows = [1] * m
    for i in range(1, m):
        pows[i] = (pows[i - 1] * g) % p
    return np.asarray(F.encode(pows))


def _fft2_sharded(pp, xm, rearrange, g, gen, net, key):
    """xm: (*B, m/l, K) THIS party's masked post-fft1 shares (inside
    shard_map over net.axis); leading batch dims carry independent
    transforms (the batched a/b/c channels).  Returns this party's
    fresh shares, same shape."""
    F = pp.F
    n = pp.n
    mbyl = xm.shape[-2]
    m = mbyl * pp.l
    l = pp.l
    C = mbyl // n
    lead = xm.shape[:-2]
    nb = len(lead)
    me = jax.lax.axis_index(net.axis)

    # 1. redistribute: my shares of chunk-range e -> device e
    blocks = xm.reshape(lead + (n, C, F.k))
    recv = jax.lax.all_to_all(blocks, net.axis, split_axis=nb, concat_axis=nb)
    sh = jnp.swapaxes(recv, -3, -2)  # (*B, C, n, K): all shares of MY chunks
    secrets = pp.unpack2(sh)  # (*B, C, l, K)

    # 2. per-chunk stage-composition matrix
    Tall = jnp.asarray(_fft2_mats_enc(pp.spec, m, l, gen))  # (m/l, l, l, K)
    Tmine = jax.lax.dynamic_slice_in_dim(Tall, me * C, C, axis=0)
    prod = F.mul(Tmine, secrets[..., None, :, :])  # (*B, C, l, l, K)
    vals = F.sum(prod, axis=-1)  # (*B, C, l, K): [c, q] = stage-out at q*(m/l)+me*C+c
    S = jnp.swapaxes(vals, -3, -2)  # (*B, l, C, K) stripe-major

    # 3. roll by 1 in x order: each column shifts right; column 0 takes
    # the previous device's last column (stripe-shifted on device 0,
    # where the stripe index decrements across the wrap)
    last_col = S[..., -1, :]  # (*B, l, K)
    prev_last = jax.lax.ppermute(
        last_col, net.axis, [(i, (i + 1) % n) for i in range(n)]
    )
    first_col = jnp.where(me == 0, jnp.roll(prev_last, 1, axis=-2), prev_last)
    S = jnp.concatenate([first_col[..., None, :], S[..., :-1, :]], axis=-2)

    # 4. coset powers at global position x = q*(m/l) + me*C + c
    if g != 1:
        P = jnp.asarray(_powers_table(pp.spec, g, m).reshape(l, mbyl, F.k))
        Pm = jax.lax.dynamic_slice_in_dim(P, me * C, C, axis=1)
        S = F.mul(S, Pm)

    # 5. pack my out-chunks (static gather tables) with the king's pads
    gi, ko, rp = _sharded_fft_tables(m, l, n, rearrange)
    gi_me = jnp.take(jnp.asarray(gi), me, axis=0)  # (C, l)
    ko_me = jnp.take(jnp.asarray(ko), me, axis=0)  # (C,)
    flat = S.reshape(lead + (l * C, F.k))
    chunks = jnp.take(flat, gi_me.reshape(-1), axis=-2).reshape(lead + (C, l, F.k))
    pads = pp.rand_pads(key, lead + (mbyl,))
    my_pads = jnp.take(pads, ko_me, axis=-3)
    out = pp.pack(chunks, my_pads)  # (*B, C, n, K)

    # 6. scatter + static receiver reorder to canonical out-chunk order
    back = jax.lax.all_to_all(out, net.axis, split_axis=nb + 1, concat_axis=nb)
    return jnp.take(
        back.reshape(lead + (mbyl, F.k)), jnp.asarray(rp), axis=-2
    )


@functools.cache
def _fft2_mats_enc(spec: FieldSpec, m: int, l: int, gen: int):
    F = field(spec)
    T = _fft2_chunk_mats(spec, m, l, gen)
    import numpy as np

    flat = [T[c][q][j] for c in range(m // l) for q in range(l) for j in range(l)]
    # NUMPY result: a traced jnp value here (even plain asarray under
    # shard_map) would cache a tracer from whichever transformation
    # first populated the cache
    return np.asarray(F.encode(flat)).reshape(m // l, l, l, F.k)


def _fft2_with_rearrange(pp, px, mask, rearrange, g, gen, net, key, channel):
    """dfft/mod.rs:240-320: mask -> gather -> king -> scatter -> unmask."""
    F = pp.F
    m = px.shape[-2] * pp.l
    out = F.add(px, mask.in_mask)
    mbyl = m // pp.l
    # under SpmdNet per-device data never carries a party axis, so any
    # leading dims are independent-transform batches (handled by the
    # sharded path directly)
    if (
        getattr(net, "axis", None) is not None
        and mbyl % pp.n == 0
        and (mbyl // pp.n) % pp.l == 0
        and m >= pp.l * pp.l
    ):
        out_share = _fft2_sharded(pp, out, rearrange, g, gen, net, key)
        return F.add(out_share, mask.out_mask)
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
