"""Distributed Groth16 proof-element builders (reference: groth16/src/
prove.rs) and the per-party prove driver (the dsha256 protocol,
groth16/examples/sha256.rs:32-129).

Shares of r/s and of the witness combine with clear CRS elements
through linear point ops; the two MSMs of C run concurrently on
channels 0/1 in the reference (prove.rs:204-227) — here they are one
traced program and XLA overlaps them."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..curves.jcurve import JCurve
from ..dist.dmsm import MsmMask, d_msm
from ..pss.pss import PackedSharingParams
from .ext_wit import circom_h
from .proving_key import PackedProvingKeyShare
from .qap import PackedQAPShare


def _bcast_clear(curve: JCurve, pt, shape):
    """Replicated clear CRS point -> device point batch."""
    P = curve.encode([pt], shape=(1,))
    P = tuple(c[0] for c in P)
    return tuple(jnp.broadcast_to(c, tuple(shape) + c.shape) for c in P)


def prove_a(pp, curve, crs: PackedProvingKeyShare, a_share, r_share, msm_mask, net, channel=0):
    """A = L * N^r * AG1 * prod(S_i^a_i)   (prove.rs:11-59).

    a_share: (..., nch, K) packed witness scalars; r_share: (..., K).
    Returns per-party packed shares of A (degree t+l-1 components plus
    clear offsets)."""
    bshape = r_share.shape[:-1]
    N = _bcast_clear(curve, crs.delta_g1, bshape)
    L = _bcast_clear(curve, crs.a_query0, bshape)
    AG1 = _bcast_clear(curve, crs.alpha_g1, bshape)
    v0 = curve.scalar_mul(N, r_share)
    v1 = curve.add(L, v0)
    prod = d_msm(pp, curve, crs.s, a_share, msm_mask, net, channel)
    return curve.add(curve.add(v1, prod), AG1)


def prove_b_g1(pp, curve, crs, a_share, s_share, msm_mask, net, channel=0):
    """B in G1 (prove.rs:63-113).  (The reference early-outs if its r
    share is zero, prove.rs:96-98; r != 0 always holds for honest
    dealers so the branch is dropped here.)"""
    bshape = s_share.shape[:-1]
    K = _bcast_clear(curve, crs.delta_g1, bshape)
    Z = _bcast_clear(curve, crs.b_g1_query0, bshape)
    BG1 = _bcast_clear(curve, crs.beta_g1, bshape)
    v1 = curve.add(Z, curve.scalar_mul(K, s_share))
    prod = d_msm(pp, curve, crs.h, a_share, msm_mask, net, channel)
    return curve.add(curve.add(v1, prod), BG1)


def prove_b_g2(pp, curve2, crs, a_share, s_share, msm_mask, net, channel=0):
    """B in G2 (prove.rs:117-161)."""
    bshape = s_share.shape[:-1]
    K = _bcast_clear(curve2, crs.delta_g2, bshape)
    Z = _bcast_clear(curve2, crs.b_g2_query0, bshape)
    BG2 = _bcast_clear(curve2, crs.beta_g2, bshape)
    v1 = curve2.add(Z, curve2.scalar_mul(K, s_share))
    prod = d_msm(pp, curve2, crs.v, a_share, msm_mask, net, channel)
    return curve2.add(curve2.add(v1, prod), BG2)


def prove_c(pp, curve, crs, A, B1, r_share, s_share, ax_share, h_share, msm_masks, net):
    """C = W^ax * U^h * A^s * B1^r * delta^(-rs)   (prove.rs:165-238).

    A, B1: packed shares of the proof elements (points); the products
    with r/s shares double the sharing degree — the dealer unpacks the
    final proof with unpack2 (sha256.rs:375-377)."""
    F = pp.F
    w = d_msm(pp, curve, crs.w, ax_share, msm_masks[0], net, 0)
    u = d_msm(pp, curve, crs.u, h_share, msm_masks[1], net, 1)
    bshape = r_share.shape[:-1]
    M = _bcast_clear(curve, crs.delta_g1, bshape)
    rs = F.mul(r_share, s_share)
    r_s_delta = curve.scalar_mul(M, rs)
    s_g_a = curve.scalar_mul(A, s_share)
    r_g1_b = curve.scalar_mul(B1, r_share)
    C = curve.add(s_g_a, r_g1_b)
    C = curve.add(C, curve.neg(r_s_delta))
    C = curve.add(C, w)
    return curve.add(C, u)


@dataclass
class ProveMasks:
    """All masks one distributed prove consumes (dealer-sampled;
    sha256.rs:226-291)."""

    fft_masks: list
    degred_mask: object
    g1_msm_masks: list  # 4
    g2_msm_mask: object

    @staticmethod
    def sample(pp: PackedSharingParams, g1: JCurve, g2: JCurve, m: int, key):
        from .ext_wit import circom_masks

        ks = jax.random.split(key, 6)
        fft_masks, degred_mask = circom_masks(pp, m, ks[0])
        g1_msm = [MsmMask.sample(pp, g1, ks[1 + i]) for i in range(4)]
        g2_msm = MsmMask.sample(pp, g2, ks[5])
        return ProveMasks(fft_masks, degred_mask, g1_msm, g2_msm)

    def party(self, i):
        return ProveMasks(
            fft_masks=[m.party(i) for m in self.fft_masks],
            degred_mask=self.degred_mask.party(i),
            g1_msm_masks=[m.party(i) for m in self.g1_msm_masks],
            g2_msm_mask=self.g2_msm_mask.party(i),
        )


def d_prove(
    pp: PackedSharingParams,
    g1: JCurve,
    g2: JCurve,
    crs: PackedProvingKeyShare,
    qap_share: PackedQAPShare,
    a_share,
    ax_share,
    r_share,
    s_share,
    masks: ProveMasks,
    net,
    key,
):
    """The full per-party prove protocol (dsha256, sha256.rs:32-129):
    ext_wit -> A -> B(G1) -> B(G2) -> C.  Returns packed shares of
    (pi_a, pi_b_g2, pi_c); the dealer unpack2s them."""
    from ..utils.trace import span

    k_h, _ = jax.random.split(key)
    h_share = None
    with span("prove.ext_wit", sync=lambda: h_share):
        h_share = circom_h(pp, qap_share, masks.fft_masks, masks.degred_mask, net, k_h)
    pi_a = None
    with span("prove.A", sync=lambda: pi_a):
        pi_a = prove_a(pp, g1, crs, a_share, r_share, masks.g1_msm_masks[0], net, 0)
    pi_b1 = None
    with span("prove.B_g1", sync=lambda: pi_b1):
        pi_b1 = prove_b_g1(pp, g1, crs, a_share, s_share, masks.g1_msm_masks[1], net, 0)
    pi_b2 = None
    with span("prove.B_g2", sync=lambda: pi_b2):
        pi_b2 = prove_b_g2(pp, g2, crs, a_share, s_share, masks.g2_msm_mask, net, 0)
    pi_c = None
    with span("prove.C", sync=lambda: pi_c):
        pi_c = prove_c(
            pp, g1, crs, pi_a, pi_b1, r_share, s_share, ax_share, h_share,
            masks.g1_msm_masks[2:4], net,
        )
    return pi_a, pi_b2, pi_c


def pack_witness(pp: PackedSharingParams, values: list[int], key):
    """pack_from_witness analog (sha256.rs:131-156): chunk by l with
    zero tail padding, pack, return party-major (n, nch, K)."""
    F = pp.F
    import numpy as np

    l = pp.l
    nch = -(-len(values) // l)
    padded = list(values) + [0] * (nch * l - len(values))
    chunks = F.encode(np.asarray(padded, dtype=object).reshape(nch, l))
    shares = pp.pack(chunks, pp.rand_pads(key, (nch,)))
    return jnp.swapaxes(shares, 0, 1)


def pack_scalar_repeated(pp: PackedSharingParams, x: int, key):
    """Packed sharing of one scalar repeated l times (the r/s sharing;
    sha256.rs:203-204 packs vec![r; n]).  Returns (n, K)."""
    F = pp.F
    sec = F.encode([[x] * pp.l])
    shares = pp.pack(sec, pp.rand_pads(key, (1,)))  # (1, n, K)
    return shares[0]
