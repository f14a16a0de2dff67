"""Extended-witness (h) computation (reference: groth16/src/ext_wit.rs).

Two variants, matching the reference exactly:

* libsnark_h (ext_wit.rs:14-102): 3 coset d_iffts || 3 coset d_ffts,
  pointwise (ab - c) * Z^-1, final coset d_ifft.  7 FftMasks.
* circom_h (ext_wit.rs:104-181): iffts scaled by the doubled-domain
  root of unity, ffts, pointwise ab - c, one deg_red.  6 FftMasks +
  1 DegRedMask.

The reference overlaps the three transforms on 3 multiplexed channels
(tokio::try_join, ext_wit.rs:62-74); the TPU-native form goes further:
a/b/c are STACKED on a batch axis and run as ONE d_ifft / ONE d_fft —
one protocol round (one all_gather or one pair of all_to_alls) moving
all three channels' bytes, and 3x-wider butterfly/mat-vec kernels.
Three sockets' worth of concurrency becomes one bigger SPMD program,
which is the shape both the VPU and the ICI want."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..dist.deg_red import DegRedMask, deg_red
from ..dist.dfft import FftMask, d_fft, d_ifft
from ..pss.pss import PackedSharingParams
from .qap import PackedQAPShare


def _stack_abc(qap_share: PackedQAPShare):
    """(..., nch, K) x3 -> (..., 3, nch, K): the batch axis sits just
    before the chunk axis so it rides through the party-axis handling
    of every net backend unchanged."""
    return jnp.stack([qap_share.a, qap_share.b, qap_share.c], axis=-3)


def _stack_masks(masks) -> FftMask:
    return FftMask(
        in_mask=jnp.stack([m.in_mask for m in masks], axis=-3),
        out_mask=jnp.stack([m.out_mask for m in masks], axis=-3),
    )


def circom_h(
    pp: PackedSharingParams,
    qap_share: PackedQAPShare,
    fft_masks,  # 6 FftMask
    degred_mask: DegRedMask,
    net,
    key,
):
    F = pp.F
    dom = qap_share.dom
    root2m = pp.spec.root_of_unity(2 * dom.n)
    ks = jax.random.split(key, 3)

    abc = _stack_abc(qap_share)
    abc = d_ifft(pp, abc, _stack_masks(fft_masks[0:3]), True, dom, root2m, net, ks[0], 0)
    abc = d_fft(pp, abc, _stack_masks(fft_masks[3:6]), False, dom, net, ks[1], 0)

    a, b, c = (
        jnp.take(abc, i, axis=-3) for i in range(3)
    )
    h_eval = F.sub(F.mul(a, b), c)
    return deg_red(pp, h_eval, degred_mask, net, ks[2], 0)


def libsnark_h(
    pp: PackedSharingParams,
    qap_share: PackedQAPShare,
    fft_masks,  # 7 FftMask
    net,
    key,
):
    F = pp.F
    dom = qap_share.dom
    g = pp.spec.generator  # coset offset
    g_inv = pow(g, -1, pp.spec.p)
    ks = jax.random.split(key, 3)

    abc = _stack_abc(qap_share)
    abc = d_ifft(pp, abc, _stack_masks(fft_masks[0:3]), True, dom, g, net, ks[0], 0)
    abc = d_fft(pp, abc, _stack_masks(fft_masks[3:6]), True, dom, net, ks[1], 0)

    z_inv = pow(dom.evaluate_vanishing_polynomial(g), -1, pp.spec.p)
    a, b, c = (jnp.take(abc, i, axis=-3) for i in range(3))
    h_eval = F.muli(F.sub(F.mul(a, b), c), z_inv)

    # coset ifft back to coefficients
    return d_ifft(pp, h_eval, fft_masks[6], False, dom, g_inv, net, ks[2], 0)


def circom_masks(pp: PackedSharingParams, m: int, key):
    """The 6 FftMasks + DegRedMask for circom_h, matching the dealer's
    mask schedule (sha256.rs:226-282)."""
    from ..ntt.domain import domain

    dom = domain(pp.spec, m)
    root2m = pp.spec.root_of_unity(2 * m)
    ks = jax.random.split(key, 7)
    fft_masks = [
        FftMask.sample(True, root2m, dom.group_gen_inv, m, pp, ks[i]) for i in range(3)
    ] + [FftMask.sample(False, 1, dom.group_gen, m, pp, ks[3 + i]) for i in range(3)]
    degred_mask = DegRedMask.sample(pp, m // pp.l, ks[6])
    return fft_masks, degred_mask


def libsnark_masks(pp: PackedSharingParams, m: int, key):
    """The 7 FftMasks for libsnark_h (ext_wit.rs:20)."""
    from ..ntt.domain import domain

    dom = domain(pp.spec, m)
    g = pp.spec.generator
    coset = dom.get_coset(g)
    ks = jax.random.split(key, 7)
    masks = [
        FftMask.sample(True, coset.offset, dom.group_gen_inv, m, pp, ks[i])
        for i in range(3)
    ]
    masks += [
        FftMask.sample(True, 1, coset.group_gen, m, pp, ks[3 + i]) for i in range(3)
    ]
    masks += [
        FftMask.sample(False, coset.offset_inv, dom.group_gen_inv, m, pp, ks[6])
    ]
    return masks
