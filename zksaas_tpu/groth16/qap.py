"""QAP construction + packed sharing (reference: groth16/src/qap.rs).

qap_evals (in local.py) mirrors qap() at qap.rs:42-89 (per-constraint
<A_i,z>, <B_i,z>, c = a*b, instance rows appended).  qap_pack mirrors
QAP::pss (qap.rs:91-135): bit-reverse-rearrange each vector, then
stride-interleaved chunks packed so the first d_ifft of the extended-
witness pipeline can start without a permutation round."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..circom.r1cs import R1CS
from ..ntt.domain import Radix2Domain, domain
from ..pss.pss import PackedSharingParams
from ..utils.pack import rearrange_perm, stride_chunks
from .local import qap_evals


@dataclass
class PackedQAPShare:
    """Party-major packed QAP shares: a, b, c are (n, m/l, K)."""

    num_inputs: int
    num_constraints: int
    a: jnp.ndarray
    b: jnp.ndarray
    c: jnp.ndarray
    dom: Radix2Domain

    def party(self, i):
        return PackedQAPShare(
            self.num_inputs, self.num_constraints, self.a[i], self.b[i], self.c[i], self.dom
        )


def qap_pack(pp: PackedSharingParams, r1cs: R1CS, z: list[int], key) -> PackedQAPShare:
    """Dealer-side packing of the QAP vectors (qap.rs:91-135)."""
    a, b, c, m = qap_evals(r1cs, z)
    F = pp.F
    dom = domain(pp.spec, m)
    perm = np.asarray(rearrange_perm(m))
    keys = jax.random.split(key, 3)
    out = []
    for vec, k in zip((a, b, c), keys):
        x = jnp.asarray(F.encode(vec))[perm]
        chunks = stride_chunks(x, pp.l)  # (m/l, l, K)
        shares = pp.pack(chunks, pp.rand_pads(k, (m // pp.l,)))
        out.append(jnp.swapaxes(shares, 0, 1))  # (n, m/l, K)
    return PackedQAPShare(
        num_inputs=r1cs.num_instance,
        num_constraints=r1cs.num_constraints,
        a=out[0],
        b=out[1],
        c=out[2],
        dom=dom,
    )
