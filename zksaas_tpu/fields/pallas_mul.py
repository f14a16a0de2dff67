"""Pallas TPU kernel for the Montgomery multiply.

One fused VMEM kernel per batch tile replaces the ~170-op jnp limb
graph: limbs live in sublanes ((K, TILE) layout inside the kernel,
batch across lanes), the CIOS interleaved reduction runs as in-place
row updates on a VMEM scratch accumulator, and carries ripple on
(TILE,)-wide rows.  This is what makes large protocol graphs
compile-tractable (a Jacobian point add becomes ~40 kernel calls
instead of ~7k HLO ops) and keeps the VPU lanes full.

Used automatically by Field.mul on TPU backends; the pure-jnp path
remains for CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .spec import LIMB_BITS, LIMB_MASK, FieldSpec

TILE = 256


@functools.cache
def _kernel_for(spec: FieldSpec):
    K = spec.nlimbs
    N = np.array(
        [(spec.p >> (LIMB_BITS * i)) & LIMB_MASK for i in range(K)], dtype=np.uint32
    )
    Ncol = N[:, None]  # (K, 1)
    n0inv = np.uint32(spec.n0inv)
    mask = np.uint32(LIMB_MASK)

    def kernel(a_ref, b_ref, o_ref, acc_ref):
        a = a_ref[:].T  # (K, TILE)
        b = b_ref[:].T
        acc_ref[:] = jnp.zeros_like(acc_ref)
        # schoolbook product, lo/hi split accumulation
        for i in range(K):
            p_ = a[i : i + 1, :] * b  # (K, TILE)
            acc_ref[i : i + K, :] += p_ & mask
            acc_ref[i + 1 : i + K + 1, :] += p_ >> LIMB_BITS
        # interleaved Montgomery reduction
        for i in range(K):
            m = (acc_ref[i, :] * n0inv) & mask  # (TILE,)
            # scalar-constant limb products (Mosaic kernels cannot
            # capture array constants)
            p_ = jnp.stack([m * np.uint32(N[j]) for j in range(K)])  # (K, TILE)
            acc_ref[i : i + K, :] += p_ & mask
            acc_ref[i + 1 : i + K + 1, :] += p_ >> LIMB_BITS
            acc_ref[i + 1, :] += acc_ref[i, :] >> LIMB_BITS
        # final carry propagation of the high half
        carry = jnp.zeros((TILE,), jnp.uint32)
        rows = []
        for i in range(K):
            t = acc_ref[K + i, :] + carry
            rows.append(t & mask)
            carry = t >> LIMB_BITS
        top = carry + acc_ref[2 * K, :]
        res = jnp.stack(rows)  # (K, TILE)
        # conditional subtract p
        borrow = jnp.zeros((TILE,), jnp.uint32)
        subrows = []
        for i in range(K):
            t = (res[i] - N[i] - borrow) & mask
            borrow = (res[i] < N[i] + borrow).astype(jnp.uint32)
            subrows.append(t)
        sub = jnp.stack(subrows)
        ge = jnp.logical_or(top > 0, borrow == 0)
        out = jnp.where(ge[None, :], sub, res)
        o_ref[:] = out.T

    @jax.jit
    def montmul(a, b):
        """a, b: (B, K) uint32, B a multiple of TILE."""
        B = a.shape[0]
        grid = B // TILE
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((TILE, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (TILE, K), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B, K), jnp.uint32),
            scratch_shapes=[pltpu.VMEM((2 * K + 1, TILE), jnp.uint32)],
        )(a, b)

    return montmul


def montmul_pallas(spec: FieldSpec, a, b):
    """Batched Montgomery product via the Pallas kernel.  a, b:
    broadcast-compatible (..., K) uint32 arrays."""
    K = spec.nlimbs
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape).reshape(-1, K)
    b = jnp.broadcast_to(b, shape).reshape(-1, K)
    B = a.shape[0]
    Bpad = -(-B // TILE) * TILE
    if Bpad != B:
        pad = [(0, Bpad - B), (0, 0)]
        a = jnp.pad(a, pad)
        b = jnp.pad(b, pad)
    out = _kernel_for(spec)(a, b)
    return out[:B].reshape(shape)
