"""Pallas TPU kernel for the Montgomery multiply (planes layout).

One fused VMEM kernel per 1024-element block replaces the ~170-op jnp
limb graph: each 16-bit limb occupies a full (8, 128) uint32 vreg (see
fields/kernel_lib.py), so the CIOS product/reduction is straight-line
full-width vector code — no sublane-strided scratch updates, no
in-kernel transposes.  Measured ~1.65 G muls/s on one v5e chip for
BN254 Fq (the round-1 (TILE, K)-block kernel ran at ~0.17 G).

Used automatically by Field.mul on TPU backends; the pure-jnp path
remains for CPU tests.  (Reference hot loop being replaced: arkworks
MontBackend mul, used by every layer of /root/reference.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernel_lib import from_planes, kernel_field, to_planes
from .spec import FieldSpec


@functools.cache
def _mul_call(spec: FieldSpec):
    kf = kernel_field(spec)
    K = kf.K
    coord = pl.BlockSpec((K, 1, 8, 128), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM)

    def kernel(a_ref, b_ref, o_ref):
        kf.store(o_ref, kf.mm(kf.load(a_ref), kf.load(b_ref)))

    interp = jax.default_backend() == "cpu"

    def call(a, b):
        nb = a.shape[1]
        return pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[coord, coord],
            out_specs=coord,
            out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
            interpret=interp,
        )(a, b)

    # eager under the CPU interpreter (the unrolled body would be a
    # huge XLA:CPU graph); one jitted Mosaic kernel on TPU
    return call if interp else jax.jit(call)


def montmul_pallas(spec: FieldSpec, a, b):
    """Batched Montgomery product.  a, b: broadcast-compatible (..., K)
    uint32 arrays (exact 16-bit limbs, Montgomery form)."""
    K = spec.nlimbs
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    ap, B = to_planes(jnp.broadcast_to(a, shape), K)
    bp, _ = to_planes(jnp.broadcast_to(b, shape), K)
    return from_planes(_mul_call(spec)(ap, bp), B, shape)
