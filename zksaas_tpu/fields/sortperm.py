"""In-VMEM bitonic sort of uint32 keys — a Pallas kernel.

XLA's TPU sort is catastrophically slow at MSM sizes (measured on
v5e: jnp.sort of 2^16 keys ~67 ms, a two-operand lax.sort of 2^19
keys ~114 s), so the Pippenger hot path sorts with this kernel
instead: the whole key array lives in VMEM (4 MB at 2^20) and the
full bitonic network runs as unrolled vector min/max stages —
measured ~2 ms at 2^19 (vs 114 s), within ~100x of pure VPU
speed-of-light and no longer on the critical path.

Payloads ride inside the key (callers pack `value << log2(n) | slot`),
which is how the MSM uses it: one sort yields both the grouped order
and, via the low bits, the gather permutation.

Layout: keys viewed as (R, 128) rows.  A compare-exchange at distance
d >= 128 pairs row r with r ^ (d/128): reshape to (R/2dr, 2, dr, 128)
and min/max the two middle slices.  A distance d < 128 pairs lane
l with l ^ d: `pltpu.roll` along the lane axis by +-d and select by
the lane's d-bit.  Directions follow the standard bitonic network:
ascending iff bit log2(k) of the global index is 0."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _cmpex_rows(x, dr: int, k: int):
    """Compare-exchange rows r <-> r ^ dr (dr = distance/128, power of
    two) with direction = bit log2(k) of the global element index."""
    R = x.shape[0]
    v = x.reshape(R // (2 * dr), 2, dr, 128)
    lo, hi = v[:, 0], v[:, 1]
    lt = lo < hi  # Mosaic legalizes cmpi-ult but not vector minui/maxui
    mn = jnp.where(lt, lo, hi)
    mx = jnp.where(lt, hi, lo)
    kr = k >> 7  # k in row units (k >= 256 whenever dr >= 1)
    b = jax.lax.broadcasted_iota(jnp.uint32, (R // (2 * dr), 1, 1), 0)
    asc = (b * (2 * dr)) & np.uint32(kr) == 0
    new_lo = jnp.where(asc, mn, mx)
    new_hi = jnp.where(asc, mx, mn)
    return jnp.stack([new_lo, new_hi], axis=1).reshape(R, 128)


def _cmpex_lanes(x, d: int, k: int):
    """Compare-exchange lanes l <-> l ^ d (d < 128) with bitonic
    direction from bit log2(k) of the global index."""
    R = x.shape[0]
    fwd = pltpu.roll(x, 128 - d, axis=1)  # partner l+d (roll is circular)
    bwd = pltpu.roll(x, d, axis=1)  # partner l-d, for lanes with bit d set
    lane = jax.lax.broadcasted_iota(jnp.uint32, (R, 128), 1)
    upper = (lane & np.uint32(d)) != 0  # this element is the pair's high slot
    partner = jnp.where(upper, bwd, fwd)
    lt = x < partner
    mn = jnp.where(lt, x, partner)
    mx = jnp.where(lt, partner, x)
    if k >= 128:
        # bit log2(k) of i = r*128 + l lives in the row index
        row = jax.lax.broadcasted_iota(jnp.uint32, (R, 128), 0)
        asc = (row & np.uint32(k >> 7)) == 0
    else:
        asc = (lane & np.uint32(k)) == 0
    keep_small = asc ^ upper  # ascending: low slot takes mn; descending: mx
    return jnp.where(keep_small, mn, mx)


@functools.cache
def _stage_call(n: int, k: int):
    """One bitonic k-stage (all its log2(k) substages) as one kernel.
    Splitting per stage keeps each Mosaic compile small — the fully
    unrolled 190-substage kernel at 2^19 OOMs the TPU compiler."""
    R = n // 128

    def kernel(x_ref, o_ref):
        x = x_ref[:]
        j = k // 2
        while j >= 1:
            if j >= 128:
                x = _cmpex_rows(x, j // 128, k)
            else:
                x = _cmpex_lanes(x, j, k)
            j //= 2
        o_ref[:] = x

    def call(keys):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.uint32),
            # the unrolled substages hold several (R, 128) temporaries
            # live at once; the 16 MB default scoped-vmem limit OOMs at
            # 2^19 keys (v5e has 128 MB physical VMEM)
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=_interpret(),
        )(keys)

    return call


@functools.cache
def _sort_call(n: int):
    assert n & (n - 1) == 0 and n >= 256, "power-of-two n >= 256"

    def call(keys):
        k = 2
        while k <= n:
            keys = _stage_call(n, k)(keys)
            k *= 2
        return keys

    if not _interpret():
        call = jax.jit(call)
    return call


def sort_u32(keys):
    """Ascending sort of a power-of-two-length uint32 vector."""
    n = keys.shape[0]
    if n < 256 or _interpret():
        # CPU backends: XLA's sort is fine there, and pltpu.roll has no
        # interpreter lowering
        return jnp.sort(keys)
    out = _sort_call(n)(keys.reshape(n // 128, 128))
    return out.reshape(n)
