"""Fixed-base scalar multiplication via windowed tables.

For a FIXED base point (the G1/G2 generators), precompute
T[j][d] = d * 2^(c*j) * B on the host once; then s*B is a sum of 64
table lookups (window c = 4) instead of ~500 double-and-adds — the
device kernel is 64 point adds + gathers, fully batched.

This is the arkworks FixedBase::msm analog the reference relies on
inside ark-groth16's generator for CRS creation; here it powers
device-side trusted setup at SHA-256 scale (generating ~200k query
points) and mask/pad point sampling."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.spec import LIMB_BITS
from .jcurve import JCurve

_WINDOW = 4


@functools.cache
def _table(curve: JCurve):
    """Host-constant table: (n_windows, 2^c) Jacobian-encoded points as
    NUMPY arrays (so the cached value is trace-safe — it must never be
    built from inside a jit trace)."""
    ref = curve.ref
    c = _WINDOW
    nbits = curve.fr.spec.bits
    n_windows = -(-nbits // c)
    rows = []
    base = ref.gen
    for _ in range(n_windows):
        row = [None]  # 0 * B = infinity
        acc = None
        for _d in range(1, 1 << c):
            acc = ref.add(acc, base)
            row.append(acc)
        rows.append(row)
        for _ in range(c):
            base = ref.add(base, base)
    flat = [p for row in rows for p in row]
    R = curve.R
    is2 = len(R.coord_shape) == 2
    one = (1, 0) if is2 else 1
    zero = (0, 0) if is2 else 0
    X = R.encode([p[0] if p is not None else one for p in flat])
    Y = R.encode([p[1] if p is not None else one for p in flat])
    Z = R.encode([zero if p is None else one for p in flat])
    shape = (n_windows, 1 << c)
    return tuple(
        np.asarray(a).reshape(shape + R.coord_shape) for a in (X, Y, Z)
    )


@functools.partial(jax.jit, static_argnums=0)
def fixed_base_mul(curve: JCurve, scalars_mont):
    """generator * s for a batch of scalars (..., K) -> points (...)."""
    fr = curve.fr
    raw = fr.from_mont(scalars_mont)
    T = _table(curve)
    c = _WINDOW
    nbits = fr.spec.bits
    n_windows = -(-nbits // c)
    bshape = raw.shape[:-1]
    per_limb = LIMB_BITS // c  # windows per 16-bit limb
    # flatten tables to (n_windows * 2^c, ...) for dynamic window lookup
    Tf = tuple(coord.reshape((n_windows << c,) + coord.shape[2:]) for coord in T)

    def body(j, acc):
        limb = jnp.take(raw, j // per_limb, axis=-1)
        shift = (np.uint32(c) * (j % per_limb).astype(jnp.uint32))
        digit = (limb >> shift) & ((1 << c) - 1)
        idx = j * (1 << c) + digit.astype(jnp.int32)
        entry = tuple(jnp.take(coord, idx, axis=0) for coord in Tf)
        return curve.add(acc, entry)

    return jax.lax.fori_loop(0, n_windows, body, curve.infinity(bshape))
