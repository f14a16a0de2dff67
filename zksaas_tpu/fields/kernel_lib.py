"""In-kernel limb arithmetic for fused Pallas TPU kernels.

This is the register-level field library used by the fused point-add /
Montgomery-multiply kernels: a field element inside a kernel is a
Python list of K uint32 values, each an (8, 128)-shaped vreg holding
1024 independent batch elements.  All operations are straight-line
vector code — ripple carries over K limbs, no gathers, no dynamic
shapes — so one Jacobian/projective point formula compiles to a single
Mosaic kernel with every intermediate in registers/VMEM.

Layout contract ("planes"): a batch of B field elements crosses the
kernel boundary as a (K, nb, 8, 128) uint32 array, nb = B/1024, so
limb k of block i is the (8, 128) vreg `ref[k, i]`.  Host-side
conversion from the global (..., K) layout is one XLA transpose
(`to_planes` / `from_planes`).

Replaces the per-multiply kernel of pallas_mul.py on the hot paths
(reference hot loops: arkworks MontBackend mul inside G::msm,
/root/reference/dist-primitives/src/dmsm/mod.rs:73, and the FFT
butterflies, dfft/mod.rs:178-237).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import _xp as xp
from .spec import LIMB_BITS, LIMB_MASK, FieldSpec

BLOCK = 1024  # batch elements per kernel block
_ROW = (8, 128)  # vreg shape; 8 * 128 == BLOCK


def to_planes(x: jnp.ndarray, k: int):
    """(..., B, K) -> ((K, nb, 8, 128), B) with B padded to BLOCK."""
    flat = x.reshape(-1, k)
    B = flat.shape[0]
    Bp = -(-B // BLOCK) * BLOCK
    if Bp != B:
        flat = jnp.pad(flat, [(0, Bp - B), (0, 0)])
    planes = flat.T.reshape(k, Bp // BLOCK, 8, 128)
    return planes, B


def from_planes(planes: jnp.ndarray, B: int, shape) -> jnp.ndarray:
    """(K, nb, 8, 128) -> original (..., K) layout."""
    k = planes.shape[0]
    flat = planes.reshape(k, -1).T
    return flat[:B].reshape(shape)


class KernelField:
    """Limb arithmetic over one prime, usable inside a Pallas kernel.

    Elements are lists of K same-shaped uint32 arrays with exact 16-bit
    limbs (little-endian), Montgomery form where relevant.  Every
    method is pure straight-line jnp on those arrays.
    """

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.K = spec.nlimbs
        self.N = [
            np.uint32((spec.p >> (LIMB_BITS * i)) & LIMB_MASK) for i in range(self.K)
        ]
        self.n0inv = np.uint32(spec.n0inv)
        self.one_mont = [
            np.uint32((spec.r_mod_p >> (LIMB_BITS * i)) & LIMB_MASK)
            for i in range(self.K)
        ]
        self.mask = np.uint32(LIMB_MASK)

    # -- ref IO ----------------------------------------------------------

    def load(self, ref, blk=0):
        """Read a (K, nb, 8, 128) ref's block `blk` into a limb list."""
        return [ref[k, blk] for k in range(self.K)]

    def store(self, ref, val, blk=0):
        for k in range(self.K):
            ref[k, blk] = val[k]

    def zeros_like(self, x):
        z = xp.zeros_like(x)
        return [z] * self.K

    def const(self, limbs, like):
        """Broadcast a python-int limb list to the batch shape."""
        return [xp.full_like(like, np.uint32(l)) for l in limbs]

    # -- carries ----------------------------------------------------------

    def _normalize(self, cols):
        """Ripple-normalize len(cols) redundant columns (< 2^32 each)
        into exact 16-bit limbs; returns (limbs, carry_out)."""
        out = []
        c = xp.zeros_like(cols[0])
        for v in cols:
            t = v + c
            out.append(t & self.mask)
            c = t >> LIMB_BITS
        return out, c

    def _sub_p(self, r):
        """r - p with borrow ripple; returns (diff_limbs, borrow_out)."""
        out = []
        brw = xp.zeros_like(r[0])
        for j in range(self.K):
            need = self.N[j] + brw  # <= 2^16, fits
            v = (r[j] - need) & self.mask
            brw = (r[j] < need).astype(jnp.uint32)
            out.append(v)
        return out, brw

    def _cond_sub_p(self, r, top):
        """Reduce a normalized value known < 2p (carry bit `top`)."""
        sub, brw = self._sub_p(r)
        ge = xp.logical_or(top > 0, brw == 0)
        return [xp.where(ge, s, v) for s, v in zip(sub, r)]

    # -- ring ops ----------------------------------------------------------

    def add(self, a, b):
        cols = [x + y for x, y in zip(a, b)]
        s, c = self._normalize(cols)
        return self._cond_sub_p(s, c)

    def sub(self, a, b):
        out = []
        brw = xp.zeros_like(a[0])
        for j in range(self.K):
            need = b[j] + brw
            v = (a[j] - need) & self.mask
            brw = (a[j] < need).astype(jnp.uint32)
            out.append(v)
        # if borrowed, add p back (the ripple cannot re-borrow)
        addp = []
        c = xp.zeros_like(a[0])
        for j in range(self.K):
            t = out[j] + self.N[j] + c
            addp.append(t & self.mask)
            c = t >> LIMB_BITS
        neg = brw > 0
        return [xp.where(neg, x, y) for x, y in zip(addp, out)]

    def neg(self, a):
        return self.sub([xp.zeros_like(x) for x in a], a)

    def dbl(self, a):
        return self.add(a, a)

    def mm(self, a, b):
        """CIOS Montgomery product a*b*R^-1 mod p (exact-limb in/out)."""
        K, mask = self.K, self.mask
        zero = xp.zeros_like(a[0])
        t = [zero] * (K + 1)
        for i in range(K):
            ai = a[i]
            for j in range(K):
                p = ai * b[j]  # exact: 16x16 in a u32 lane
                t[j] = t[j] + (p & mask)
                t[j + 1] = t[j + 1] + (p >> LIMB_BITS)
            m = ((t[0] & mask) * self.n0inv) & mask
            for j in range(K):
                p = m * self.N[j]
                t[j] = t[j] + (p & mask)
                t[j + 1] = t[j + 1] + (p >> LIMB_BITS)
            # t[0] ≡ 0 mod 2^16 now; fold its carry and shift down
            t[1] = t[1] + (t[0] >> LIMB_BITS)
            t = t[1:] + [zero]
        r, top = self._normalize(t[:K])
        top = top + t[K]
        return self._cond_sub_p(r, top)

    def sqr(self, a):
        return self.mm(a, a)

    def muli(self, a, c: int):
        """Multiply by a small positive int via a double-and-add chain
        (each step stays fully reduced, so no multi-subtract reduction
        is needed; an add is ~2 ripple passes — cheap next to mm)."""
        assert c >= 1
        bits = bin(c)[2:]
        acc = a
        for bit in bits[1:]:
            acc = self.add(acc, acc)
            if bit == "1":
                acc = self.add(acc, a)
        return acc

    def is_zero(self, a):
        acc = a[0]
        for x in a[1:]:
            acc = acc | x
        return acc == 0

    def select(self, cond, a, b):
        """cond ? a : b (cond is a bool vreg)."""
        return [xp.where(cond, x, y) for x, y in zip(a, b)]


@functools.cache
def kernel_field(spec: FieldSpec) -> KernelField:
    return KernelField(spec)
