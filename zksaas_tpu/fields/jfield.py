"""Batched prime-field arithmetic as JAX vector kernels.

Field elements are arrays of shape (..., K) with dtype uint32, holding K
16-bit limbs (little-endian) in Montgomery form with R = 2^(16K).  All
ops are elementwise over the leading batch dims and jit-traceable, so
XLA fuses the limb arithmetic into the surrounding program; the same
code runs on TPU (VPU int32 lanes) and CPU.

Why 16-bit limbs in uint32 lanes: the TPU vector unit has no widening
64-bit multiply, but 16x16->32 products are exact in a uint32 lane, and
partial products can be accumulated lo/hi-split (sums of <= 32 terms of
16 bits stay < 2^22, far from the 2^32 wrap).

Reference: this replaces arkworks ark-ff MontBackend (used everywhere in
/root/reference, e.g. secret-sharing/src/pss.rs, dist-primitives).  The
algorithms (CIOS Montgomery multiply, Fermat inversion, batched
Montgomery inversion mirroring ark_ff::batch_inversion at
secret-sharing/src/utils.rs:91) match arkworks semantics; the dataflow
is redesigned for SIMD lanes instead of u64 scalar chains.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .spec import LIMB_BITS, LIMB_MASK, FieldSpec

_U32 = jnp.uint32


def _int_to_limbs(x: int, k: int) -> np.ndarray:
    return np.array([(x >> (LIMB_BITS * i)) & LIMB_MASK for i in range(k)], dtype=np.uint32)


def _limbs_to_int(a) -> int:
    return sum(int(v) << (LIMB_BITS * i) for i, v in enumerate(a))


class Field:
    """Device arithmetic context for one prime field.

    Instances are cached per spec; methods are pure functions of their
    array arguments (constants are closed over as numpy literals, so the
    same traced program is reused across jit scopes).
    """

    _cache: dict[str, "Field"] = {}

    def __new__(cls, spec: FieldSpec):
        inst = cls._cache.get(spec.name)
        if inst is None:
            inst = super().__new__(cls)
            inst._init(spec)
            cls._cache[spec.name] = inst
        return inst

    def _init(self, spec: FieldSpec) -> None:
        self.spec = spec
        self.p = spec.p
        self.k = spec.nlimbs
        self.n0inv = np.uint32(spec.n0inv)
        self.N = _int_to_limbs(spec.p, self.k)  # modulus limbs (np)
        self.r_mod_p = spec.r_mod_p
        self._r2 = _int_to_limbs(spec.r2_mod_p, self.k)
        self._one_mont = _int_to_limbs(spec.r_mod_p, self.k)
        # N' = -p^(-1) mod R (for the separated Montgomery reduction)
        self._nprime = _int_to_limbs((-pow(spec.p, -1, spec.R)) % spec.R, self.k)
        self._zero = np.zeros(self.k, dtype=np.uint32)
        # exponent bits of p-2 (MSB first) for Fermat inversion
        e = spec.p - 2
        self._inv_bits = np.array(
            [(e >> i) & 1 for i in reversed(range(e.bit_length()))], dtype=np.uint32
        )

    # ------------------------------------------------------------------
    # host <-> device conversion
    # ------------------------------------------------------------------

    def _native(self):
        if not hasattr(self, "_native_ctx"):
            from ..utils.native import context

            self._native_ctx = context(self.spec)
        return self._native_ctx

    def encode(self, xs) -> np.ndarray:
        """Python ints (nested lists ok) -> Montgomery-form limb array.

        Batched through the native C++ kernel (utils/native.py) when
        available — the dealer converts ~10^5-10^6 elements per proof."""
        arr = np.asarray(xs, dtype=object)
        flat = arr.reshape(-1)
        nat = self._native()
        if nat is not None and flat.shape[0] > 64:
            vals = [int(v) % self.p for v in flat]
            out = nat.encode_ints(vals)
            return out.reshape(arr.shape + (self.k,))
        out = np.empty((flat.shape[0], self.k), dtype=np.uint32)
        for i, v in enumerate(flat):
            out[i] = _int_to_limbs((int(v) * self.spec.r_mod_p) % self.p, self.k)
        return out.reshape(arr.shape + (self.k,))

    def decode(self, a) -> np.ndarray:
        """Montgomery-form limb array -> object ndarray of Python ints."""
        a = np.asarray(jax.device_get(a))
        shape = a.shape[:-1]
        flat = a.reshape(-1, self.k)
        nat = self._native()
        if nat is not None and flat.shape[0] > 64:
            out = np.empty(flat.shape[0], dtype=object)
            out[:] = nat.decode_ints(flat)
            return out.reshape(shape) if shape else out[0]
        rinv = pow(self.spec.R, -1, self.p)
        out = np.empty(flat.shape[0], dtype=object)
        for i in range(flat.shape[0]):
            out[i] = (_limbs_to_int(flat[i]) * rinv) % self.p
        return out.reshape(shape) if shape else out[0]

    def zeros(self, shape=()) -> jnp.ndarray:
        return jnp.broadcast_to(jnp.asarray(self._zero), tuple(shape) + (self.k,))

    def ones(self, shape=()) -> jnp.ndarray:
        return jnp.broadcast_to(jnp.asarray(self._one_mont), tuple(shape) + (self.k,))

    def const(self, x: int, shape=()) -> jnp.ndarray:
        """Embed a Python int constant as a (broadcast) device element."""
        limbs = _int_to_limbs((x % self.p) * self.spec.r_mod_p % self.p, self.k)
        return jnp.broadcast_to(jnp.asarray(limbs), tuple(shape) + (self.k,))

    # ------------------------------------------------------------------
    # limb helpers
    # ------------------------------------------------------------------

    @staticmethod
    def _shift_up(x, d: int = 1):
        """Shift limbs toward higher indices (multiply by 2^(16 d)),
        returning (shifted, spill) where spill = the dropped top limbs'
        sum-contribution as a scalar-per-batch (only d=1 spill used)."""
        z = jnp.zeros(x.shape[:-1] + (d,), dtype=x.dtype)
        return jnp.concatenate([z, x[..., :-d]], axis=-1)

    def _carry(self, limbs):
        """Exact carry propagation of redundant columns (< 2^22 each)
        into 16-bit limbs, in log depth (2 value rounds + Kogge-Stone
        for the residual 1-bit ripple); returns (limbs, top_carry)."""
        k = limbs.shape[-1]
        top = jnp.zeros(limbs.shape[:-1], dtype=_U32)
        # round 1: peel the >16-bit part (up to ~6 bits)
        h = limbs >> LIMB_BITS
        s = (limbs & LIMB_MASK) + self._shift_up(h)
        top = top + h[..., -1]
        # round 2: limbs now < 2^16 + 2^6; peel again (0/1 carries)
        h = s >> LIMB_BITS
        s = (s & LIMB_MASK) + self._shift_up(h)
        top = top + h[..., -1]
        # s_i <= 2^16: resolve the remaining ripple with Kogge-Stone
        g = (s >> LIMB_BITS).astype(_U32)  # generates (s_i == 2^16)
        p = (s == LIMB_MASK).astype(_U32)  # propagates
        d = 1
        while d < k:
            gs = self._shift_up(g, d)
            ps = self._shift_up(p, d)
            g = g | (p & gs)
            p = p & ps
            d *= 2
        carry_in = self._shift_up(g)
        t = s + carry_in
        top = top + g[..., -1]
        return t & LIMB_MASK, top

    def _sub_limbs(self, a, b_comp):
        """a - b via complement addition: a + (~b) + 1, log-depth carry.
        b_comp = (0xffff - b_i) limbs.  Returns (diff, no_borrow)."""
        e0 = np.zeros(self.k, dtype=np.uint32)
        e0[0] = 1
        cols = a + b_comp + jnp.asarray(e0)
        diff, carry = self._carry(cols)
        return diff, carry  # carry==1  <=>  a >= b (no borrow)

    def _sub_p(self, a):
        """(a - p) limbwise; returns (diff, borrow_out)."""
        comp = np.uint32(LIMB_MASK) - self.N
        diff, no_borrow = self._sub_limbs(a, jnp.asarray(comp))
        return diff, (no_borrow == 0).astype(_U32)

    def _cond_sub_p(self, a, top):
        """Reduce a value known to be < 2p (with possible carry bit `top`)."""
        sub, borrow = self._sub_p(a)
        ge = jnp.logical_or(top > 0, borrow == 0)
        return jnp.where(ge[..., None], sub, a)

    # ------------------------------------------------------------------
    # core arithmetic (Montgomery form in, Montgomery form out)
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def add(self, a, b):
        s, top = self._carry(a + b)
        return self._cond_sub_p(s, top)

    @functools.partial(jax.jit, static_argnums=0)
    def sub(self, a, b):
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
        d, no_borrow = self._sub_limbs(a, np.uint32(LIMB_MASK) - b)
        # if we borrowed, add p back
        addp, _ = self._carry(d + jnp.asarray(self.N))
        return jnp.where((no_borrow == 0)[..., None], addp, d)

    @functools.partial(jax.jit, static_argnums=0)
    def neg(self, a):
        return self.sub(self.zeros(a.shape[:-1]), a)

    @staticmethod
    def _skew_sum(mat, kout: int):
        """Anti-diagonal sums out[c] = sum_i mat[..., i, c-i] via the
        pad-flatten-reshape skew trick (pure data movement + one
        reduction; no gathers, no dynamic-update-slices)."""
        rr, cc = mat.shape[-2:]
        w = rr + cc - 1
        padded = jnp.pad(mat, [(0, 0)] * (mat.ndim - 1) + [(0, w + 1 - cc)])
        flat = padded.reshape(mat.shape[:-2] + (rr * (w + 1),))
        flat = flat[..., : rr * w]
        skewed = flat.reshape(mat.shape[:-2] + (rr, w))
        out = jnp.sum(skewed, axis=-2, dtype=_U32)[..., :kout]
        if w < kout:
            out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, kout - w)])
        return out

    def _prod_cols(self, a, b, kout: int):
        """Redundant product columns col[c] = sum_{i+j=c} a_i * b_j with
        lo/hi 16-bit split so every column stays < 2^22 (no widening
        multiply needed)."""
        pp = a[..., :, None] * b[..., None, :]  # (..., klhs, k) exact 16x16
        cols = self._skew_sum(pp & LIMB_MASK, kout)
        hi_cols = self._skew_sum(pp >> LIMB_BITS, kout)
        # hi contributes one column later
        return cols + jnp.concatenate(
            [jnp.zeros_like(hi_cols[..., :1]), hi_cols[..., : kout - 1]], axis=-1
        )

    def _carry_full(self, cols):
        """Normalize redundant columns (each < 2^22) into 16-bit limbs;
        returns (limbs, carry_out)."""
        return self._carry(cols)

    def _pallas_enabled(self) -> bool:
        if not hasattr(self, "_use_pallas"):
            import os

            self._use_pallas = (
                os.environ.get("ZKSAAS_NO_PALLAS", "0") != "1"
                and jax.default_backend() != "cpu"
            )
        return self._use_pallas

    @functools.partial(jax.jit, static_argnums=0)
    def mul(self, a, b):
        """Montgomery product a*b*R^-1 mod p.

        On TPU backends this is one fused Pallas kernel call (see
        pallas_mul.py); on CPU it is the jnp limb graph below
        (separated reduction: T = a*b; m = (T mod R)*N' mod R;
        out = (T + m*p)/R)."""
        if self._pallas_enabled():
            from .pallas_mul import montmul_pallas

            return montmul_pallas(self.spec, a, b)
        k = self.k
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
        T = self._prod_cols(a, b, 2 * k)  # redundant columns
        t_lo, _ = self._carry(T[..., :k])  # T mod R, normalized
        nprime = jnp.asarray(self._nprime)
        m_cols = self._prod_cols(t_lo, jnp.broadcast_to(nprime, t_lo.shape), k)
        m, _ = self._carry(m_cols)  # m = T*N' mod R, normalized
        U = self._prod_cols(m, jnp.broadcast_to(jnp.asarray(self.N), m.shape), 2 * k)
        S = T + U  # columns < 2^23
        # (T + m*p) / R: low k limbs vanish; propagate their carries up
        full, top = self._carry(S)
        res = full[..., k:]
        return self._cond_sub_p(res, top)

    @functools.partial(jax.jit, static_argnums=0)
    def square(self, a):
        return self.mul(a, a)

    @functools.partial(jax.jit, static_argnums=0)
    def from_mont(self, a):
        """Montgomery form -> raw integer limbs (montmul by literal 1)."""
        one_raw = np.zeros(self.k, dtype=np.uint32)
        one_raw[0] = 1
        return self.mul(a, jnp.broadcast_to(jnp.asarray(one_raw), a.shape))

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def muli(self, a, c: int):
        """Multiply by a static Python-int constant."""
        return self.mul(a, self.const(c, a.shape[:-1]))

    # ------------------------------------------------------------------
    # predicates / select
    # ------------------------------------------------------------------

    def sum(self, x, axis: int = 0):
        """Tree-reduce field sum along a batch axis."""
        if axis < 0:
            axis += x.ndim - 1
        x = jnp.moveaxis(x, axis, 0)
        n = x.shape[0]
        while n > 1:
            half = n // 2
            s = self.add(x[: 2 * half : 2], x[1 : 2 * half : 2])
            if n % 2:
                s = jnp.concatenate([s, x[-1:]], axis=0)
            x = s
            n = x.shape[0]
        return x[0]

    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)

    def eq(self, a, b):
        return jnp.all(a == b, axis=-1)  # Montgomery form is canonical (< p)

    def select(self, cond, a, b):
        return jnp.where(cond[..., None], a, b)

    # ------------------------------------------------------------------
    # inversion / exponentiation
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def inv(self, a):
        """Fermat inversion a^(p-2); returns 0 for input 0 (like
        arkworks' Option -> the callers here never invert 0 on the hot
        path)."""
        bits = jnp.asarray(self._inv_bits)
        # ^ (a & 0): inherit a's varying manual axes for the loop carry
        # (shard_map fori_loop typing; numerically a no-op)
        one = self.ones(a.shape[:-1]) ^ (a & 0)

        def body(i, acc):
            acc = self.square(acc)
            return self.select(bits[i] > 0, self.mul(acc, a), acc)

        return jax.lax.fori_loop(0, bits.shape[0], body, one)

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def pow_const(self, a, e: int):
        """a^e for a static small exponent (unrolled square-and-multiply)."""
        if e == 0:
            return self.ones(a.shape[:-1])
        acc = None
        for bit in bin(e)[2:]:
            acc = self.square(acc) if acc is not None else a
            if bit == "1" and acc is not a:
                acc = self.mul(acc, a)
        return acc

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def batch_inv(self, x, axis: int = 0):
        """Montgomery batched inversion along `axis` (one Fermat inversion
        plus O(m log m) muls via parallel prefix/suffix products).
        Zeros map to zeros, mirroring ark_ff::batch_inversion."""
        x = jnp.moveaxis(x, axis, 0)
        zero_mask = self.is_zero(x)
        safe = self.select(zero_mask, self.ones(x.shape[:-1]), x)
        prefix = jax.lax.associative_scan(self.mul, safe, axis=0)
        suffix = jax.lax.associative_scan(self.mul, safe[::-1], axis=0)[::-1]
        total_inv = self.inv(prefix[-1])
        one = self.ones(x.shape[1:-1])[None]
        p_prev = jnp.concatenate([one, prefix[:-1]], axis=0)
        s_next = jnp.concatenate([suffix[1:], one], axis=0)
        out = self.mul(self.mul(p_prev, s_next), total_inv[None])
        out = self.select(zero_mask, self.zeros(x.shape[:-1]), out)
        return jnp.moveaxis(out, 0, axis)

    # ------------------------------------------------------------------
    # randomness (uniform field elements, on device)
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def rand(self, key, shape=()):
        """Uniform field elements in Montgomery form.  Samples 2K 16-bit
        limbs (twice the modulus width) and reduces, so the mod-p bias is
        ~2^-256 — fixing the reference's use of a fixed test rng for
        king-side repacking (dfft/mod.rs:251)."""
        shape = tuple(shape)
        raw = jax.random.bits(key, shape=shape + (2 * self.k,), dtype=jnp.uint32) & LIMB_MASK
        lo, hi = raw[..., : self.k], raw[..., self.k :]
        r2 = jnp.asarray(self._r2)
        hi_red = self.mul(hi, jnp.broadcast_to(r2, hi.shape))  # hi * R mod p
        # reduce lo (< R < 2^2 * p typically) by repeated conditional subtraction
        lo_red = lo
        for _ in range(self.spec.R // self.p + 1):
            lo_red = self._cond_sub_p(lo_red, jnp.zeros(shape, dtype=_U32))
        return self.add(hi_red, lo_red)


@functools.cache
def field(spec: FieldSpec) -> Field:
    return Field(spec)
