"""Radix-2 evaluation domains with batched device NTTs.

The TPU-native replacement for arkworks ark-poly Radix2EvaluationDomain
(consumed by the reference at secret-sharing/src/pss.rs:44-52,
dist-primitives/src/dfft/mod.rs and groth16/src/ext_wit.rs:120-125).
Domain generators are derived exactly as arkworks derives them
(FieldSpec.root_of_unity), so transforms agree bit-for-bit.

The transform axis is the second-to-last axis: arrays are
(..., n, K_limbs) and arbitrary leading batch dims are transformed in
one fused program — butterflies are elementwise limb kernels over the
whole batch, which is what the VPU wants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.jfield import Field, field
from ..fields.spec import FieldSpec


def bitrev_perm(n: int) -> np.ndarray:
    """Bit-reversal permutation indices (host)."""
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


class Radix2Domain:
    """An (optionally coset-shifted) power-of-two evaluation domain."""

    def __init__(self, spec: FieldSpec, n: int, offset: int = 1):
        assert n & (n - 1) == 0 and n > 0
        self.spec = spec
        self.F: Field = field(spec)
        self.n = n
        self.log_n = n.bit_length() - 1
        p = spec.p
        self.group_gen = spec.root_of_unity(n) if n > 1 else 1
        self.group_gen_inv = pow(self.group_gen, -1, p)
        self.size_inv = pow(n, -1, p)
        self.offset = offset % p
        self.offset_inv = pow(self.offset, -1, p)
        self.offset_pow_size = pow(self.offset, n, p)
        # twiddle tables per stage (Montgomery form, device-ready constants)
        self._tw = self._twiddles(self.group_gen)
        self._tw_inv = self._twiddles(self.group_gen_inv)
        self._brev = bitrev_perm(n)

    def _twiddles(self, g: int):
        p = self.spec.p
        tables = []
        m = 1
        while m < self.n:
            w_m = pow(g, self.n // (2 * m), p)
            tw = [1] * m
            for j in range(1, m):
                tw[j] = (tw[j - 1] * w_m) % p
            tables.append(self.F.encode(tw))
            m *= 2
        return tables

    # ------------------------------------------------------------------

    def get_coset(self, offset: int) -> "Radix2Domain":
        return domain(self.spec, self.n, offset)

    def element(self, i: int) -> int:
        return (self.offset * pow(self.group_gen, i, self.spec.p)) % self.spec.p

    def elements(self) -> list[int]:
        p = self.spec.p
        out = [self.offset]
        for _ in range(self.n - 1):
            out.append((out[-1] * self.group_gen) % p)
        return out

    def evaluate_vanishing_polynomial(self, tau: int) -> int:
        """Z(tau) = tau^n - offset^n (host int; matches arkworks)."""
        return (pow(tau, self.n, self.spec.p) - self.offset_pow_size) % self.spec.p

    # ------------------------------------------------------------------
    # device transforms
    # ------------------------------------------------------------------

    def _butterflies(self, x, tables):
        """Iterative DIT NTT on bit-reversed input, axis=-2."""
        F = self.F
        n = self.n
        shape = x.shape
        for s, tw in enumerate(tables):
            m = 1 << s
            blocks = n // (2 * m)
            xv = x.reshape(shape[:-2] + (blocks, 2, m, F.k))
            u = xv[..., 0, :, :]
            v = F.mul(xv[..., 1, :, :], tw)
            x = jnp.stack([F.add(u, v), F.sub(u, v)], axis=-3).reshape(shape)
        return x

    def distribute_powers(self, x, g: int):
        """x[i] *= g^i along axis -2 (arkworks distribute_powers)."""
        p = self.spec.p
        pows = [1] * self.n
        for i in range(1, self.n):
            pows[i] = (pows[i - 1] * g) % p
        return self.F.mul(x, jnp.asarray(self.F.encode(pows)))

    @functools.partial(jax.jit, static_argnums=0)
    def fft(self, coeffs):
        """coeffs (..., n, K) -> evaluations at offset*g^i, natural order."""
        assert coeffs.shape[-2] == self.n
        x = coeffs
        if self.offset != 1:
            x = self.distribute_powers(x, self.offset)
        x = jnp.take(x, jnp.asarray(self._brev), axis=-2)
        return self._butterflies(x, self._tw)

    @functools.partial(jax.jit, static_argnums=0)
    def ifft(self, evals):
        """Inverse of fft (coset-aware)."""
        assert evals.shape[-2] == self.n
        x = jnp.take(evals, jnp.asarray(self._brev), axis=-2)
        x = self._butterflies(x, self._tw_inv)
        x = self.F.muli(x, self.size_inv)
        if self.offset != 1:
            x = self.distribute_powers(x, self.offset_inv)
        return x


@functools.cache
def domain(spec: FieldSpec, n: int, offset: int = 1) -> Radix2Domain:
    return Radix2Domain(spec, n, offset % spec.p)
