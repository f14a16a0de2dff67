"""Array-namespace dispatch for the in-kernel limb library.

The kernel code (fields/kernel_lib.py, curves/fused.py cores) is pure
straight-line array math.  On device it must trace with jax.numpy; in
tests we want to evaluate the *same code* on plain numpy arrays —
~100k tiny ops run in milliseconds under numpy but minutes under JAX
eager dispatch or the Pallas interpreter, and XLA:CPU cannot compile
the unrolled graph in reasonable time.

Operators (+ - * & >> < ==) already dispatch on operand type; this
module shims the handful of *named* functions so they follow the input
type too.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _mod(x):
    return np if isinstance(x, (np.ndarray, np.generic)) else jnp


def zeros_like(x):
    return _mod(x).zeros_like(x)


def full_like(x, v):
    return _mod(x).full_like(x, v)


def where(c, a, b):
    return _mod(c).where(c, a, b)


def logical_or(a, b):
    return _mod(a).logical_or(a, b)


def logical_and(a, b):
    return _mod(a).logical_and(a, b)


def logical_not(a):
    return _mod(a).logical_not(a)
