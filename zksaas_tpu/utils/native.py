"""ctypes loader for the native host kernels (native/zkhost.cpp).

Compiles libzkhost.so on first use (g++, cached next to the source) and
exposes batch Montgomery encode/decode used by Field.encode/decode for
the dealer's big conversions (hundreds of thousands of elements per
proof).  Falls back silently when no compiler is available — callers
must treat `context(spec)` returning None as "use the Python path".

Reference analog: arkworks MontBackend's into/from bigint conversions,
exercised en masse by groth16/src/proving_key.rs:47-123.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "zkhost.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libzkhost.so")


@functools.cache
def _lib():
    src = os.path.abspath(_SRC)
    lib = os.path.abspath(_LIB)
    if not os.path.exists(src):
        return None
    if (not os.path.exists(lib)) or os.path.getmtime(lib) < os.path.getmtime(src):
        try:
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", lib, src],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        L = ctypes.CDLL(lib)
    except OSError:
        return None
    L.zk_ctx_size.restype = ctypes.c_int
    L.zk_ctx_init.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_int, ctypes.c_int,
    ]
    for fn in (L.zk_encode, L.zk_decode):
        fn.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long]
    L.zk_modmul.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_long,
    ]
    return L


class NativeField:
    """Batch conversions for one field spec."""

    def __init__(self, lib, spec):
        self.lib = lib
        self.spec = spec
        self.W = -(-spec.bits // 64)
        self.K16 = spec.nlimbs
        self.ctx = ctypes.create_string_buffer(lib.zk_ctx_size())
        p_b = spec.p.to_bytes(8 * self.W, "little")
        r = 1 << (64 * self.W)
        r2_b = (r * r % spec.p).to_bytes(8 * self.W, "little")
        lib.zk_ctx_init(self.ctx, p_b, r2_b, self.W, self.K16)
        # device Montgomery form uses R16 = 2^(16*K16); ours is
        # R64 = 2^(64*W).  They coincide when 16*K16 == 64*W; otherwise
        # encode must post-scale.  All supported fields satisfy it.
        assert 16 * self.K16 == 64 * self.W, spec.name

    def encode_ints(self, ints) -> np.ndarray:
        """list[int] (reduced mod p) -> (n, K16) uint32 Montgomery."""
        n = len(ints)
        stride = 8 * self.W
        buf = b"".join(v.to_bytes(stride, "little") for v in ints)
        out = np.empty((n, self.K16), dtype=np.uint32)
        self.lib.zk_encode(
            self.ctx, buf, out.ctypes.data_as(ctypes.c_void_p), n
        )
        return out

    def decode_ints(self, arr: np.ndarray) -> list[int]:
        """(n, K16) uint32 Montgomery -> list[int]."""
        arr = np.ascontiguousarray(arr, dtype=np.uint32)
        n = arr.shape[0]
        stride = 8 * self.W
        out = ctypes.create_string_buffer(n * stride)
        self.lib.zk_decode(
            self.ctx, arr.ctypes.data_as(ctypes.c_void_p), out, n
        )
        raw = out.raw
        return [
            int.from_bytes(raw[i * stride : (i + 1) * stride], "little")
            for i in range(n)
        ]


@functools.cache
def context(spec):
    """NativeField for a spec, or None when the native lib is absent."""
    lib = _lib()
    if lib is None:
        return None
    try:
        return NativeField(lib, spec)
    except AssertionError:
        return None
