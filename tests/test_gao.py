"""Gao RS decoding, mirroring secret-sharing/src/gao.rs:87-141 (the F17
toy-field tests) plus an error-injected packed-share recovery."""

import random

import pytest

from zksaas_tpu.fields.spec import BN254_FR, FieldSpec
from zksaas_tpu.ntt.ref import fft_ref
from zksaas_tpu.pss.gao import decode_to_message, partial_xgcd

F17 = FieldSpec(name="f17", p=17, generator=3, two_adicity=4)


def test_partial_xgcd_f17():
    """gao.rs:97-123: xgcd stops immediately when deg(b) < stop."""
    a = [8, 9, 5]
    b = [5, 3, 10]
    r, s = partial_xgcd(F17, a, b, 16, 10)
    assert r == [5, 3, 10]
    assert s == [1]


def test_error_correction_f17():
    """gao.rs:125-140: decode a corrupted codeword over F17."""
    msg = [1, 4]
    code = fft_ref(F17, msg + [0] * 6)  # share-domain evaluation, n=8
    code[1] = (code[1] + 1) % 17  # inject error
    decoded = decode_to_message(F17, code, 8, 4)
    assert decoded == msg


def test_error_correction_bn254_packed_share():
    """A degree-(t+l-1) packed sharing with up to (n-2l)/2 corrupted
    shares decodes to the original share polynomial."""
    spec = BN254_FR
    rng = random.Random(81)
    l = 2
    n = 4 * l
    k = 2 * l  # message dimension (poly degree < 2l)
    coeffs = [rng.randrange(spec.p) for _ in range(k)]
    code = fft_ref(spec, coeffs + [0] * (n - k))
    # corrupt (n - k) // 2 = 2 shares
    code[0] = (code[0] + 5) % spec.p
    code[5] = (code[5] + 9) % spec.p
    decoded = decode_to_message(spec, code, n, k)
    assert decoded == coeffs
