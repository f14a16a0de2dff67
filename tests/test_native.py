"""Native C++ host kernels (native/zkhost.cpp via utils/native.py):
batch Montgomery encode/decode bit-exact vs the pure-Python path, for
every supported field.  Skips when no compiler is available."""

import random

import numpy as np
import pytest

from zksaas_tpu.fields import spec as fspec
from zksaas_tpu.fields.jfield import _int_to_limbs
from zksaas_tpu.utils.native import context


@pytest.mark.parametrize("name", sorted(fspec.FIELDS))
def test_native_encode_decode(name):
    spec = fspec.FIELDS[name]
    nat = context(spec)
    if nat is None:
        pytest.skip("native lib unavailable")
    rng = random.Random(5)
    vals = [rng.randrange(spec.p) for _ in range(257)] + [0, 1, spec.p - 1]
    got = nat.encode_ints(vals)
    want = np.stack(
        [_int_to_limbs(v * spec.r_mod_p % spec.p, spec.nlimbs) for v in vals]
    )
    np.testing.assert_array_equal(got, want)
    back = nat.decode_ints(got)
    assert back == vals


def test_field_encode_uses_native_consistently():
    """Field.encode/decode round-trips and matches the small-batch
    (pure Python) path regardless of which backend ran."""
    from zksaas_tpu.fields import BN254_FR, field

    F = field(BN254_FR)
    rng = random.Random(6)
    vals = [rng.randrange(F.p) for _ in range(200)]
    big = F.encode(vals)  # native path (>64)
    small = np.concatenate(
        [np.asarray(F.encode(vals[i : i + 10])) for i in range(0, 200, 10)]
    )
    np.testing.assert_array_equal(np.asarray(big), small)
    assert list(F.decode(big)) == vals
