"""Circom wasm witness generation (reference: the JS calculator host,
fixtures/sha256/sha256_js/{witness_calculator,generate_witness}.js, and
its use in the flagship e2e groth16/examples/sha256.rs:162-177).

Runs the reference's actual compiled sha256.wasm artifact through the
pure-Python interpreter (zksaas_tpu/circom/wasm.py) — the repo's
counterpart of the one reference capability that previously had none:
witness generation from circom artifacts + JSON inputs.
"""

import hashlib
import os

import pytest

from zksaas_tpu.circom.witness_calc import WitnessCalculator, fnv1a_64
from zksaas_tpu.circom.wasm import WasmTrap
from zksaas_tpu.fields import BN254_FR

_WASM = "/root/reference/fixtures/sha256/sha256_js/sha256.wasm"

pytestmark = pytest.mark.skipif(
    not os.path.exists(_WASM), reason="reference sha256.wasm not present"
)


def _calc():
    return WitnessCalculator.from_file(_WASM)


def test_module_interface():
    """Instantiation runs real wasm code: getRawPrime writes the field
    prime limb-by-limb through the shared rw memory."""
    wc = _calc()
    assert wc.version == 2  # circom 2.x
    assert wc.n32 == 8  # 256-bit field limbs
    assert wc.prime == BN254_FR.p
    assert wc.witness_size == 29823  # sha256_2 circuit


def test_unknown_signal_rejected():
    wc = _calc()
    with pytest.raises(WasmTrap, match="not found"):
        wc.calculate_witness({"a": 1, "b": 2, "nope": 3})


def test_missing_inputs_rejected():
    wc = _calc()
    with pytest.raises(WasmTrap, match="Not all inputs"):
        wc.calculate_witness({"a": 1})


def test_fnv_hash_matches_js():
    # value checked against the JS fnvHash in witness_calculator.js
    assert fnv1a_64("") == 0xCBF29CE484222325
    h = fnv1a_64("a")
    assert h == (0xCBF29CE484222325 ^ ord("a")) * 0x100000001B3 % (1 << 64)


@pytest.mark.slow
def test_full_witness_matches_hashlib():
    """The full 29,823-signal witness for (a=1, b=2): w[0] == 1 and the
    public output equals sha256 of the 216-bit big-endian encodings —
    the same message convention as the native fixture
    (zksaas_tpu/circom/sha256.py) — taking the digest's low 216 bits
    (circomlib Sha256_2 wires compression output bits 40..255 into
    Bits2Num(216)).  ~2.5 min in the pure-Python interpreter."""
    a, b = 1, 2
    wc = _calc()
    w = wc.calculate_witness({"a": a, "b": b})
    assert len(w) == wc.witness_size
    assert w[0] == 1
    msg = a.to_bytes(27, "big") + b.to_bytes(27, "big")
    digest = int.from_bytes(hashlib.sha256(msg).digest(), "big")
    assert w[1] == digest & ((1 << 216) - 1)
    # circom witness layout: [1, outputs, inputs, internal]
    assert w[2] == a and w[3] == b

    # wtns v2 framing round-trips through the repo's own parser
    import tempfile

    from zksaas_tpu.circom.r1cs import load_wtns

    blob = wc.calculate_wtns_bin({"a": a, "b": b})
    with tempfile.NamedTemporaryFile(suffix=".wtns", delete=False) as f:
        f.write(blob)
        path = f.name
    try:
        assert load_wtns(path) == w
    finally:
        os.unlink(path)
