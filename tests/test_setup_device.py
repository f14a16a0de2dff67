"""Device-side setup must agree with the host oracle setup exactly
(same rng stream -> same CRS -> identical packed shares)."""

import random

import jax
import numpy as np

from zksaas_tpu.circom import ConstraintBuilder
from zksaas_tpu.curves import curve_g1, curve_g2
from zksaas_tpu.fields import BN254_FR
from zksaas_tpu.groth16 import pack_proving_key, setup
from zksaas_tpu.groth16.setup_device import (
    pack_proving_key_device,
    setup_scalars,
    vk_from_scalars,
)
from zksaas_tpu.pss import pss


def small_circuit():
    cb = ConstraintBuilder()
    x = cb.witness(3)
    v = 3
    for _ in range(5):
        x = cb.mul(x, x)
        v = v * v % cb.spec.p
    out = cb.pub_input(v)
    cb.constrain([(1, x)], [(1, 0)], [(1, out)])
    return cb.finalize()


def test_device_crs_matches_host_pack():
    r1cs, z = small_circuit()
    keys = setup(r1cs, random.Random(55), reduction="circom")
    ss = setup_scalars(r1cs, random.Random(55), reduction="circom")
    vk = vk_from_scalars(ss)
    assert vk.alpha_g1 == keys.alpha_g1
    assert vk.delta_g2 == keys.delta_g2
    assert vk.gamma_abc_g1 == keys.gamma_abc_g1

    pp = pss(BN254_FR, 2)
    g1, g2 = curve_g1(), curve_g2()
    host = pack_proving_key(keys, pp, g1, g2)
    dev = pack_proving_key_device(ss, vk, pp, g1, g2)

    for name in ("s", "u", "w", "h"):
        hp = getattr(host, name)
        dp = getattr(dev, name)
        assert g1.decode(hp) == g1.decode(dp), f"query {name} mismatch"
    assert g2.decode(host.v) == g2.decode(dev.v), "query v mismatch"
    assert dev.beta_g2 == keys.beta_g2
