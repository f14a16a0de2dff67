"""Distributed extended-witness (h) pipelines vs the local witness map.

Mirrors the reference's ext_wit tests (groth16/src/ext_wit.rs:204-237
libsnark_h vs a local coset-FFT reference, :239-285 circom_h vs the
CircomReduction witness map): dealer packs the QAP vectors, 8 parties
run the full masked FFT pipeline over LocalNet, and the unpacked h
must equal local.witness_map bit-for-bit for BOTH reductions."""

import random

import jax
import jax.numpy as jnp
import pytest

from zksaas_tpu.circom import ConstraintBuilder
from zksaas_tpu.comm import LocalNet
from zksaas_tpu.fields import BN254_FR
from zksaas_tpu.groth16.ext_wit import (
    circom_h,
    circom_masks,
    libsnark_h,
    libsnark_masks,
)
from zksaas_tpu.groth16.local import witness_map
from zksaas_tpu.groth16.qap import qap_pack
from zksaas_tpu.pss import pss


@pytest.fixture(scope="module")
def circuit():
    cb = ConstraintBuilder(BN254_FR)
    x = cb.witness(3)
    val = 3
    for _ in range(3):
        x = cb.mul(x, x)
        val = val * val % cb.spec.p
    out = cb.pub_input(val)
    cb.constrain([(1, x)], [(1, 0)], [(1, out)])
    return cb.finalize()


def _unpack_natural(pp, shares):
    sh = jnp.swapaxes(shares, 0, 1)  # (m/l, n, K)
    secrets = pp.unpack(sh)  # (m/l, l, K)
    return list(pp.F.decode(secrets.reshape(-1, pp.F.k)))


def test_distributed_circom_h_matches_witness_map(circuit):
    """circom_h over LocalNet == CircomReduction-style witness map
    (ext_wit.rs:239-285)."""
    r1cs, z = circuit
    pp = pss(BN254_FR, 2)
    key = jax.random.PRNGKey(91)
    k1, k2, k3 = jax.random.split(key, 3)
    qap_share = qap_pack(pp, r1cs, z, k1)
    m = qap_share.dom.n
    fft_masks, degred_mask = circom_masks(pp, m, k2)
    net = LocalNet(pp.n)
    h_sh = circom_h(pp, qap_share, fft_masks, degred_mask, net, k3)
    got = _unpack_natural(pp, h_sh)
    assert got == witness_map(r1cs, z, "circom")


def test_distributed_libsnark_h_matches_witness_map(circuit):
    """libsnark_h over LocalNet == local coset-FFT h (ext_wit.rs:204-237).

    This is the 7-FftMask schedule (libsnark_masks) — a wrong coset
    offset or generator in any of the seven masks breaks bit-equality."""
    r1cs, z = circuit
    pp = pss(BN254_FR, 2)
    key = jax.random.PRNGKey(92)
    k1, k2, k3 = jax.random.split(key, 3)
    qap_share = qap_pack(pp, r1cs, z, k1)
    m = qap_share.dom.n
    masks = libsnark_masks(pp, m, k2)
    net = LocalNet(pp.n)
    h_sh = libsnark_h(pp, qap_share, masks, net, k3)
    got = _unpack_natural(pp, h_sh)
    expect = witness_map(r1cs, z, "libsnark")  # m-1 coefficients
    assert got[: m - 1] == expect
    # (ab - c)/Z has degree m-2: the padded tail coefficient is zero
    assert got[m - 1] == 0
