"""End-to-end distributed prove == local prove on a small circuit.

The flagship correctness assertion (sha256.rs analog at test scale):
dealer packs everything, 8 parties run d_prove over LocalNet, the
unpacked proof must equal the single-machine prover bit-for-bit and
pairing-verify.  Exits non-zero on any mismatch.

Run standalone (any backend) or via tests/test_e2e_prove.py, which
subprocess-runs it: XLA:CPU cannot host this workload inside a
long-lived pytest process (the accumulated JIT code plus these large
executables segfault the AOT loader), while a fresh interpreter
handles it reliably.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("ZKSAAS_E2E_CPU", "1") == "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if os.environ.get("ZKSAAS_E2E_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")

from zksaas_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import random


def main():
    from zksaas_tpu.circom import ConstraintBuilder
    from zksaas_tpu.comm import LocalNet
    from zksaas_tpu.curves import curve_g1, curve_g2
    from zksaas_tpu.fields import FIELDS
    from zksaas_tpu.groth16 import (
        Proof,
        ProveMasks,
        d_prove,
        local_prove,
        pack_proving_key,
        pack_scalar_repeated,
        pack_witness,
        qap_pack,
        setup,
        verify,
    )
    from zksaas_tpu.pss import pss

    # curve family knob: bn254 (default) / bls12_381 / bls12_377
    family = os.environ.get("ZKSAAS_E2E_CURVE", "bn254")
    fr_spec = FIELDS[f"{family}_fr"]

    cb = ConstraintBuilder(fr_spec)
    x = cb.witness(3)
    val = 3
    for _ in range(10):
        x = cb.mul(x, x)
        val = val * val % cb.spec.p
    out = cb.pub_input(val)
    cb.constrain([(1, x)], [(1, 0)], [(1, out)])
    r1cs, z = cb.finalize()

    rng = random.Random(123)
    keys = setup(r1cs, rng, reduction="circom")
    r = rng.randrange(r1cs.spec.p)
    s = rng.randrange(r1cs.spec.p)
    expected = local_prove(keys, r1cs, z, r, s)
    assert verify(keys, z[1 : r1cs.num_instance], expected), "local verify failed"

    pp = pss(fr_spec, 2)
    g1, g2 = curve_g1(family), curve_g2(family)
    key = jax.random.PRNGKey(777)
    ks = jax.random.split(key, 7)

    qap_share = qap_pack(pp, r1cs, z, ks[0])
    crs = pack_proving_key(keys, pp, g1, g2)
    a_share = pack_witness(pp, z[1:], ks[1])
    ax_share = pack_witness(pp, z[r1cs.num_instance :], ks[2])
    r_share = pack_scalar_repeated(pp, r, ks[3])
    s_share = pack_scalar_repeated(pp, s, ks[4])
    masks = ProveMasks.sample(pp, g1, g2, qap_share.dom.n, ks[5])

    net = LocalNet(pp.n)
    pi_a, pi_b2, pi_c = d_prove(
        pp, g1, g2, crs, qap_share, a_share, ax_share, r_share, s_share,
        masks, net, ks[6],
    )

    a = g1.decode(tuple(c[:1] for c in pp.unpack2_g(g1, pi_a)))[0]
    b = g2.decode(tuple(c[:1] for c in pp.unpack2_g(g2, pi_b2)))[0]
    c = g1.decode(tuple(c[:1] for c in pp.unpack2_g(g1, pi_c)))[0]

    assert a == expected.a, "pi_a mismatch"
    assert b == expected.b, "pi_b mismatch"
    assert c == expected.c, "pi_c mismatch"
    assert verify(keys, z[1 : r1cs.num_instance], Proof(a=a, b=b, c=c))
    print(
        f"e2e_small[{family}]: distributed proof == local proof, verified",
        flush=True,
    )


if __name__ == "__main__":
    main()
