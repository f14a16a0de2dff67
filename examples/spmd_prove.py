"""Full distributed Groth16 prove as ONE SPMD mesh program.

The last mesh surface the per-primitive SPMD tests don't cover: the
complete d_prove — ext_wit pipeline, A, B(G1), the G2 d_msm of B, and
prove_c's two-MSM round — jitted under shard_map with a party-per-
device sharding (SpmdNet), asserted BIT-identical to the LocalNet
(stacked) protocol and to the single-machine prover, then
pairing-verified.  The reference's flagship runs the whole prove over
its production transport (groth16/examples/sha256.rs:159-416); this is
the same claim for the mesh transport.

Runs on the 8-device virtual CPU mesh (or any >= 8-device backend).
Subprocess-run by tests/test_spmd_prove.py for the same XLA:CPU
code-size reasons as e2e_small.py.
"""

import functools
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

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P


def main():
    from zksaas_tpu.circom import ConstraintBuilder
    from zksaas_tpu.comm import LocalNet, SpmdNet
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
    from zksaas_tpu.groth16.proving_key import PackedProvingKeyShare
    from zksaas_tpu.groth16.qap import PackedQAPShare
    from zksaas_tpu.pss import pss

    family = os.environ.get("ZKSAAS_E2E_CURVE", "bn254")
    fr_spec = FIELDS[f"{family}_fr"]

    # small multiplication-chain circuit (e2e_small's shape)
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

    # oracle: the stacked LocalNet protocol (king round simulated on the
    # full (n, ...) tensors)
    want = d_prove(
        pp, g1, g2, crs, qap_share, a_share, ax_share, r_share, s_share,
        masks, LocalNet(pp.n), ks[6],
    )

    # the same prove as one shard_map program: every shared tensor keeps
    # its leading party axis and is sharded over the mesh; inside the
    # body each device strips its singleton party slice.  Mask / CRS /
    # QAP dataclasses are rebuilt from a flat arrays pytree so the whole
    # state rides in_specs uniformly.
    n = pp.n
    if len(jax.devices()) < n:
        raise SystemExit(f"needs {n} devices, have {len(jax.devices())}")
    mesh = jax.make_mesh((n,), ("parties",))
    net = SpmdNet(n, "parties")

    shared = {
        "qap": (qap_share.a, qap_share.b, qap_share.c),
        "crs": (crs.s, crs.u, crs.w, crs.h, crs.v),
        "a": a_share,
        "ax": ax_share,
        "r": r_share,
        "sc": s_share,
        "fft": [(m.in_mask, m.out_mask) for m in masks.fft_masks],
        "dr": (masks.degred_mask.in_mask, masks.degred_mask.out_mask),
        "msm1": [(m.in_mask, m.out_mask) for m in masks.g1_msm_masks],
        "msm2": (masks.g2_msm_mask.in_mask, masks.g2_msm_mask.out_mask),
    }
    in_specs = (jax.tree.map(lambda _: P("parties"), shared), P())

    from zksaas_tpu.dist.deg_red import DegRedMask
    from zksaas_tpu.dist.dfft import FftMask
    from zksaas_tpu.dist.dmsm import MsmMask

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=in_specs,
        out_specs=jax.tree.map(lambda _: P("parties"), want),
    )
    def step(sh, key):
        sh = jax.tree.map(lambda x: x[0], sh)  # strip the party slice
        qs = PackedQAPShare(
            qap_share.num_inputs, qap_share.num_constraints,
            sh["qap"][0], sh["qap"][1], sh["qap"][2], qap_share.dom,
        )
        cs = PackedProvingKeyShare(
            s=sh["crs"][0], u=sh["crs"][1], w=sh["crs"][2],
            h=sh["crs"][3], v=sh["crs"][4],
            a_query0=crs.a_query0, b_g1_query0=crs.b_g1_query0,
            b_g2_query0=crs.b_g2_query0, delta_g1=crs.delta_g1,
            delta_g2=crs.delta_g2, alpha_g1=crs.alpha_g1,
            beta_g1=crs.beta_g1, beta_g2=crs.beta_g2,
        )
        mk = ProveMasks(
            fft_masks=[FftMask(in_mask=i, out_mask=o) for i, o in sh["fft"]],
            degred_mask=DegRedMask(in_mask=sh["dr"][0], out_mask=sh["dr"][1]),
            g1_msm_masks=[MsmMask(in_mask=i, out_mask=o) for i, o in sh["msm1"]],
            g2_msm_mask=MsmMask(in_mask=sh["msm2"][0], out_mask=sh["msm2"][1]),
        )
        pa, pb2, pc = d_prove(
            pp, g1, g2, cs, qs, sh["a"], sh["ax"], sh["r"], sh["sc"], mk, net, key
        )
        addp = lambda t: tuple(c[None] for c in t)
        return addp(pa), addp(pb2), addp(pc)

    got = step(shared, ks[6])

    # bit-exactness vs the LocalNet protocol, share by share
    for name, w, g in zip(("pi_a", "pi_b2", "pi_c"), want, got):
        for cw, cg in zip(w, g):
            np.testing.assert_array_equal(
                np.asarray(jax.device_get(cg)),
                np.asarray(jax.device_get(cw)),
                err_msg=f"{name} shares differ between SpmdNet and LocalNet",
            )

    pi_a, pi_b2, pi_c = got
    a = g1.decode(tuple(c[:1] for c in pp.unpack2_g(g1, pi_a)))[0]
    b = g2.decode(tuple(c[:1] for c in pp.unpack2_g(g2, pi_b2)))[0]
    c = g1.decode(tuple(c[:1] for c in pp.unpack2_g(g1, pi_c)))[0]
    assert a == expected.a and b == expected.b and c == expected.c
    assert verify(keys, z[1 : r1cs.num_instance], Proof(a=a, b=b, c=c))
    print(
        f"spmd_prove[{family}]: mesh proof == LocalNet proof == local proof, verified",
        flush=True,
    )


if __name__ == "__main__":
    main()
