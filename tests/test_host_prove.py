"""Full distributed Groth16 prove over the REAL multi-process TCP star.

This is the reference's deployment shape (groth16/examples/sha256.rs:
159-416 runs the whole prove over sockets): 8 party PROCESSES (king +
7 spawned clients) run the complete d_prove protocol over HostStarNet
— every share, mask, and intermediate crossing process boundaries via
the numpy wire format — and the unpacked proof must equal the local
prover bit-for-bit and verify."""

import multiprocessing as mp
import random
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit("/", 1)[0])

from hostnet_prove_worker import run_prove_client

TIMEOUT = 900.0  # per-round gather timeout: parties compile between rounds


def _dealer():
    from zksaas_tpu.circom import ConstraintBuilder
    from zksaas_tpu.curves import curve_g1, curve_g2
    from zksaas_tpu.fields import FIELDS
    from zksaas_tpu.groth16 import (
        ProveMasks,
        local_prove,
        pack_proving_key,
        pack_scalar_repeated,
        pack_witness,
        qap_pack,
        setup,
        verify,
    )
    from zksaas_tpu.pss import pss

    spec = FIELDS["bn254_fr"]
    cb = ConstraintBuilder(spec)
    x = cb.witness(3)
    val = 3
    for _ in range(3):
        x = cb.mul(x, x)
        val = val * val % spec.p
    out = cb.pub_input(val)
    cb.constrain([(1, x)], [(1, 0)], [(1, out)])
    r1cs, z = cb.finalize()

    rng = random.Random(321)
    keys = setup(r1cs, rng, reduction="circom")
    r = rng.randrange(spec.p)
    s = rng.randrange(spec.p)
    expected = local_prove(keys, r1cs, z, r, s)

    pp = pss(spec, 2)
    g1, g2 = curve_g1(), curve_g2()
    ks = jax.random.split(jax.random.PRNGKey(888), 6)
    qap_share = qap_pack(pp, r1cs, z, ks[0])
    crs = pack_proving_key(keys, pp, g1, g2)
    a_share = pack_witness(pp, z[1:], ks[1])
    ax_share = pack_witness(pp, z[r1cs.num_instance :], ks[2])
    r_share = pack_scalar_repeated(pp, r, ks[3])
    s_share = pack_scalar_repeated(pp, s, ks[4])
    masks = ProveMasks.sample(pp, g1, g2, qap_share.dom.n, ks[5])

    def party_state(i):
        return {
            "l": pp.l,
            "crs": crs.party(i),
            "qap": qap_share.party(i),
            "a": a_share[i],
            "ax": ax_share[i],
            "r": r_share[i],
            "s": s_share[i],
            "masks": masks.party(i),
        }

    return pp, g1, g2, keys, r1cs, z, expected, party_state, verify


@pytest.mark.slow
def test_full_prove_over_host_star():
    from zksaas_tpu.comm.host_net import HostStarNet
    from zksaas_tpu.groth16 import d_prove

    pp, g1, g2, keys, r1cs, z, expected, party_state, verify = _dealer()
    n = pp.n
    net = HostStarNet.make_king(n, threshold=pp.t, timeout=TIMEOUT)

    ctx = mp.get_context("spawn")
    procs = [
        ctx.Process(
            target=run_prove_client,
            args=(i, net.port, n, party_state(i), TIMEOUT),
            daemon=True,
        )
        for i in range(1, n)
    ]
    for p in procs:
        p.start()
    try:
        net.accept_all()
        st0 = party_state(0)
        pi_a, pi_b2, pi_c = d_prove(
            pp, g1, g2,
            st0["crs"], st0["qap"], st0["a"], st0["ax"], st0["r"], st0["s"],
            st0["masks"], net, jax.random.PRNGKey(1000),
        )
        stacked = net.round(
            (pi_a, pi_b2, pi_c),
            lambda xs, parties: jax.tree.map(
                lambda a: jnp.broadcast_to(a[None], (n,) + a.shape), xs
            ),
            7,
        )
        sa, sb2, sc = stacked
        a = g1.decode(tuple(c[:1] for c in pp.unpack2_g(g1, sa)))[0]
        b = g2.decode(tuple(c[:1] for c in pp.unpack2_g(g2, sb2)))[0]
        c = g1.decode(tuple(c[:1] for c in pp.unpack2_g(g1, sc)))[0]
        assert a == expected.a, "pi_a mismatch across process boundary"
        assert b == expected.b, "pi_b mismatch across process boundary"
        assert c == expected.c, "pi_c mismatch across process boundary"
        from zksaas_tpu.groth16 import Proof

        assert verify(keys, z[1 : r1cs.num_instance], Proof(a=a, b=b, c=c))
        st = net.stats()
        # 7 protocol rounds (6 fft + degred) + 5 msm rounds + collection
        assert st["rounds"] >= 13
        assert st["bytes_in"] > 0 and st["bytes_out"] > 0
    finally:
        net.close()
        for p in procs:
            p.join(timeout=120)
            assert p.exitcode == 0
