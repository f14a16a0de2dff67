"""HostStarNet: real multi-process TCP star (ProdNet analog) running
deg_red across 4 party processes, including a timed-out party that the
king tolerates via the Partial/Lagrange path (lib.rs:89-136 +
ser_net.rs semantics)."""

import multiprocessing as mp
import sys

import jax.numpy as jnp
import pytest

sys.path.insert(0, __file__.rsplit("/", 1)[0])

from hostnet_worker import dealer_state, run_client


@pytest.mark.parametrize("lossy", [False, True])
def test_host_star_deg_red(lossy):
    from zksaas_tpu.comm.host_net import HostStarNet
    from zksaas_tpu.dist.deg_red import deg_red
    from zksaas_tpu.fields import BN254_FR, field

    n = 4
    pp, x0, mask0, key = dealer_state(0)
    F = field(BN254_FR)
    net = HostStarNet.make_king(n, threshold=pp.t, timeout=(6.0 if lossy else 30.0))

    ctx = mp.get_context("spawn")
    procs = [
        ctx.Process(
            target=run_client, args=(i, net.port, n, lossy and i == 3), daemon=True
        )
        for i in range(1, n)
    ]
    for p in procs:
        p.start()
    try:
        net.accept_all()
        out0 = deg_red(pp, x0, mask0, net, key)
        # collection round: stack every party's fresh share
        all_shares = net.round(
            out0,
            lambda xs, parties: jnp.broadcast_to(xs[None], (n,) + xs.shape),
            7,
        )  # (n, 1, K)
        got = F.decode(pp.unpack(jnp.swapaxes(all_shares, 0, 1)))
        assert list(got[0]) == [49]
        # observability contract: rounds and wire bytes were counted
        st = net.stats()
        assert st["rounds"] >= 2
        assert st["bytes_in"] > 0 and st["bytes_out"] > 0
    finally:
        net.close()
        for p in procs:
            p.join(timeout=30)
            assert p.exitcode == 0
