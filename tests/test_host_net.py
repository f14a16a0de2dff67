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


def test_host_star_journal_resume(tmp_path):
    """Checkpoint/resume across REAL processes: a full journaled run,
    then a 'crash' that loses party 3's last record, then a restart in
    which negotiate_resume aligns everyone on the common prefix, the
    agreed rounds replay from disk (no traffic), and only the missing
    round runs live — same result."""
    import os

    import numpy as np

    from hostnet_worker import run_client_journal

    from zksaas_tpu.comm.host_net import HostStarNet
    from zksaas_tpu.comm.journal import JournalNet
    from zksaas_tpu.dist.deg_red import deg_red
    from zksaas_tpu.fields import BN254_FR, field

    n = 4
    pp, x0, mask0, key = dealer_state(0)
    F = field(BN254_FR)
    ctx = mp.get_context("spawn")
    dirs = [str(tmp_path / f"party{i}") for i in range(n)]

    def one_run(resume: bool):
        inner = HostStarNet.make_king(n, threshold=pp.t, timeout=30.0)
        procs = [
            ctx.Process(
                target=run_client_journal,
                args=(i, inner.port, n, dirs[i], resume),
                daemon=True,
            )
            for i in range(1, n)
        ]
        for p in procs:
            p.start()
        net = JournalNet(inner, dirs[0])
        try:
            inner.accept_all()
            if resume:
                net.negotiate_resume()
            out0 = deg_red(pp, x0, mask0, net, key)
            all_shares = net.round(
                out0,
                lambda xs, parties: jnp.broadcast_to(xs[None], (n,) + xs.shape),
                7,
            )
            got = F.decode(pp.unpack(jnp.swapaxes(all_shares, 0, 1)))
            return list(got[0]), net
        finally:
            net.close()
            for p in procs:
                p.join(timeout=60)
                assert p.exitcode == 0

    got1, net1 = one_run(resume=False)
    assert got1 == [49]
    total = net1.rounds
    assert net1._recorded_len() == total

    # crash analog: party 3 never durably finished its last round
    os.unlink(os.path.join(dirs[3], f"round_{total - 1:04d}.ckpt"))

    got2, net2 = one_run(resume=True)
    assert got2 == [49]
    assert net2.replayed == total - 1  # common prefix from disk
    assert net2._recorded_len() == total  # missing round re-recorded
