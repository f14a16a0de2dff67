"""Client-party worker for the HostStarNet integration test (spawned
as a separate process — its own trust domain, like a ProdNet peer)."""

import os


def run_client(party_id: int, port: int, n: int, silent: bool):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from zksaas_tpu.comm.host_net import HostStarNet
    from zksaas_tpu.dist.deg_red import DegRedMask, deg_red
    from zksaas_tpu.fields import BN254_FR, field
    from zksaas_tpu.pss import pss

    pp, x_share, mask, key = dealer_state(party_id)
    net = HostStarNet.make_client(
        n, threshold=pp.t, party_id=party_id, king_addr=("127.0.0.1", port), timeout=15.0
    )
    try:
        if silent:
            # simulate a dropped party: skip the protocol send but keep
            # listening — the king times out on us, proceeds Partial via
            # Lagrange, and still scatters us a fresh share
            from zksaas_tpu.comm.host_net import _deser_like
            from zksaas_tpu.fields import BN254_FR, field

            channel = 0 + 16 * 1
            net.rounds = 1
            data = net.role.recv(channel)
            out = field(BN254_FR).add(_deser_like(data, x_share), mask.out_mask)
        else:
            out = deg_red(pp, x_share, mask, net, key)
        # final collection round: everyone learns the full share stack
        net.round(out, lambda xs, parties: jnp.broadcast_to(xs[None], (n,) + xs.shape), 7)
    finally:
        net.close()


def dealer_state(party_id: int):
    """Deterministic dealer computation, recomputed in every process."""
    import jax
    import jax.numpy as jnp

    from zksaas_tpu.dist.deg_red import DegRedMask
    from zksaas_tpu.fields import BN254_FR, field
    from zksaas_tpu.pss import pss

    pp = pss(BN254_FR, 1)  # n = 4 parties
    F = field(BN254_FR)
    key = jax.random.PRNGKey(5)
    k1, k2, k3 = jax.random.split(key, 3)
    secrets = [[7]]
    shares = pp.pack(F.encode(secrets), pp.rand_pads(k1, (1,)))  # (1, n, K)
    mul_shares = F.mul(shares, shares)
    x_all = jnp.swapaxes(mul_shares, 0, 1)  # (n, 1, K)
    mask_all = DegRedMask.sample(pp, 1, k2)
    return pp, x_all[party_id], mask_all.party(party_id), k3


def run_client_journal(party_id: int, port: int, n: int, jdir: str, resume: bool):
    """Journaled client: same deg_red + collection protocol, with every
    round checkpointed to jdir; on resume, negotiate the common prefix
    first and replay it from disk."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from zksaas_tpu.comm.host_net import HostStarNet
    from zksaas_tpu.comm.journal import JournalNet
    from zksaas_tpu.dist.deg_red import deg_red

    pp, x_share, mask, key = dealer_state(party_id)
    inner = HostStarNet.make_client(
        n, threshold=pp.t, party_id=party_id, king_addr=("127.0.0.1", port), timeout=15.0
    )
    net = JournalNet(inner, jdir)
    try:
        if resume:
            net.negotiate_resume()
        out = deg_red(pp, x_share, mask, net, key)
        net.round(out, lambda xs, parties: jnp.broadcast_to(xs[None], (n,) + xs.shape), 7)
    finally:
        net.close()
