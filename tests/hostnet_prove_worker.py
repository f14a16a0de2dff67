"""Client-party worker for the full multi-process distributed prove
(spawned process = own trust domain, the ProdNet deployment shape).

Receives its dealer-packed party state as numpy pytrees (pickled by
multiprocessing), runs the entire d_prove protocol over HostStarNet,
and ships its proof shares to the king in a final collection round."""

import os


def run_prove_client(party_id: int, port: int, n: int, state: dict, timeout: float):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from zksaas_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from zksaas_tpu.comm.host_net import HostStarNet
    from zksaas_tpu.curves import curve_g1, curve_g2
    from zksaas_tpu.fields import FIELDS
    from zksaas_tpu.groth16 import d_prove
    from zksaas_tpu.pss import pss

    pp = pss(FIELDS["bn254_fr"], state["l"])
    g1, g2 = curve_g1(), curve_g2()
    net = HostStarNet.make_client(
        n, threshold=pp.t, party_id=party_id,
        king_addr=("127.0.0.1", port), timeout=timeout,
    )
    try:
        pi_a, pi_b2, pi_c = d_prove(
            pp, g1, g2,
            state["crs"], state["qap"], state["a"], state["ax"],
            state["r"], state["s"], state["masks"],
            net, jax.random.PRNGKey(1000 + party_id),
        )
        # collection round: king stacks everyone's proof shares
        net.round(
            (pi_a, pi_b2, pi_c),
            lambda xs, parties: jax.tree.map(
                lambda a: jnp.broadcast_to(a[None], (n,) + a.shape), xs
            ),
            7,
        )
        assert net.stats()["rounds"] >= 10  # 7 fft/degred + 5 msm + collect
    finally:
        net.close()
