"""SpmdNet: the production multi-device path (shard_map over a party
mesh, one all_gather per protocol round, replicated king).

Runs on the 8 virtual CPU devices from conftest and must agree with
the host-simulated LocalNet protocol bit-for-bit."""

import functools
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from zksaas_tpu.comm import SpmdNet
from zksaas_tpu.dist import d_ifft, deg_red
from zksaas_tpu.dist.deg_red import DegRedMask
from zksaas_tpu.dist.dfft import FftMask
from zksaas_tpu.fields import BN254_FR
from zksaas_tpu.ntt import domain, ifft_ref
from zksaas_tpu.pss import pss
from zksaas_tpu.utils import rearrange_perm, stride_chunks

SPEC = BN254_FR
L = 2
N = 4 * L
M = 16


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < N:
        pytest.skip(f"needs {N} devices")
    return jax.make_mesh((N,), ("parties",))


def test_spmd_d_ifft_matches_oracle(mesh):
    pp = pss(SPEC, L)
    F = pp.F
    dom = domain(SPEC, M)
    rng = random.Random(61)
    evals = [rng.randrange(SPEC.p) for _ in range(M)]
    expect = ifft_ref(SPEC, evals)

    key = jax.random.PRNGKey(71)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jnp.asarray(F.encode(evals))[np.asarray(rearrange_perm(M))]
    chunks = stride_chunks(x, pp.l)
    shares = jnp.swapaxes(pp.pack(chunks, pp.rand_pads(k1, (M // pp.l,))), 0, 1)
    mask = FftMask.sample(False, 1, dom.group_gen_inv, M, pp, k2)

    net = SpmdNet(N, "parties")
    shard, repl = P("parties"), P()

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(shard, (shard, shard), repl),
        out_specs=shard,
    )
    def step(sh, mask_arrays, key):
        m = FftMask(in_mask=mask_arrays[0][0], out_mask=mask_arrays[1][0])
        out = d_ifft(pp, sh[0], m, False, dom, 1, net, key)
        return out[None]

    out = jnp.asarray(np.asarray(jax.device_get(step(shares, (mask.in_mask, mask.out_mask), k3))))
    # dealer unpack (natural chunk order)
    secrets = pp.unpack(jnp.swapaxes(out, 0, 1))
    got = list(F.decode(secrets.reshape(-1, F.k)))
    assert got == expect


def test_spmd_deg_red_matches_local(mesh):
    pp = pss(SPEC, L)
    F = pp.F
    rng = random.Random(62)
    secrets = [rng.randrange(SPEC.p) for _ in range(L)]
    expected = [(v * v) % SPEC.p for v in secrets]
    key = jax.random.PRNGKey(72)
    k1, k2, k3 = jax.random.split(key, 3)
    shares = pp.pack(F.encode([secrets]), pp.rand_pads(k1, (1,)))
    mul_shares = jnp.swapaxes(F.mul(shares, shares), 0, 1)  # (n, 1, K)
    mask = DegRedMask.sample(pp, 1, k2)

    net = SpmdNet(N, "parties")
    shard, repl = P("parties"), P()

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(shard, (shard, shard), repl),
        out_specs=shard,
    )
    def step(x, mask_arrays, key):
        m = DegRedMask(in_mask=mask_arrays[0][0], out_mask=mask_arrays[1][0])
        return deg_red(pp, x[0], m, net, key)[None]

    out = jnp.asarray(np.asarray(jax.device_get(step(mul_shares, (mask.in_mask, mask.out_mask), k3))))
    got = pp.unpack(jnp.swapaxes(out, 0, 1))
    assert list(F.decode(got)[0]) == expected
