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
from zksaas_tpu.curves import curve_g1
from zksaas_tpu.dist import d_ifft, d_msm, deg_red
from zksaas_tpu.dist.deg_red import DegRedMask
from zksaas_tpu.dist.dfft import FftMask
from zksaas_tpu.dist.dmsm import MsmMask
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


def test_spmd_d_msm_matches_oracle(mesh):
    """d_msm as a real multi-device program (party-per-device shard_map,
    one all_gather round) == host big-int MSM oracle."""
    pp = pss(SPEC, L)
    F = pp.F
    C = curve_g1()
    rng = random.Random(63)
    m = 8
    pts = [C.ref.rand(rng) for _ in range(m)]
    scalars = [rng.randrange(SPEC.p) for _ in range(m)]
    expected = C.ref.msm(pts, scalars)
    key = jax.random.PRNGKey(73)
    k1, k2 = jax.random.split(key)

    Pg = C.encode(pts, shape=(m // L, L))
    gshares = pp.det_pack_g(C, Pg)  # (m/L, n) points
    gp = tuple(jnp.swapaxes(c, 0, 1) for c in gshares)  # (n, m/L)
    f = F.encode(np.asarray(scalars, dtype=object).reshape(m // L, L))
    fp = jnp.swapaxes(pp.pack(f, pp.rand_pads(k1, (m // L,))), 0, 1)
    mask = MsmMask.sample(pp, C, k2)

    net = SpmdNet(N, "parties")
    shard = P("parties")
    ncoord = len(gp)

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            (shard,) * ncoord,
            shard,
            ((shard,) * ncoord, (shard,) * ncoord),
        ),
        out_specs=(shard,) * ncoord,
    )
    def step(bases, scal, mask_arrays):
        mk = MsmMask(
            in_mask=tuple(c[0] for c in mask_arrays[0]),
            out_mask=tuple(c[0] for c in mask_arrays[1]),
        )
        bases = tuple(c[0] for c in bases)
        out = d_msm(pp, C, bases, scal[0], mk, net)
        return tuple(c[None] for c in out)

    out = step(gp, fp, (mask.in_mask, mask.out_mask))
    out = tuple(jnp.asarray(np.asarray(jax.device_get(c))) for c in out)
    secrets = pp.unpack2_g(C, out)
    got = C.decode(tuple(c[:1] for c in secrets))[0]
    assert got == expected


@pytest.mark.parametrize("rearrange,g", [(False, 5), (True, 1)])
def test_spmd_d_ifft_sharded_matches_king(mesh, rearrange, g):
    """m/l divisible by n AND chunks-per-device divisible by l triggers
    the sharded-king fft2 (all_to_all butterflies); output must be
    BIT-identical to the LocalNet king round."""
    from zksaas_tpu.comm import LocalNet

    pp = pss(SPEC, L)
    F = pp.F
    m = 64  # m/l = 32, C = 4, C % l == 0 -> sharded path
    dom = domain(SPEC, m)
    rng = random.Random(65)
    evals = [rng.randrange(SPEC.p) for _ in range(m)]
    key = jax.random.PRNGKey(75)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jnp.asarray(F.encode(evals))[np.asarray(rearrange_perm(m))]
    chunks = stride_chunks(x, pp.l)
    shares = jnp.swapaxes(pp.pack(chunks, pp.rand_pads(k1, (m // pp.l,))), 0, 1)
    mask = FftMask.sample(rearrange, g, dom.group_gen_inv, m, pp, k2)

    want = d_ifft(pp, shares, mask, rearrange, dom, g, LocalNet(pp.n), k3)

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
        mk = FftMask(in_mask=mask_arrays[0][0], out_mask=mask_arrays[1][0])
        return d_ifft(pp, sh[0], mk, rearrange, dom, g, net, key)[None]

    got = step(shares, (mask.in_mask, mask.out_mask), k3)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(got)), np.asarray(jax.device_get(want))
    )


def test_spmd_deg_red_sharded_matches_king(mesh):
    """num % n == 0 triggers the sharded-king path (two all_to_alls);
    output must be BIT-identical to the LocalNet king round."""
    from zksaas_tpu.comm import LocalNet

    pp = pss(SPEC, L)
    F = pp.F
    num = N  # divisible by n -> sharded path
    rng = random.Random(64)
    secrets = [[rng.randrange(SPEC.p) for _ in range(L)] for _ in range(num)]
    key = jax.random.PRNGKey(74)
    k1, k2, k3 = jax.random.split(key, 3)
    shares = pp.pack(F.encode(secrets), pp.rand_pads(k1, (num,)))  # (num, n, K)
    x = jnp.swapaxes(F.mul(shares, shares), 0, 1)  # (n, num, K)
    mask = DegRedMask.sample(pp, num, k2)

    want = deg_red(pp, x, mask, LocalNet(pp.n), k3)  # king path oracle

    net = SpmdNet(N, "parties")
    shard, repl = P("parties"), P()

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(shard, (shard, shard), repl),
        out_specs=shard,
    )
    def step(xs, mask_arrays, key):
        m = DegRedMask(in_mask=mask_arrays[0][0], out_mask=mask_arrays[1][0])
        return deg_red(pp, xs[0], m, net, key)[None]

    got = step(x, (mask.in_mask, mask.out_mask), k3)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(got)), np.asarray(jax.device_get(want))
    )


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
