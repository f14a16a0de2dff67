"""Distributed primitives over LocalNet, mirroring the reference's
in-process distributed tests (dist-primitives/src/dfft/tests.rs,
utils/deg_red.rs:142-191, dpp + dmsm examples).

Oracle pattern: (pack -> protocol -> unpack) == local host computation,
with deterministic keys."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zksaas_tpu.comm import LocalNet
from zksaas_tpu.curves import curve_g1
from zksaas_tpu.dist import (
    DegRedMask,
    FftMask,
    MsmMask,
    d_fft,
    d_ifft,
    d_msm,
    d_pp,
    deg_red,
)
from zksaas_tpu.fields import BN254_FR, field
from zksaas_tpu.ntt import domain, fft_ref, ifft_ref
from zksaas_tpu.pss import pss
from zksaas_tpu.utils import rearrange_perm, stride_chunks

SPEC = BN254_FR
L = 2
M = L * 4  # domain size for dfft tests (matches reference tests.rs:18)


@pytest.fixture(scope="module")
def pp():
    return pss(SPEC, L)


def pack_rearranged(pp, vals, key):
    """Reference test input layout: rearrange, stride-chunk, pack
    (tests.rs:29-39). Returns party-major shares (n, m/l, K)."""
    F = pp.F
    m = len(vals)
    x = F.encode(vals)
    x = jnp.asarray(x)[np.asarray(rearrange_perm(m))]
    chunks = stride_chunks(x, pp.l)  # (m/l, l, K)
    shares = pp.pack(chunks, pp.rand_pads(key, (m // pp.l,)))
    return jnp.swapaxes(shares, 0, 1)


def unpack_natural(pp, shares):
    """Unpack party-major shares (n, m/l, K) -> values in natural order
    (chunk j holds elements j*l..j*l+l, per reference test unpack)."""
    sh = jnp.swapaxes(shares, 0, 1)  # (m/l, n, K)
    secrets = pp.unpack(sh)  # (m/l, l, K)
    out = secrets.reshape(-1, pp.F.k)
    return list(pp.F.decode(out))


def test_d_ifft_works(pp):
    """tests.rs:21-79: d_ifft of rearranged evals == local ifft."""
    rng = random.Random(31)
    evals = [rng.randrange(SPEC.p) for _ in range(M)]
    expect = ifft_ref(SPEC, evals)
    dom = domain(SPEC, M)
    key = jax.random.PRNGKey(41)
    k1, k2, k3 = jax.random.split(key, 3)
    shares = pack_rearranged(pp, evals, k1)
    mask = FftMask.sample(False, 1, dom.group_gen_inv, M, pp, k2)
    net = LocalNet(pp.n)
    out = d_ifft(pp, shares, mask, False, dom, 1, net, k3)
    assert unpack_natural(pp, out) == expect


def test_d_fft_works(pp):
    """tests.rs:82-140: d_fft of rearranged coeffs == local fft."""
    rng = random.Random(32)
    coeffs = [rng.randrange(SPEC.p) for _ in range(M)]
    expect = fft_ref(SPEC, coeffs)
    dom = domain(SPEC, M)
    key = jax.random.PRNGKey(42)
    k1, k2, k3 = jax.random.split(key, 3)
    shares = pack_rearranged(pp, coeffs, k1)
    mask = FftMask.sample(False, 1, dom.group_gen, M, pp, k2)
    net = LocalNet(pp.n)
    out = d_fft(pp, shares, mask, False, dom, net, k3)
    assert unpack_natural(pp, out) == coeffs_to_evals(coeffs)


def coeffs_to_evals(coeffs):
    return fft_ref(SPEC, coeffs)


def test_d_ifft_then_d_fft_roundtrip(pp):
    """tests.rs:143-220: ifft (rearrange=True) then fft recovers input."""
    rng = random.Random(33)
    evals = [rng.randrange(SPEC.p) for _ in range(M)]
    dom = domain(SPEC, M)
    key = jax.random.PRNGKey(43)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    shares = pack_rearranged(pp, evals, k1)
    imask = FftMask.sample(True, 1, dom.group_gen_inv, M, pp, k2)
    fmask = FftMask.sample(False, 1, dom.group_gen, M, pp, k3)
    net = LocalNet(pp.n)
    pcoeff = d_ifft(pp, shares, imask, True, dom, 1, net, k4)
    out = d_fft(pp, pcoeff, fmask, False, dom, net, k5)
    assert unpack_natural(pp, out) == evals


def test_coset_chain(pp):
    """tests.rs:223-357: dom-evals -> coset evals -> back."""
    rng = random.Random(34)
    evals = [rng.randrange(SPEC.p) for _ in range(M)]
    dom = domain(SPEC, M)
    coset = dom.get_coset(SPEC.generator)
    key = jax.random.PRNGKey(44)
    ks = jax.random.split(key, 9)
    shares = pack_rearranged(pp, evals, ks[0])
    masks = [
        FftMask.sample(True, coset.offset, dom.group_gen_inv, M, pp, ks[1]),
        FftMask.sample(True, 1, coset.group_gen, M, pp, ks[2]),
        FftMask.sample(True, coset.offset_inv, dom.group_gen_inv, M, pp, ks[3]),
        FftMask.sample(False, 1, coset.group_gen, M, pp, ks[4]),
    ]
    net = LocalNet(pp.n)
    p1 = d_ifft(pp, shares, masks[0], True, dom, coset.offset, net, ks[5])
    coset_evals = d_fft(pp, p1, masks[1], True, dom, net, ks[6])
    p2 = d_ifft(pp, coset_evals, masks[2], True, dom, coset.offset_inv, net, ks[7])
    out = d_fft(pp, p2, masks[3], False, dom, net, ks[8])
    assert unpack_natural(pp, out) == evals


def test_deg_red(pp):
    """deg_red.rs:142-191 incl. the lossy-round variant."""
    F = pp.F
    rng = random.Random(35)
    secrets = [rng.randrange(SPEC.p) for _ in range(L)]
    expected = [(x * x) % SPEC.p for x in secrets]
    key = jax.random.PRNGKey(45)
    k1, k2, k3 = jax.random.split(key, 3)
    shares = pp.pack(F.encode([secrets]), pp.rand_pads(k1, (1,)))  # (1, n, K)
    mul_shares = F.mul(shares, shares)
    x_share = jnp.swapaxes(mul_shares, 0, 1)  # (n, 1, K)
    mask = DegRedMask.sample(pp, 1, k2)

    for drop in ((), (pp.n - 1,)):
        net = LocalNet(pp.n, drop=drop)
        out = deg_red(pp, x_share, mask, net, k3)
        # reconstruct from survivors (shares are degree t+l-1 again)
        sh = jnp.swapaxes(out, 0, 1)
        if drop:
            keep = tuple(i for i in range(pp.n) if i not in drop)
            got = pp.lagrange_unpack(jnp.take(sh, jnp.asarray(keep), axis=1), keep)
        else:
            got = pp.unpack(sh)
        assert list(F.decode(got)[0]) == expected


def test_d_msm(pp):
    """dmsm example (dist-primitives/examples/dmsm_test.rs)."""
    C = curve_g1()
    F = pp.F
    rng = random.Random(36)
    m = 8
    pts = [C.ref.rand(rng) for _ in range(m)]
    scalars = [rng.randrange(SPEC.p) for _ in range(m)]
    expected = C.ref.msm(pts, scalars)
    key = jax.random.PRNGKey(46)
    k1, k2 = jax.random.split(key)

    P = C.encode(pts, shape=(m // L, L))
    gshares = pp.det_pack_g(C, P)  # (m/L, n) points
    gp = tuple(jnp.swapaxes(c, 0, 1) for c in gshares)  # (n, m/L)
    f = F.encode(np.asarray(scalars, dtype=object).reshape(m // L, L))
    fshares = pp.pack(f, pp.rand_pads(k1, (m // L,)))
    fp = jnp.swapaxes(fshares, 0, 1)  # (n, m/L, K)

    mask = MsmMask.sample(pp, C, k2)
    net = LocalNet(pp.n)
    out = d_msm(pp, C, gp, fp, mask, net)  # points (n,)
    secrets = pp.unpack2_g(C, out)
    got = C.decode(tuple(c[:1] for c in secrets))[0]
    assert got == expected


def test_d_pp(pp):
    """dpp example (dist-primitives/examples/dpp_test.rs): partial
    products of num/den."""
    F = pp.F
    rng = random.Random(37)
    m = 2 * L  # two packed sharings
    nums = [rng.randrange(1, SPEC.p) for _ in range(m)]
    dens = [rng.randrange(1, SPEC.p) for _ in range(m)]
    expect = []
    acc = 1
    for x, y in zip(nums, dens):
        acc = acc * x * pow(y, -1, SPEC.p) % SPEC.p
        expect.append(acc)
    key = jax.random.PRNGKey(47)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    nshares = pp.pack(F.encode(np.asarray(nums, dtype=object).reshape(-1, L)), pp.rand_pads(k1, (m // L,)))
    dshares = pp.pack(F.encode(np.asarray(dens, dtype=object).reshape(-1, L)), pp.rand_pads(k2, (m // L,)))
    nshares = jnp.swapaxes(nshares, 0, 1)  # (n, m/L, K)
    dshares = jnp.swapaxes(dshares, 0, 1)
    mask = DegRedMask.sample(pp, m // L, k3)
    net = LocalNet(pp.n)
    out = d_pp(pp, nshares, dshares, mask, net, k4)
    got = unpack_natural(pp, out)
    assert got == expect


def test_d_pp_blinded(pp):
    """d_pp with real telescoping blinding (PpBlind) — the fix for the
    reference's dummy s=1 (dpp/mod.rs:24-26): same partial products,
    while every numerator the king can reconstruct past the first is
    multiplicatively blinded by a random r_{i-1}."""
    from zksaas_tpu.dist import PpBlind

    F = pp.F
    rng = random.Random(39)
    m = 2 * L
    nums = [rng.randrange(1, SPEC.p) for _ in range(m)]
    dens = [rng.randrange(1, SPEC.p) for _ in range(m)]
    expect = []
    acc = 1
    for x, y in zip(nums, dens):
        acc = acc * x * pow(y, -1, SPEC.p) % SPEC.p
        expect.append(acc)
    key = jax.random.PRNGKey(49)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    nshares = pp.pack(F.encode(np.asarray(nums, dtype=object).reshape(-1, L)), pp.rand_pads(k1, (m // L,)))
    dshares = pp.pack(F.encode(np.asarray(dens, dtype=object).reshape(-1, L)), pp.rand_pads(k2, (m // L,)))
    nshares = jnp.swapaxes(nshares, 0, 1)
    dshares = jnp.swapaxes(dshares, 0, 1)
    blind = PpBlind.sample(pp, m // L, k5)
    # what the king can reconstruct from the blinded gather: r_{i-1}*num_i
    vis = list(
        F.decode(
            pp.unpack2(
                jnp.swapaxes(F.mul(nshares, blind.num), 0, 1)
            ).reshape(-1, F.k)
        )
    )
    assert vis[0] == nums[0]  # r_0 = 1 by construction
    assert all(vis[i] != nums[i] for i in range(1, m))  # blinded w.p. 1
    mask = DegRedMask.sample(pp, m // L, k3)
    net = LocalNet(pp.n)
    out = d_pp(pp, nshares, dshares, mask, net, k4, blind=blind)
    got = unpack_natural(pp, out)
    assert got == expect
