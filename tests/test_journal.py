"""Checkpoint/resume of a running protocol via the round journal
(zksaas_tpu/comm/journal.py) — the subsystem neither the reference nor
the paper has (SURVEY §5: checkpoint/resume "none; restart = rerun").

Oracle: a journaled run must be bit-identical to the plain run, a full
replay must never touch the network, and a partial journal must resume
with exactly the missing rounds executed live."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zksaas_tpu.comm import LocalNet
from zksaas_tpu.comm.journal import JournalNet
from zksaas_tpu.dist import DegRedMask, FftMask, d_ifft, deg_red
from zksaas_tpu.fields import BN254_FR
from zksaas_tpu.ntt import domain, ifft_ref
from zksaas_tpu.pss import pss

SPEC = BN254_FR
L = 2
M = L * 4


@pytest.fixture(scope="module")
def pp():
    return pss(SPEC, L)


class _PoisonNet:
    """A backend that must never be used (proves full replay is
    network-free)."""

    def __init__(self, n):
        self.n_parties = n

    def round(self, x, king_fn, channel: int = 0):
        raise AssertionError("replay touched the network")


def _pack_rearranged(pp, vals, key):
    """Reference test input layout (tests.rs:29-39): rearrange,
    stride-chunk, pack; party-major (n, m/l, K)."""
    from zksaas_tpu.utils import rearrange_perm, stride_chunks

    F = pp.F
    m = len(vals)
    x = jnp.asarray(F.encode(vals))[np.asarray(rearrange_perm(m))]
    chunks = stride_chunks(x, pp.l)
    shares = pp.pack(chunks, pp.rand_pads(key, (m // pp.l,)))
    return jnp.swapaxes(shares, 0, 1)


def _protocol(pp, net, key):
    """A two-primitive protocol (d_ifft then deg_red of its output):
    multiple rounds through one net, deterministic given the key."""
    rng = random.Random(77)
    evals = [rng.randrange(SPEC.p) for _ in range(M)]
    dom = domain(SPEC, M)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    shares = _pack_rearranged(pp, evals, k1)
    mask = FftMask.sample(False, 1, dom.group_gen_inv, M, pp, k2)
    out = d_ifft(pp, shares, mask, False, dom, 1, net, k3)
    dmask = DegRedMask.sample(pp, out.shape[1], k4)
    out2 = deg_red(pp, out, dmask, net, k5)
    return np.asarray(jax.device_get(out)), np.asarray(jax.device_get(out2))


def test_journal_records_and_is_transparent(pp, tmp_path):
    key = jax.random.PRNGKey(91)
    plain = _protocol(pp, LocalNet(pp.n), key)
    jn = JournalNet(LocalNet(pp.n), str(tmp_path / "j"))
    got = _protocol(pp, jn, key)
    for a, b in zip(plain, got):
        np.testing.assert_array_equal(a, b)
    assert jn.rounds >= 2 and jn.replayed == 0
    assert jn._recorded_len() == jn.rounds


def test_full_replay_is_network_free(pp, tmp_path):
    key = jax.random.PRNGKey(91)
    d = str(tmp_path / "j")
    jn = JournalNet(LocalNet(pp.n), d)
    want = _protocol(pp, jn, key)
    total = jn.rounds

    # fresh process analog: new JournalNet, a net that refuses traffic
    jn2 = JournalNet(_PoisonNet(pp.n), d)
    got = _protocol(pp, jn2, key)
    for a, b in zip(want, got):
        np.testing.assert_array_equal(a, b)
    assert jn2.replayed == total


def test_partial_resume_runs_only_missing_rounds(pp, tmp_path):
    import os

    key = jax.random.PRNGKey(91)
    d = str(tmp_path / "j")
    jn = JournalNet(LocalNet(pp.n), d)
    want = _protocol(pp, jn, key)
    total = jn.rounds

    # crash analog: the last round's record never hit the disk
    os.unlink(d + f"/round_{total - 1:04d}.ckpt")
    live = LocalNet(pp.n)
    jn2 = JournalNet(live, d)
    got = _protocol(pp, jn2, key)
    for a, b in zip(want, got):
        np.testing.assert_array_equal(a, b)
    assert jn2.replayed == total - 1
    assert live.rounds == 1  # exactly the missing round ran live
    assert jn2._recorded_len() == total  # and was re-recorded

    jn2.clear()
    assert jn2._recorded_len() == 0


def test_interrupted_record_is_ignored(pp, tmp_path):
    """A torn write (tmp file present, no rename) must not count as a
    checkpoint."""
    key = jax.random.PRNGKey(91)
    d = str(tmp_path / "j")
    jn = JournalNet(LocalNet(pp.n), d)
    want = _protocol(pp, jn, key)
    total = jn.rounds

    import os

    os.unlink(d + f"/round_{total - 1:04d}.ckpt")
    with open(d + f"/round_{total - 1:04d}.ckpt.tmp", "wb") as f:
        f.write(b"torn")
    jn2 = JournalNet(LocalNet(pp.n), d)
    assert jn2._recorded_len() == total - 1
    got = _protocol(pp, jn2, key)
    for a, b in zip(want, got):
        np.testing.assert_array_equal(a, b)
