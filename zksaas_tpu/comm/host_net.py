"""HostStarNet: the protocol `round` interface over the real TCP star.

Each party is its own PROCESS (its own trust domain — the deployment
mode the reference's ProdNet serves, prod.rs).  The king process
gathers serialized shares (with the timeout/threshold/Partial
contract), runs king_fn on the surviving stack, and scatters per-party
slices; clients just serialize/deserialize.

Protocol code (d_fft, deg_red, ...) runs unchanged: under HostStarNet
the party axis is implicit (each process holds its own shard, like
SpmdNet), and king_fn sees exactly the LocalNet gathered layout."""

from __future__ import annotations

import io

import jax
import jax.numpy as jnp
import numpy as np

from .star import StarClient, StarKing


def _ser(x) -> bytes:
    leaves = jax.tree.leaves(x)
    buf = io.BytesIO()
    np.savez(buf, *[np.asarray(jax.device_get(l)) for l in leaves])
    return buf.getvalue()


def _deser_like(data: bytes, like):
    leaves, treedef = jax.tree.flatten(like)
    with np.load(io.BytesIO(data)) as z:
        arrs = [z[k] for k in z.files]
    assert len(arrs) == len(leaves)
    return jax.tree.unflatten(treedef, [jnp.asarray(a) for a in arrs])


class HostStarNet:
    """Per-process star-net party.

    Build with `make_king` / `make_client`; `round(x, king_fn)` takes
    this party's local pytree (no party axis) and returns this party's
    output shard."""

    def __init__(self, n: int, threshold: int, role, my_id: int):
        self.n_parties = n
        self.threshold = threshold
        self.role = role
        self.my_id = my_id
        # observability counters (bytes on the wire + protocol rounds —
        # the reference's print-trace has no such counters, SURVEY §5)
        self.rounds = 0
        self.bytes_out = 0
        self.bytes_in = 0

    def stats(self) -> dict:
        return {
            "rounds": self.rounds,
            "bytes_out": self.bytes_out,
            "bytes_in": self.bytes_in,
        }

    @classmethod
    def make_king(cls, n: int, threshold: int, bind=("127.0.0.1", 0), timeout=30.0, tls_ctx=None):
        king = StarKing(n, bind=bind, timeout=timeout, tls_ctx=tls_ctx)
        return cls(n, threshold, king, 0)

    @property
    def port(self):
        return self.role.port

    def accept_all(self):
        self.role.accept_all()

    @classmethod
    def make_client(cls, n: int, threshold: int, party_id: int, king_addr, timeout=30.0, tls_ctx=None):
        client = StarClient(party_id, king_addr, timeout=timeout, tls_ctx=tls_ctx)
        return cls(n, threshold, client, party_id)

    def round(self, x, king_fn, channel: int = 0):
        assert 0 <= channel < 16, "logical channels 0..15 (wire id aliases otherwise)"
        self.rounds += 1
        channel = channel + 16 * self.rounds  # unique wire channel per round
        if self.my_id == 0:
            rb = self.role.gather(_ser(x), channel, self.threshold)
            shares = [
                _deser_like(s, x) for s in rb.shares if s is not None
            ]
            self.bytes_in += sum(len(s) for s in rb.shares if s is not None)
            stacked = jax.tree.map(lambda *a: jnp.stack(a, axis=0), *shares)
            out = king_fn(stacked, rb.parties)  # leading axis n
            payloads = [None] * self.n_parties
            for pid in range(1, self.n_parties):
                payloads[pid] = _ser(jax.tree.map(lambda a: a[pid], out))
            self.bytes_out += sum(len(p) for p in payloads if p is not None)
            self.role.scatter(payloads, channel)
            return jax.tree.map(lambda a: a[0], out)
        else:
            blob = _ser(x)
            self.bytes_out += len(blob)
            self.role.send(blob, channel)
            data = self.role.recv(channel)
            self.bytes_in += len(data)
            return _deser_like(data, x)

    def close(self):
        self.role.close()
