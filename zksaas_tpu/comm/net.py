"""The star-topology protocol transport, TPU-native.

The reference's whole communication surface is two collectives on a
king/client star (mpc-net/src/lib.rs:89-176): gather-to-king and
scatter-from-king, with timeout / threshold / surviving-parties
book-keeping for dropouts (ser_net.rs:9-99).  Every distributed
primitive (d_fft, d_msm, deg_red, d_pp) is exactly

    local compute -> gather -> king compute -> scatter -> local compute

so the TPU abstraction here is a single `round(x, king_fn)` primitive
with two interchangeable backends:

* LocalNet — host-level simulator, the LocalTestNet analog
  (mpc-net/src/multi.rs:244-363).  Party data carries an explicit
  leading party axis; `drop` simulates lossy rounds
  (simulate_lossy_network_round, multi.rs:330-363) by withholding
  shares and handing king_fn the surviving-party tuple, which triggers
  the Lagrange reconstruction path exactly like ReceivedShares.parties.

* SpmdNet — the production path: runs inside shard_map over a device
  mesh axis.  gather+scatter collapse into ONE all_gather, and the
  king step is computed redundantly by every device ("replicated
  king").  This is both faster (one collective per round instead of
  two; the king step vectorizes on every chip) and privacy-equivalent:
  the king only ever sees masked values (FftMask/MsmMask/DegRedMask
  blind every unpack, dfft/mod.rs:16-95), so replicating its
  computation reveals nothing a single king would not see.

Channel ids (MultiplexedStreamID, lib.rs:43-53) become advisory tags:
inside one XLA program, overlap of independent protocol instances is
the compiler's latency-hiding job, not a socket-multiplexing concern.

Dropout contract: the surviving-party set is a *static* Python tuple —
membership changes recompile, matching the host-level failure-detection
design (collectives cannot lose members mid-program; see SURVEY §5).
"""

from __future__ import annotations

from typing import Callable, Protocol

import jax
import jax.numpy as jnp
import numpy as np

KingFn = Callable[[object, tuple], object]


class Net(Protocol):
    n_parties: int

    def round(self, x, king_fn: KingFn, channel: int = 0): ...


class LocalNet:
    """In-process n-party simulator (LocalTestNet analog).

    Party data has leading axis n.  king_fn receives the gathered pytree
    restricted to surviving parties plus the party tuple, and must
    return per-party outputs with leading axis n.
    """

    def __init__(self, n: int, drop: tuple = ()):
        self.n_parties = n
        self.drop = tuple(drop)
        # observability counters (the reference's print-trace analog:
        # bytes/rounds were never counted there, SURVEY §5)
        self.rounds = 0
        self.gathered_elems = 0

    @property
    def parties(self) -> tuple:
        return tuple(i for i in range(self.n_parties) if i not in self.drop)

    def round(self, x, king_fn: KingFn, channel: int = 0):
        self.rounds += 1
        for leaf in jax.tree.leaves(x):
            self.gathered_elems += int(np.prod(leaf.shape))
        parties = self.parties
        if self.drop:
            idx = jnp.asarray(parties)
            x = jax.tree.map(lambda a: jnp.take(a, idx, axis=0), x)
        with jax.named_scope(f"king_round_ch{channel}"):
            return king_fn(x, parties)


class SpmdNet:
    """Mesh-parallel star protocol; use inside shard_map(mesh, axis).

    Party data is the per-device shard (no party axis); `round` is one
    all_gather over the mesh axis followed by the (replicated) king
    computation, from which each device slices its own share."""

    def __init__(self, n: int, axis_name: str = "parties"):
        self.n_parties = n
        self.axis = axis_name

    def round(self, x, king_fn: KingFn, channel: int = 0):
        gathered = jax.tree.map(
            lambda a: jax.lax.all_gather(a, self.axis, axis=0), x
        )
        out = king_fn(gathered, tuple(range(self.n_parties)))
        me = jax.lax.axis_index(self.axis)
        return jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(a, me, axis=0, keepdims=False),
            out,
        )
