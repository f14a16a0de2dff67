"""Checkpoint/resume of a running proof: a round journal.

Neither the reference nor the paper checkpoints a running proof —
"restart = rerun" (SURVEY §5: no checkpoint/resume on either side).
For production proving jobs that is wasteful: a multi-minute Groth16
prove that dies in its last d_msm round repeats every FFT round too.

The protocol stack makes this easy to fix: EVERY distributed primitive
is a sequence of `net.round(x, king_fn)` calls, each a pure function
of dealer artifacts (shares, masks, PRNG keys) that are durable by
construction.  So a checkpoint is just the per-party log of completed
round outputs:

* `JournalNet` wraps any backend (`LocalNet`, `HostStarNet`).  Each
  completed round's output pytree is written atomically (tmp + rename)
  to `<dir>/round_NNNN.ckpt` before it is returned to the caller.
* On restart, the SAME prover code runs with a fresh `JournalNet` over
  the same directory: recorded rounds replay from disk — no network,
  no king compute — and the first unrecorded round continues live.

Correctness rests on the protocol's determinism: given the same dealer
artifacts the round inputs are bit-identical, so the logged outputs
are exactly what the live round would produce.  (Masked values on the
wire are already uniformly random — the journal leaks nothing beyond
what the party's own transcript already contained; encrypt-at-rest is
the deployment's concern, as for the share files themselves.)

Multi-process resume: after a crash, every party restarts and journals
may have different lengths (the crashed party is typically one round
behind).  `negotiate_resume()` runs one live round — gather journal
lengths to the king, scatter the minimum — and truncates replay to the
common prefix so all parties re-enter live execution on the same
round.  (Wire-channel numbering stays aligned because replayed rounds
never touch the inner net: each party performs the same number of LIVE
rounds.)
"""

from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np


def _record_path(dir_: str, idx: int) -> str:
    return os.path.join(dir_, f"round_{idx:04d}.ckpt")


def _write_atomic(path: str, out) -> None:
    leaves, treedef = jax.tree.flatten(out)
    blob = pickle.dumps(
        (treedef, [np.asarray(jax.device_get(l)) for l in leaves]),
        protocol=pickle.HIGHEST_PROTOCOL,
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)  # atomic: a record exists iff it is complete


def _read(path: str):
    with open(path, "rb") as f:
        treedef, arrs = pickle.load(f)
    return jax.tree.unflatten(treedef, [jnp.asarray(a) for a in arrs])


class JournalNet:
    """Round-journaling wrapper around any star-protocol backend."""

    def __init__(self, inner, dir_: str):
        self.inner = inner
        self.dir = dir_
        os.makedirs(dir_, exist_ok=True)
        self.n_parties = inner.n_parties
        self.rounds = 0  # rounds served (replayed + live)
        self.replayed = 0
        self._limit = self._recorded_len()

    def _recorded_len(self) -> int:
        """Length of the contiguous recorded prefix."""
        n = 0
        while os.path.exists(_record_path(self.dir, n)):
            n += 1
        return n

    def negotiate_resume(self) -> int:
        """Agree on the common journal prefix across parties (call once
        before the proof when resuming a multi-process run).  Runs one
        live round: gather each party's recorded length, scatter the
        minimum; replay is truncated to it.  Returns the resume round."""
        mine = jnp.asarray([self._recorded_len()], dtype=jnp.int32)

        def king_min(stacked, parties):
            m = jnp.min(stacked)
            return jnp.broadcast_to(m, (self.n_parties, 1))

        agreed = int(np.asarray(jax.device_get(self.inner.round(mine, king_min)))[0])
        recorded = self._recorded_len()
        self._limit = min(self._limit, agreed)
        # drop records past the common prefix: they will be re-executed
        # live, and could legitimately differ (e.g. a changed survivor
        # set routes the king through the Lagrange path)
        for i in range(self._limit, recorded):
            os.unlink(_record_path(self.dir, i))
        return self._limit

    def round(self, x, king_fn, channel: int = 0):
        idx = self.rounds
        self.rounds += 1
        path = _record_path(self.dir, idx)
        if idx < self._limit:
            self.replayed += 1
            return _read(path)
        out = self.inner.round(x, king_fn, channel)
        _write_atomic(path, out)
        return out

    def clear(self) -> None:
        """Drop the journal (after the proof is delivered)."""
        n = self._recorded_len()
        for i in range(n):
            os.unlink(_record_path(self.dir, i))
        self._limit = 0

    # passthroughs used by drivers
    def stats(self):
        base = self.inner.stats() if hasattr(self.inner, "stats") else {}
        return {**base, "rounds": self.rounds, "replayed": self.replayed}

    def close(self):
        if hasattr(self.inner, "close"):
            self.inner.close()
