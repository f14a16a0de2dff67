"""Phase tracing: the reference's arkworks print-trace analog.

The reference wraps protocol phases in start_timer!/end_timer! spans
(groth16/examples/sha256.rs:58-125, enabled by the print-trace cargo
feature).  Here `span(name)` is both:

* a wall-clock span printed to stderr when ZKSAAS_TRACE=1 (with
  device sync at exit so the time covers the dispatched work), and
* a jax.profiler TraceAnnotation + named_scope, so phases show up in
  TPU profiles regardless of the env flag.

Usage:
    with span("prove.A"):
        pi_a = prove_a(...)
"""

from __future__ import annotations

import contextlib
import os
import sys
import time

import jax

_ENABLED = None


def trace_enabled() -> bool:
    global _ENABLED
    if _ENABLED is None:
        _ENABLED = os.environ.get("ZKSAAS_TRACE", "0") == "1"
    return _ENABLED


_depth = 0


@contextlib.contextmanager
def span(name: str, sync=None):
    """Named phase span.  `sync`: optional thunk returning a pytree
    whose readiness marks the span end (block_until_ready'd before the
    clock stops, so lazy dispatch doesn't understate the phase)."""
    global _depth
    if not trace_enabled():
        with jax.named_scope(name):
            yield
        return
    t0 = time.time()
    _depth += 1
    try:
        with jax.profiler.TraceAnnotation(name), jax.named_scope(name):
            yield
    finally:
        _depth -= 1
        if sync is not None:
            jax.block_until_ready(sync() if callable(sync) else sync)
        dt = time.time() - t0
        print(f"# {'..' * _depth}{name}: {dt*1e3:.1f} ms", file=sys.stderr, flush=True)
