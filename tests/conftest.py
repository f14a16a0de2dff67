"""Test configuration: force an 8-device virtual CPU mesh.

Mirrors the reference's LocalTestNet (mpc-net/src/multi.rs:244-294),
which simulates an n=8-party network in one process: here the 8 parties
are 8 XLA virtual CPU devices so shard_map programs with the production
sharding layout run unmodified in CI.
"""

import os
import sys


def _ensure_stack():
    """XLA:CPU's LLVM passes overflow the default 8 MB main-thread
    stack on the deepest limb-arithmetic graphs (segfault inside
    backend_compile).  Raising RLIMIT_STACK at runtime cannot grow the
    already-mapped main stack (mmap base was placed for the old
    limit), so re-exec once with the higher limit installed."""
    try:
        import resource

        want = 512 << 20
        soft, hard = resource.getrlimit(resource.RLIMIT_STACK)
        if (
            soft != resource.RLIM_INFINITY
            and soft < want
            and os.environ.get("ZKSAAS_REEXEC") != "1"
        ):
            new = want if hard == resource.RLIM_INFINITY else min(hard, want)
            resource.setrlimit(resource.RLIMIT_STACK, (new, hard))
            os.environ["ZKSAAS_REEXEC"] = "1"
            os.execv(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:])
    except Exception:
        pass


_ensure_stack()

# force CPU: the ambient environment pins JAX_PLATFORMS=axon (the real
# TPU tunnel); tests must run on the 8-device virtual CPU mesh and must
# not contend for the single tunneled chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compilation cache: the limb-arithmetic graphs are large and
# XLA:CPU compile times dominate the suite; cache compiled executables
# across runs.
import jax

# something in the environment pins jax_platforms to "axon,cpu"
# regardless of JAX_PLATFORMS; force the virtual CPU mesh explicitly
jax.config.update("jax_platforms", "cpu")

from zksaas_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
