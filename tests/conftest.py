"""Test configuration: force an 8-device virtual CPU mesh.

Mirrors the reference's LocalTestNet (mpc-net/src/multi.rs:244-294),
which simulates an n=8-party network in one process: here the 8 parties
are 8 XLA virtual CPU devices so shard_map programs with the production
sharding layout run unmodified in CI.
"""

import os
import sys


# XLA:CPU's LLVM passes overflow the default 8 MB stack on the deepest
# limb-arithmetic graphs (segfault inside backend_compile).  The main
# thread's stack cannot grow past its exec-time limit, so every test
# runs on a worker thread created with a 512 MB stack (see
# pytest_runtest_call below).
import threading

_BIG_STACK = 2 << 30  # 2 GB: BLS12-381/377 (24-limb Fq) graphs overflow 512 MB

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


import pytest


def pytest_configure(config):
    """XLA's internal compile-pool threads take glibc's default stack
    size, captured from RLIMIT_STACK at process start — runtime
    setrlimit cannot reach them.  Re-exec pytest once with the larger
    limit installed, first releasing pytest's fd capture so the child's
    stdout is the real one."""
    try:
        import resource

        if (
            os.environ.get("ZKSAAS_REEXEC") == "1"
            or os.environ.get("PYTEST_XDIST_WORKER")
        ):
            return
        # NB: cannot trust the current soft limit here — modules above
        # already raised it in-process, which does nothing for glibc's
        # default thread stack size (read at process start).  The env
        # marker is the only reliable "already re-exec'd" signal.
        soft, hard = resource.getrlimit(resource.RLIMIT_STACK)
        new = _BIG_STACK if hard == resource.RLIM_INFINITY else min(hard, _BIG_STACK)
        if soft == resource.RLIM_INFINITY:
            return
        resource.setrlimit(resource.RLIMIT_STACK, (max(soft, new), hard))
        capman = config.pluginmanager.getplugin("capturemanager")
        if capman is not None:
            capman.stop_global_capturing()
        os.environ["ZKSAAS_REEXEC"] = "1"
        # use pytest's own record of its args (sys.argv lies when pytest
        # is invoked programmatically)
        args = list(getattr(config, "invocation_params").args)
        os.execv(sys.executable, [sys.executable, "-m", "pytest"] + args)
    except Exception:
        pass


def pytest_sessionstart(session):
    """Warm the pathological XLA:CPU compiles in a clean subprocess
    (see tests/warm_cache.py); the suite then loads them from the
    compilation cache instead of compiling in-process."""
    if (
        os.environ.get("ZKSAAS_NO_WARM") == "1"
        or os.environ.get("PYTEST_XDIST_WORKER")
    ):
        return
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    try:
        subprocess.run(
            [sys.executable, os.path.join(here, "warm_cache.py")],
            timeout=3600,
            check=False,
        )
    except Exception:
        pass


@pytest.hookimpl(wrapper=True)
def pytest_runtest_call(item):
    orig = item.runtest

    def threaded():
        exc = []

        def runner():
            try:
                orig()
            except BaseException as e:  # re-raised on the main thread
                exc.append(e)

        threading.stack_size(_BIG_STACK)
        t = threading.Thread(target=runner, name=f"bigstack-{item.name}")
        t.start()
        t.join()
        threading.stack_size(0)
        if exc:
            raise exc[0]

    item.runtest = threaded
    try:
        return (yield)
    finally:
        item.runtest = orig
