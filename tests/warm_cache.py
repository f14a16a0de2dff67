"""Standalone cache warmer for the compiles that XLA:CPU cannot handle
inside the pytest process (nondeterministic LLVM stack overflow on the
largest Fq2 matvec graphs when the process is loaded; the same HLO
compiles fine in a fresh interpreter).  conftest runs this as a
subprocess before the session; afterwards the suite hits the
compilation cache."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

from zksaas_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def main():
    from zksaas_tpu.curves import curve_g1, curve_g2
    from zksaas_tpu.dist.dmsm import MsmMask
    from zksaas_tpu.fields import BN254_FR
    from zksaas_tpu.pss import pss

    pp = pss(BN254_FR, 2)
    MsmMask.sample(pp, curve_g1(), jax.random.PRNGKey(1))
    print("warm: g1 msm mask", flush=True)
    MsmMask.sample(pp, curve_g2(), jax.random.PRNGKey(2))
    print("warm: g2 msm mask", flush=True)


if __name__ == "__main__":
    main()
