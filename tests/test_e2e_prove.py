"""End-to-end distributed Groth16 prove == local prove, verified.

The TPU analog of the reference's flagship integration test
(groth16/examples/sha256.rs): the full assertion lives in
examples/e2e_small.py; this test runs it in a fresh interpreter.
XLA:CPU cannot host the workload inside a long-lived pytest process —
with many JIT'd kernels already loaded, compiling or AOT-loading the
large Fq2 mat-vec executables segfaults — while a fresh process
handles it reliably (run `python examples/e2e_small.py` directly to
see it inline)."""

import os
import subprocess
import sys

import pytest


def _run(family: str, timeout: int = 3600, extra_xla_flags: str = ""):
    here = os.path.dirname(os.path.abspath(__file__))
    script = os.path.join(here, "..", "examples", "e2e_small.py")
    env = dict(os.environ, ZKSAAS_E2E_CURVE=family)
    if extra_xla_flags:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + extra_xla_flags).strip()
    r = subprocess.run(
        [sys.executable, script],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
    )
    assert r.returncode == 0, f"e2e_small failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
    assert "distributed proof == local proof" in r.stdout


@pytest.mark.slow
def test_distributed_prove_matches_local():
    _run("bn254")


@pytest.mark.slow
def test_distributed_prove_matches_local_bls12_381():
    """Full three-curve support: same protocol stack on BLS12-381.

    XLA:CPU's LLVM crashes (libgcc unwind segfault, any stack size)
    optimizing the 24-limb Fq2 matvec body; O0 compiles it reliably
    (slowly - the persistent cache makes reruns fast)."""
    _run("bls12_381", timeout=14400, extra_xla_flags="--xla_backend_optimization_level=0")
