"""Full distributed Groth16 prove as ONE shard_map mesh program.

The complete d_prove — ext_wit, A, B(G1), the G2 d_msm, and prove_c's
two-MSM round — jitted under shard_map with a party-per-device
sharding, asserted bit-identical to the LocalNet protocol and
pairing-verified.  The assertion lives in examples/spmd_prove.py;
this test runs it in a fresh interpreter for the same XLA:CPU
code-size reasons as test_e2e_prove.py (reference analog: the whole
prove over the production transport, groth16/examples/sha256.rs:159-416).

Status: the shard_map TRACE of the full d_prove is known-good (it
exposed and drove the scalar_mul carry-typing fix in
curves/jcurve.py), but this test's end-to-end run has not completed
in CI yet: XLA:CPU's compile of the 16-limb mat-vec inside the one
fused prove program exceeds an hour on this 4-core box.  Expect the
first run to be very slow; the persistent compile cache makes
subsequent runs fast.
"""

import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_full_prove_under_spmdnet():
    here = os.path.dirname(os.path.abspath(__file__))
    script = os.path.join(here, "..", "examples", "spmd_prove.py")
    r = subprocess.run(
        [sys.executable, script],
        capture_output=True,
        text=True,
        timeout=3600,
        env=dict(os.environ),
    )
    assert r.returncode == 0, (
        f"spmd_prove failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
    )
    assert "mesh proof == LocalNet proof == local proof" in r.stdout
