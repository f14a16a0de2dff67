"""Benchmark: distributed-MSM local hot loop, points/sec/chip.

Measures the per-party d_msm local stage (the reference's hot loop,
G::msm at dist-primitives/src/dmsm/mod.rs:73) on this chip: batched
variable-base scalar multiplication over BN254 G1 plus the tree
reduction, exactly the kernel every party runs inside d_msm.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "points/s/chip", "vs_baseline": N}

vs_baseline compares against the self-measured round-1 number stored in
BASELINE_SELF.json (the reference publishes no numbers; BASELINE.md).
"""

import json
import os
import random
import time

import jax

from zksaas_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np


def main():
    m = int(os.environ.get("BENCH_MSM_SIZE", 1 << 14))
    iters = int(os.environ.get("BENCH_ITERS", 3))
    family = os.environ.get("BENCH_CURVE", "bn254")  # bn254 / bls12_381 / bls12_377

    from zksaas_tpu.curves import curve_g1
    from zksaas_tpu.fields import FIELDS, field

    C = curve_g1(family)
    F = field(FIELDS[f"{family}_fr"])

    # bases: a few distinct points tiled to m (host point-gen is slow;
    # the kernel cost is data-independent)
    rng = random.Random(5)
    base_pts = [C.ref.rand(rng) for _ in range(8)]
    P = C.encode((base_pts * (-(-m // 8)))[:m])
    scalars = F.rand(jax.random.PRNGKey(0), (m,))

    # export_cached skips Python tracing on reruns (the dominant cold
    # cost: 321 s trace vs 132 s XLA compile at m=2^14) by
    # deserializing the exported StableHLO; the persistent compile
    # cache then covers the backend compile.
    from zksaas_tpu.utils.cache import export_cached

    t0 = time.time()
    msm = export_cached(f"msm-{family}-{m}", lambda p, s: C.msm(p, s), P, scalars)
    out = msm(P, scalars)
    jax.block_until_ready(out)
    compile_s = time.time() - t0

    # Correctness oracle BEFORE timing (sha256.rs:400-415 pattern): a
    # silently wrong kernel must not produce a benchmark number.  The
    # bases are 8 points tiled cyclically, so the expected value is
    # sum_j (sum of scalars in residue class j mod 8) * base_j — an
    # 8-point host big-int MSM, cheap at any m.
    sc_ints = F.decode(scalars)
    class_sums = [
        sum(sc_ints[j::8]) % C.ref.order for j in range(min(8, m))
    ]
    expect = C.ref.msm(base_pts[: len(class_sums)], class_sums)
    got = C.decode(tuple(c[None] for c in out))[0]
    assert got == expect, "MSM kernel output does not match host oracle"

    times = []
    for i in range(iters):
        fresh = F.rand(jax.random.PRNGKey(100 + i), (m,))  # defeat caching
        np.asarray(jax.device_get(fresh))
        t0 = time.time()
        out = msm(P, fresh)
        # force a real device->host sync (block_until_ready has proven
        # unreliable on the experimental axon platform)
        np.asarray(jax.device_get(out[2]))
        times.append(time.time() - t0)
    dt = min(times)
    pts_per_s = m / dt

    base_path = os.path.join(os.path.dirname(__file__), "BASELINE_SELF.json")
    vs = 1.0
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f).get("dmsm_points_per_s_per_chip")
        if base:
            vs = pts_per_s / base

    print(
        json.dumps(
            {
                "metric": "dmsm_local_msm_points_per_s_per_chip",
                "value": round(pts_per_s, 1),
                "unit": "points/s/chip",
                "vs_baseline": round(vs, 3),
                "detail": {
                    "m": m,
                    "curve": family,
                    "iter_s": round(dt, 4),
                    "compile_s": round(compile_s, 1),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
