"""Real-chip check + bench of the fused point kernels.

1. Asserts fused add/double/add_if == the composite jnp path on device
   (special cases included).
2. Benches C.msm at BENCH_MSM_SIZE with the fused kernels.
"""

import os
import random
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from zksaas_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from zksaas_tpu.curves import curve_g1, curve_g2
from zksaas_tpu.fields import BN254_FR, field


def sync(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))


def geteq(C, A, B):
    a = [np.asarray(jax.device_get(x)) for x in A]
    b = [np.asarray(jax.device_get(x)) for x in B]
    return all((x == y).all() for x, y in zip(a, b))


def main():
    print(f"device={jax.devices()[0]}", flush=True)
    C = curve_g1()
    F = field(BN254_FR)
    rng = random.Random(1)
    pts = [C.ref.rand(rng) for _ in range(6)]
    P = C.encode([pts[i % 6] for i in range(8)])
    Q = C.encode([pts[(i + 3) % 6] for i in range(8)])
    # specials: double, inf result, P-inf, Q-inf
    Q = tuple(co.at[0].set(po[0]) for co, po in zip(Q, P))
    negP = (P[0], C.R.neg(P[1]), P[2])
    Q = tuple(co.at[1].set(po[1]) for co, po in zip(Q, negP))
    inf = C.infinity((1,))
    P = tuple(co.at[2].set(io[0]) for co, io in zip(P, inf))
    Q = tuple(co.at[3].set(io[0]) for co, io in zip(Q, inf))

    os.environ["ZKSAAS_FUSED"] = "0"
    t0 = time.time()
    ref_add = C.add(P, Q)
    ref_dbl = C.double(P)
    sync((ref_add, ref_dbl))
    print(f"composite path done {time.time()-t0:.1f}s", flush=True)

    os.environ["ZKSAAS_FUSED"] = "1"
    t0 = time.time()
    got_add = C.add(P, Q)
    sync(got_add)
    print(f"fused add compile+run {time.time()-t0:.1f}s", flush=True)
    assert geteq(C, ref_add, got_add), "FUSED ADD MISMATCH"
    t0 = time.time()
    got_dbl = C.double(P)
    sync(got_dbl)
    print(f"fused double compile+run {time.time()-t0:.1f}s", flush=True)
    assert geteq(C, ref_dbl, got_dbl), "FUSED DOUBLE MISMATCH"

    cond = jnp.arange(8) % 2 == 0
    os.environ["ZKSAAS_FUSED"] = "0"
    ref_ai = C.select(cond, C.add(P, Q), P)
    os.environ["ZKSAAS_FUSED"] = "1"
    t0 = time.time()
    got_ai = C.add_if(cond, P, Q)
    sync(got_ai)
    print(f"fused add_if compile+run {time.time()-t0:.1f}s", flush=True)
    assert geteq(C, ref_ai, got_ai), "FUSED ADD_IF MISMATCH"

    # G2
    C2 = curve_g2()
    P2 = C2.encode([C2.ref.rand(rng) for _ in range(4)])
    Q2 = C2.encode([C2.ref.rand(rng) for _ in range(4)])
    os.environ["ZKSAAS_FUSED"] = "0"
    ref2 = C2.add(P2, Q2)
    os.environ["ZKSAAS_FUSED"] = "1"
    t0 = time.time()
    got2 = C2.add(P2, Q2)
    sync(got2)
    print(f"fused G2 add compile+run {time.time()-t0:.1f}s", flush=True)
    assert geteq(C2, ref2, got2), "FUSED G2 ADD MISMATCH"
    print("ALL FUSED KERNELS MATCH", flush=True)

    # MSM correctness: planes-Pippenger vs host big-int oracle (m=256)
    from zksaas_tpu.curves.pippenger import msm_pippenger

    ms = 256
    Ps = C.encode([pts[i % 6] for i in range(ms)])
    ss = F.rand(jax.random.PRNGKey(7), (ms,))
    t0 = time.time()
    got = C.decode(tuple(c[None] for c in msm_pippenger(C, Ps, ss)))[0]
    s_ints = [int(v) for v in F.decode(ss)]
    want = C.ref.msm([pts[i % 6] for i in range(ms)], s_ints)
    assert got == want, f"PIPPENGER MSM MISMATCH: {got} != {want}"
    print(f"pippenger msm == host oracle at m={ms} ({time.time()-t0:.1f}s)", flush=True)

    # general-Z (Jacobian) and infinity inputs through the batch-affine
    # normalization (d_msm feeds packed shares, which have Z != 1)
    Pd = C.double(Ps)
    infs = C.infinity((ms,))
    sel = jnp.arange(ms) % 7 == 0
    Pz = tuple(jnp.where(sel[:, None], i, d) for d, i in zip(Pd, infs))
    t0 = time.time()
    got = C.decode(tuple(c[None] for c in msm_pippenger(C, Pz, ss)))[0]
    want = C.ref.msm(
        [
            None if i % 7 == 0 else C.ref.mul(pts[i % 6], 2)
            for i in range(ms)
        ],
        s_ints,
    )
    assert got == want, f"PIPPENGER Z/INF MSM MISMATCH: {got} != {want}"
    print(f"pippenger msm (general-Z + inf) == oracle ({time.time()-t0:.1f}s)", flush=True)

    # forced scan-path: the deep-tree lax.scan levels (production fast
    # path at bench sizes) under a small scan width so ku < L even at
    # m=256 — covers stale-lane recycling + the ys[l-ku-1] query
    # indexing on the real kernels (CPU-suite versions of these are
    # @slow: the XLA:CPU compiles are prohibitive)
    from zksaas_tpu.curves import pippenger as pip

    old_scanw, old_maxvirt = pip._SCAN_W_MIN, pip.MAX_VIRT
    try:
        pip._SCAN_W_MIN = 256
        jax.clear_caches()
        t0 = time.time()
        got = C.decode(tuple(c[None] for c in msm_pippenger(C, Ps, ss)))[0]
        want = C.ref.msm([pts[i % 6] for i in range(ms)], s_ints)
        assert got == want, f"PIPPENGER SCAN-PATH MISMATCH: {got} != {want}"
        print(f"pippenger msm (forced scan path) == oracle ({time.time()-t0:.1f}s)", flush=True)

        # forced HBM chunking: m > MAX_VIRT splits into sort-sized
        # chunks whose partial MSMs are summed
        pip._SCAN_W_MIN = old_scanw
        pip.MAX_VIRT = 128
        jax.clear_caches()
        t0 = time.time()
        got = C.decode(tuple(c[None] for c in msm_pippenger(C, Ps, ss)))[0]
        assert got == want, f"PIPPENGER CHUNKING MISMATCH: {got} != {want}"
        print(f"pippenger msm (forced chunking) == oracle ({time.time()-t0:.1f}s)", flush=True)
    finally:
        pip._SCAN_W_MIN, pip.MAX_VIRT = old_scanw, old_maxvirt
        jax.clear_caches()

    # MSM bench
    m = int(os.environ.get("BENCH_MSM_SIZE", 1 << 14))
    Pm = C.encode((pts * (-(-m // 6)))[:m])
    scalars = F.rand(jax.random.PRNGKey(0), (m,))
    msm = jax.jit(C.msm)
    t0 = time.time()
    out = msm(Pm, scalars)
    sync(out)
    print(f"msm m={m} compile+first {time.time()-t0:.1f}s", flush=True)
    ts = []
    for i in range(3):
        fresh = F.rand(jax.random.PRNGKey(100 + i), (m,))
        sync(fresh)
        t0 = time.time()
        out = msm(Pm, fresh)
        sync(out)
        ts.append(time.time() - t0)
    dt = min(ts)
    print(f"msm m={m}: {dt*1e3:.1f} ms  -> {m/dt:,.0f} points/s", flush=True)


if __name__ == "__main__":
    main()
