"""dMSM benchmark sweep (reference: dist-primitives/examples/
{dmsm_bench,msm_bench}.rs — G1 MSM sweep over sizes, n=8 parties).

Runs the full d_msm protocol (8 parties on this chip via LocalNet) and
the raw local MSM kernel at each size; prints one JSON line per size.

Usage: python examples/dmsm_bench.py [log2_min] [log2_max]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from zksaas_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import random

import jax.numpy as jnp
import numpy as np


def main(lo: int = 10, hi: int = 13):
    from zksaas_tpu.comm import LocalNet
    from zksaas_tpu.curves import curve_g1
    from zksaas_tpu.dist import MsmMask, d_msm
    from zksaas_tpu.fields import BN254_FR, field
    from zksaas_tpu.pss import pss

    pp = pss(BN254_FR, 2)
    C = curve_g1()
    F = field(BN254_FR)
    rng = random.Random(5)
    base_pts = [C.ref.rand(rng) for _ in range(8)]
    net = LocalNet(pp.n)
    key = jax.random.PRNGKey(0)

    for log_m in range(lo, hi + 1):
        m = 1 << log_m
        k1, k2, key = jax.random.split(key, 3)
        # dealer packing (det-packed bases, random-packed scalars)
        P = C.encode(base_pts * (m // 8), shape=(m // pp.l, pp.l))
        gshares = pp.det_pack_g(C, P)
        gp = tuple(jnp.swapaxes(c, 0, 1) for c in gshares)  # (n, m/l)
        scal = F.rand(k1, (m // pp.l, pp.l))
        fp = jnp.swapaxes(pp.pack(scal, pp.rand_pads(k1, (m // pp.l,))), 0, 1)
        mask = MsmMask.sample(pp, C, k2)

        from zksaas_tpu.utils.cache import export_cached

        # whole-protocol step as ONE exported program: reruns at any
        # size skip Python tracing (the dominant cold cost)
        def step(gp, fp, in_mask, out_mask):
            mk = type(mask)(in_mask=in_mask, out_mask=out_mask)
            return d_msm(pp, C, gp, fp, mk, net)

        t0 = time.time()
        fn = export_cached(
            f"dmsm-{m}", step, gp, fp, mask.in_mask, mask.out_mask
        )
        out = fn(gp, fp, mask.in_mask, mask.out_mask)
        np.asarray(jax.device_get(out[2]))
        compile_s = time.time() - t0
        t0 = time.time()
        out = fn(gp, fp, mask.in_mask, mask.out_mask)
        np.asarray(jax.device_get(out[2]))
        d_msm_s = time.time() - t0

        # local raw MSM kernel (per-party workload is m/l points x n)
        flatP = tuple(c.reshape((-1,) + c.shape[2:]) for c in gp)
        flats = fp.reshape(-1, F.k)
        msm = export_cached(f"msm-flat-{m}", lambda p, s: C.msm(p, s), flatP, flats)
        np.asarray(jax.device_get(msm(flatP, flats)[2]))
        t0 = time.time()
        np.asarray(jax.device_get(msm(flatP, flats)[2]))
        local_s = time.time() - t0

        print(
            json.dumps(
                {
                    "metric": "dmsm_sweep",
                    "m": m,
                    "d_msm_s": round(d_msm_s, 3),
                    "d_msm_points_per_s": round(m / d_msm_s, 1),
                    "local_msm_s": round(local_s, 3),
                    "compile_s": round(compile_s, 1),
                    "parties": pp.n,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    args = [int(x) for x in sys.argv[1:3]]
    main(*args) if len(args) == 2 else main()
