"""Single-chip Groth16-shaped baseline (reference: groth16/examples/
local_groth_bench.rs:152-158).

The reference's local cost model runs the prover's FFT+MSM workload in
one process with no networking: 3 coset IFFTs + 3 coset FFTs + the
pointwise h evaluation + 5 MSMs (4 G1 + 1 G2) at m = 2^15.  This is
the single-chip ideal the distributed protocol's overhead is measured
against (d_* adds masks, king rounds, and packing on top of exactly
these kernels).

Prints one JSON line with per-phase and total seconds.

Usage: python examples/local_groth_bench.py   (BENCH_GROTH_SIZE=32768)
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

import numpy as np


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[..., :1] if leaf.ndim else leaf))


def _time(fn, *args, iters=2):
    out = fn(*args)
    _sync(out)
    ts = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        _sync(out)
        ts.append(time.time() - t0)
    return min(ts), out


def main():
    from zksaas_tpu.curves import curve_g1, curve_g2
    from zksaas_tpu.fields import FIELDS, field
    from zksaas_tpu.ntt import domain

    m = int(os.environ.get("BENCH_GROTH_SIZE", 1 << 15))
    family = os.environ.get("BENCH_CURVE", "bn254")
    F = field(FIELDS[f"{family}_fr"])
    g1, g2 = curve_g1(family), curve_g2(family)
    spec = FIELDS[f"{family}_fr"]

    dom = domain(spec, m)
    coset = domain(spec, m, spec.generator)

    key = jax.random.PRNGKey(3)
    ka, kb, kc, ks = jax.random.split(key, 4)
    # a, b, c evaluation vectors (the QAP's three polynomials)
    abc = jax.numpy.stack([F.rand(k, (m,)) for k in (ka, kb, kc)])  # (3, m, K)

    # 3 IFFTs batched on the leading axis (the reference runs them as
    # three concurrent channels; one chip = one batched program)
    t_ifft, coeffs = _time(dom.ifft, abc)
    # 3 coset FFTs
    t_fft, evals = _time(coset.fft, coeffs)

    # pointwise h = a*b - c on the coset (ext_wit.rs:82-86 analog)
    hfn = jax.jit(lambda e: F.sub(F.mul(e[0], e[1]), e[2]))
    t_h, h = _time(hfn, evals)

    # 5 MSMs: 4 G1 + 1 G2, all size m (a_query/h_query/l_query/b_g1 +
    # b_g2 in the reference's prove)
    rng = random.Random(5)
    base1 = [g1.ref.rand(rng) for _ in range(8)]
    base2 = [g2.ref.rand(rng) for _ in range(8)]
    P1 = g1.encode((base1 * (-(-m // 8)))[:m])
    P2 = g2.encode((base2 * (-(-m // 8)))[:m])
    scal = F.rand(ks, (m,))

    msm1 = jax.jit(g1.msm)
    msm2 = jax.jit(g2.msm)
    t_msm_g1, _ = _time(msm1, P1, scal)
    t_msm_g2, _ = _time(msm2, P2, scal)

    total = t_ifft + t_fft + t_h + 4 * t_msm_g1 + t_msm_g2
    print(
        json.dumps(
            {
                "metric": "local_groth_bench_s",
                "value": round(total, 4),
                "unit": "s (3xIFFT + 3xFFT + h + 4xG1 MSM + 1xG2 MSM)",
                "detail": {
                    "m": m,
                    "curve": family,
                    "ifft3_s": round(t_ifft, 4),
                    "fft3_s": round(t_fft, 4),
                    "h_pointwise_s": round(t_h, 4),
                    "msm_g1_s": round(t_msm_g1, 4),
                    "msm_g2_s": round(t_msm_g2, 4),
                    "device": str(jax.devices()[0]),
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
