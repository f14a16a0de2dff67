"""dFFT benchmark (reference harness: dist-primitives/examples/
dfft_test.rs + scripts/dfft_test.zsh; BASELINE config: dFFT size 2^16
over Fr).

Runs the full d_ifft protocol (8 parties on this chip via LocalNet,
fft1 local butterflies + fft2 king round) at one or more sizes and
prints one JSON line per size: elements/sec through the protocol.

Usage: python examples/dfft_bench.py [log2_min] [log2_max]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from zksaas_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp
import numpy as np


def main(lo: int = 16, hi: int = 16):
    from zksaas_tpu.comm import LocalNet
    from zksaas_tpu.dist import d_ifft
    from zksaas_tpu.dist.dfft import FftMask
    from zksaas_tpu.fields import BN254_FR, field
    from zksaas_tpu.ntt import domain
    from zksaas_tpu.pss import pss

    pp = pss(BN254_FR, 2)
    F = field(BN254_FR)
    net = LocalNet(pp.n)
    key = jax.random.PRNGKey(11)

    for log_m in range(lo, hi + 1):
        m = 1 << log_m
        dom = domain(BN254_FR, m)
        k1, k2, k3, key = jax.random.split(key, 4)
        # dealer packing of random evaluations (packed natural order;
        # the protocol's own rearrange handles stride order)
        evals = F.rand(k1, (m // pp.l, pp.l))
        shares = jnp.swapaxes(pp.pack(evals, pp.rand_pads(k2, (m // pp.l,))), 0, 1)
        mask = FftMask.sample(False, 1, dom.group_gen_inv, m, pp, k3)

        from zksaas_tpu.utils.cache import export_cached

        def step(shares, in_mask, out_mask, k):
            mk = FftMask(in_mask=in_mask, out_mask=out_mask)
            return d_ifft(pp, shares, mk, False, dom, 1, net, k)

        t0 = time.time()
        fn = export_cached(
            f"difft-{m}", step, shares, mask.in_mask, mask.out_mask, key
        )
        out = fn(shares, mask.in_mask, mask.out_mask, key)
        np.asarray(jax.device_get(out[0, 0]))
        compile_s = time.time() - t0
        times = []
        for i in range(3):
            kk = jax.random.fold_in(key, i)
            t0 = time.time()
            out = fn(shares, mask.in_mask, mask.out_mask, kk)
            np.asarray(jax.device_get(out[0, 0]))
            times.append(time.time() - t0)
        dt = min(times)
        print(
            json.dumps(
                {
                    "metric": "dfft_elements_per_s",
                    "m": m,
                    "d_ifft_s": round(dt, 4),
                    "elements_per_s": round(m / dt, 1),
                    "compile_s": round(compile_s, 1),
                    "parties": pp.n,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    args = [int(x) for x in sys.argv[1:3]]
    main(*args) if len(args) == 2 else main()
