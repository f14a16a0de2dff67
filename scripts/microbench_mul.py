"""Microbenchmark: Montgomery-multiply kernel variants on the real chip.

Compares the round-1 kernel (pallas_mul.py: (TILE, K) blocks, in-kernel
transpose, strided scratch rows) against a planes-layout kernel built on
fields/kernel_lib.py (one (8, 128) vreg per limb, straight-line CIOS).

Run:  python scripts/microbench_mul.py  [B] [iters]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from zksaas_tpu.fields import BN254_FQ, field
from zksaas_tpu.fields.kernel_lib import BLOCK, kernel_field, to_planes, from_planes
from zksaas_tpu.fields.pallas_mul import montmul_pallas


def planes_montmul(spec):
    kf = kernel_field(spec)
    K = kf.K

    def kernel(a_ref, b_ref, o_ref):
        a = kf.load(a_ref)
        b = kf.load(b_ref)
        kf.store(o_ref, kf.mm(a, b))

    @jax.jit
    def mul(a, b):
        """a, b: (K, nb, 8, 128) planes."""
        nb = a.shape[1]
        return pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((K, 1, 8, 128), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, 1, 8, 128), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((K, 1, 8, 128), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
        )(a, b)

    return mul


def timeit(fn, args, iters):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.device_get(jax.tree.leaves(out)[0][..., :1]))
        ts.append(time.time() - t0)
    return min(ts)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spec = BN254_FQ
    F = field(spec)
    K = spec.nlimbs
    print(f"device={jax.devices()[0]}, B={B}, K={K}", flush=True)

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    a = F.rand(key, (B,))
    b = F.rand(jax.random.PRNGKey(1), (B,))
    jax.block_until_ready((a, b))
    print(f"rand done {time.time()-t0:.1f}s", flush=True)

    # correctness cross-check (small prefix)
    n = 1 << 12
    t0 = time.time()
    ref = F.decode(montmul_pallas(spec, a[:n], b[:n]))
    print(f"ref decode done {time.time()-t0:.1f}s", flush=True)

    mulp = planes_montmul(spec)
    ap, _ = to_planes(a[:n], K)
    bp, _ = to_planes(b[:n], K)
    t0 = time.time()
    got = F.decode(from_planes(mulp(ap, bp), n, (n, K)))
    assert (ref == got).all(), "planes kernel mismatch"
    print(f"planes kernel correct on 4096 elements ({time.time()-t0:.1f}s)", flush=True)

    t1 = timeit(lambda x, y: montmul_pallas(spec, x, y), (a, b), iters)
    print(f"round1 (TILE,K) kernel : {t1*1e3:8.2f} ms  {B/t1/1e6:8.1f} M muls/s")

    apf, _ = to_planes(a, K)
    bpf, _ = to_planes(b, K)
    jax.block_until_ready((apf, bpf))
    t2 = timeit(mulp, (apf, bpf), iters)
    print(f"planes vreg kernel     : {t2*1e3:8.2f} ms  {B/t2/1e6:8.1f} M muls/s")

    # include layout conversion cost (what a drop-in Field.mul would pay)
    def mul_conv(x, y):
        xp, _ = to_planes(x, K)
        yp, _ = to_planes(y, K)
        return from_planes(mulp(xp, yp), B, (B, K))

    mc = jax.jit(mul_conv)
    t3 = timeit(mc, (a, b), iters)
    print(f"planes + conversions   : {t3*1e3:8.2f} ms  {B/t3/1e6:8.1f} M muls/s")


if __name__ == "__main__":
    main()
