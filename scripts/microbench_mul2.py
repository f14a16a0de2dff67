"""Deeper mul microbenchmark: separate dispatch overhead from compute.

Chains R kernel calls inside one jit (data-dependent, so they cannot be
elided) and sweeps batch size; the slope vs R gives per-call device time
with host dispatch amortized.
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
from zksaas_tpu.fields.kernel_lib import kernel_field, to_planes
from zksaas_tpu.fields.pallas_mul import montmul_pallas

spec = BN254_FQ
F = field(spec)
K = spec.nlimbs
kf = kernel_field(spec)


def planes_call(a, b):
    def kernel(a_ref, b_ref, o_ref):
        kf.store(o_ref, kf.mm(kf.load(a_ref), kf.load(b_ref)))

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


def chain(fn, r):
    @jax.jit
    def run(a, b):
        x = a
        for _ in range(r):
            x = fn(x, b)
        return x

    return run


def sync(out):
    # axon's block_until_ready is unreliable; a host transfer of one
    # element forces completion of the producing computation
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))


def bench(run, a, b, iters=3):
    sync(run(a, b))
    ts = []
    for _ in range(iters):
        t0 = time.time()
        sync(run(a, b))
        ts.append(time.time() - t0)
    return min(ts)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 18
    print(f"device={jax.devices()[0]}, B={B}, K={K}", flush=True)
    a = F.rand(jax.random.PRNGKey(0), (B,))
    b = F.rand(jax.random.PRNGKey(1), (B,))
    ap, _ = to_planes(a, K)
    bp, _ = to_planes(b, K)
    jax.block_until_ready((a, b, ap, bp))

    for name, fn, (x, y) in [
        ("round1", lambda u, v: montmul_pallas(spec, u, v), (a, b)),
        ("planes", planes_call, (ap, bp)),
    ]:
        t1 = bench(chain(fn, 1), x, y)
        t9 = bench(chain(fn, 9), x, y)
        per_call = (t9 - t1) / 8
        print(
            f"{name}: R=1 {t1*1e3:8.2f} ms  R=9 {t9*1e3:8.2f} ms  "
            f"-> per-call {per_call*1e3:7.2f} ms  {B/per_call/1e6:8.1f} M muls/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
