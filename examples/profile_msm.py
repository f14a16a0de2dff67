"""Component-level on-chip profile of msm_pippenger (bench hot loop).

Times each phase of the flat Pippenger at m=2^14 as independently
jitted units so the 2.58 s/iter regression (BENCH_r02/r03) can be
attributed.  Run on the real chip:  python examples/profile_msm.py
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from zksaas_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from zksaas_tpu.curves import curve_g1
from zksaas_tpu.curves.fused import (
    padd,
    padd_if,
    paddaa,
    pdouble,
    pfmul,
    pinfinity,
    pmadd_if,
    points_to_planes,
)
from zksaas_tpu.curves.pippenger import (
    MAX_VIRT,
    WINDOW,
    _deinter,
    _pbatch_inv,
    _psum_seg,
    _to_affine_planes,
)
from zksaas_tpu.fields import FIELDS, field
from zksaas_tpu.fields.sortperm import sort_u32


def _sync(out):
    # block_until_ready is unreliable on the experimental axon platform;
    # force a real device->host sync by materializing one leaf.
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[..., :1] if leaf.ndim else leaf))


def bench(name, fn, *args, iters=3):
    out = fn(*args)
    _sync(out)
    t0 = time.time()
    out = fn(*args)
    _sync(out)
    compile_or_first = time.time() - t0
    ts = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        _sync(out)
        ts.append(time.time() - t0)
    print(f"{name:40s} {min(ts)*1e3:10.2f} ms   (first {compile_or_first*1e3:.1f} ms)", flush=True)
    return out


def main():
    m = int(os.environ.get("BENCH_MSM_SIZE", 1 << 14))
    family = "bn254"
    C = curve_g1(family)
    F = field(FIELDS[f"{family}_fr"])
    fr = C.fr
    spec = C.R.F.spec
    ncoord = C._ncoord

    rng = random.Random(5)
    base_pts = [C.ref.rand(rng) for _ in range(8)]
    P = C.encode((base_pts * (-(-m // 8)))[:m])
    scalars = F.rand(jax.random.PRNGKey(0), (m,))

    c = WINDOW
    nbits = fr.spec.bits
    n_windows = -(-nbits // c)
    L = m.bit_length() - 1
    WG = 1
    while WG < n_windows and WG.bit_length() + c + L <= 32 and 2 * WG * m <= MAX_VIRT:
        WG *= 2
    n_groups = -(-n_windows // WG)
    V = WG * m
    print(f"m={m} c={c} n_windows={n_windows} WG={WG} n_groups={n_groups} V={V}")

    # --- from_mont ---
    bench("fr.from_mont", jax.jit(fr.from_mont), scalars)

    # --- to planes + affine normalize ---
    Pp, _ = points_to_planes(ncoord, P)
    npl = Pp[0].shape[0]
    to_aff = jax.jit(lambda pp: _to_affine_planes(spec, ncoord, pp))
    xa, ya, infP = bench("_to_affine_planes (m)", to_aff, Pp)
    Pstack = jnp.concatenate([xa, ya], axis=0)

    # --- sort ---
    keys = jax.random.bits(jax.random.PRNGKey(1), (V,), jnp.uint32) >> 1
    bench(f"sort_u32 ({V})", sort_u32, keys)

    # --- gather: take along axis=1 ---
    order = jnp.argsort(jax.random.uniform(jax.random.PRNGKey(2), (V,))).astype(
        jnp.uint32
    ) % m
    gat = jax.jit(lambda ps, o: jnp.take(ps, o, axis=1))
    Sx = bench(f"gather Pstack (2npl={2*npl}, V)", gat, Pstack, order)

    # --- paddaa at V/2 ---
    # deinterleave with _deinter (reshape form), matching the production
    # hot loop: stride-2 lane slices (sx[:, 0::2]) lower into a
    # pathological XLA:TPU relayout — the BENCH_r02/r03 regression —
    # and timing them here would misattribute the shipped code path.
    Sinf = jnp.zeros((V,), jnp.uint32)

    def f_aa_body(sx, si):
        lo, hi = _deinter(sx)
        ilo, ihi = _deinter(si)
        return paddaa(
            spec, ncoord, (lo[:npl], lo[npl:]), (hi[:npl], hi[npl:]), ilo, ihi
        )

    f_aa = jax.jit(f_aa_body)
    lvl1 = bench(f"paddaa width {V//2}", f_aa, Sx, Sinf)
    cur = jnp.concatenate(lvl1, axis=0)

    # --- padd at tree widths ---
    def unstack3(s):
        return tuple(s[i * npl : (i + 1) * npl] for i in range(3))

    def f_add_body(x):
        lo, hi = _deinter(x)
        return jnp.concatenate(
            padd(spec, ncoord, unstack3(lo), unstack3(hi)), axis=0
        )

    f_add = jax.jit(f_add_body)
    w = V // 2
    total_tree = 0.0
    while w > 1:
        t0 = time.time()
        cur2 = f_add(cur)
        _sync(cur2)
        first = time.time() - t0
        t0 = time.time()
        cur2 = f_add(cur)
        _sync(cur2)
        dt = time.time() - t0
        total_tree += dt
        if w in (V // 2, V // 4, 4096, 64, 2):
            print(f"  padd width {w//2:8d}: {dt*1e3:8.2f} ms (first {first*1e3:.1f})", flush=True)
        cur = cur2
        w //= 2
    print(f"tree padd total (sum of levels):         {total_tree*1e3:10.2f} ms", flush=True)

    # --- searchsorted ---
    skeys = jnp.sort(keys)
    targets = jax.random.bits(jax.random.PRNGKey(3), (WG * ((1 << c) - 1),), jnp.uint32) >> 1
    f_ss = jax.jit(lambda sk, t: jnp.searchsorted(sk, t, side="left"))
    bench(f"searchsorted ({V} x {targets.shape[0]})", f_ss, skeys, targets)

    # --- suffix query phase: L+1 gathers + padd_if at width WG*(2^c-1) ---
    Q = WG * ((1 << c) - 1)
    accN = pinfinity(spec, ncoord, Q)
    nodeJ = tuple(x[:, :Q] for x in unstack3(jnp.concatenate(lvl1, axis=0)))
    has = jnp.ones((Q,), bool)
    f_qif = jax.jit(lambda a, n: padd_if(spec, ncoord, has, a, n))
    one = bench(f"padd_if width {Q}", f_qif, accN, nodeJ)
    f_mif = jax.jit(
        lambda a: pmadd_if(spec, ncoord, has, a, (Sx[:npl, :Q], Sx[npl:, :Q]))
    )
    bench(f"pmadd_if width {Q}", f_mif, accN)
    # gathers for query nodes
    lv = jnp.concatenate(lvl1, axis=0)
    idx = jnp.arange(Q, dtype=jnp.int32)
    f_g2 = jax.jit(lambda l: jnp.take(l, idx, axis=1))
    bench(f"query gather (3npl, {V//2}) -> {Q}", f_g2, lv)

    # --- psum_seg ---
    accW = pinfinity(spec, ncoord, Q)
    f_ps = jax.jit(lambda a: _psum_seg(spec, ncoord, a, WG))
    bench(f"_psum_seg {Q} -> {WG}", f_ps, accW)

    # --- batch inversion (affine normalize core) ---
    f_inv = jax.jit(lambda z: _pbatch_inv(spec, ncoord, z))
    bench(f"_pbatch_inv (npl, {m})", f_inv, Pp[2])

    # --- Horner double chain: one pdouble k=8 at width 16 ---
    S16 = pinfinity(spec, ncoord, 16)
    f_db = jax.jit(lambda s: pdouble(spec, ncoord, s, k=8))
    bench("pdouble k=8 width 16", f_db, S16)

    # --- full msm (slowest compile; gate with PROFILE_FULL=0) ---
    if os.environ.get("PROFILE_FULL", "1") == "1":
        msm = jax.jit(C.msm)
        bench("full msm", msm, P, scalars)


if __name__ == "__main__":
    main()
