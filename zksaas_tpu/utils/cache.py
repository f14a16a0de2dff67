"""Persistent XLA compilation cache.

The limb-arithmetic programs here are wide (hundreds of fused uint32
ops per field multiply) and XLA compile time dominates cold starts, so
every entry point (tests, bench, drivers) opts into the on-disk
compiled-executable cache."""

import os


def raise_stack_limit(target: int = 512 << 20) -> None:
    """Raise RLIMIT_STACK: XLA:CPU's LLVM passes recurse deeply on the
    big limb-arithmetic graphs and segfault at the default 8 MB main
    stack (observed compiling curve matvec graphs)."""
    try:
        import resource

        soft, hard = resource.getrlimit(resource.RLIMIT_STACK)
        want = target if hard == resource.RLIM_INFINITY else min(hard, target)
        if soft != resource.RLIM_INFINITY and (want == resource.RLIM_INFINITY or soft < want):
            resource.setrlimit(resource.RLIMIT_STACK, (want, hard))
    except Exception:
        pass


def _source_fingerprint() -> str:
    """Hash of every zksaas_tpu source file — any code change invalidates
    exported traces (cheap: ~10k LoC)."""
    import hashlib

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha256()
    for dirpath, dirnames, filenames in sorted(os.walk(root)):
        dirnames.sort()
        for name in sorted(filenames):
            if name.endswith(".py"):
                with open(os.path.join(dirpath, name), "rb") as f:
                    h.update(f.read())
    return h.hexdigest()[:16]


_EXPORT_DIR_ENV = "ZKSAAS_EXPORT_CACHE"


def export_cached(tag: str, fn, *args):
    """Returns a jitted callable equivalent to jit(fn) for arguments
    shaped like *args, through an on-disk serialized-StableHLO cache.

    The persistent XLA compile cache only skips backend compilation;
    Python TRACING dominates the cold start at bench sizes (measured on
    the m=2^14 MSM: 321 s trace + 53 s lower + 132 s compile).  A hit
    here deserializes the exported StableHLO instead of re-tracing, so
    the warm path is deserialize + (compile-cache-hit) execute.

    Keyed on (tag, arg shapes/dtypes, backend, jax version, a hash of
    every zksaas_tpu source file).  fn must be jittable with array-only
    args (static config must ride the tag)."""
    import jax
    from jax import export as jexport

    base = os.environ.get(_EXPORT_DIR_ENV, "/root/.cache/zksaas_export")
    try:
        os.makedirs(base, exist_ok=True)
    except OSError:
        return jax.jit(fn)
    import hashlib

    avals = jax.tree.map(lambda x: (tuple(x.shape), str(x.dtype)), args)
    key = hashlib.sha256(
        repr(
            (
                tag,
                _source_fingerprint(),
                avals,
                jax.default_backend(),
                jax.__version__,
            )
        ).encode()
    ).hexdigest()[:24]
    path = os.path.join(base, f"{tag}-{key}.stablehlo")
    exp = None
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                exp = jexport.deserialize(f.read())
        except Exception:
            exp = None
    if exp is None:
        exp = jexport.export(jax.jit(fn))(*args)
        try:
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(exp.serialize())
            os.replace(tmp, path)
        except Exception:
            pass
    return jax.jit(exp.call)


def enable_compilation_cache(path: str | None = None) -> None:
    raise_stack_limit()
    import jax

    path = path or os.environ.get("ZKSAAS_JAX_CACHE", "/root/.cache/jax_comp")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception:
        pass  # cache is best-effort
