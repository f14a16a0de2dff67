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
