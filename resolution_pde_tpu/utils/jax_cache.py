"""Persistent XLA compile cache setup, shared by the TPU entry points
(bench.py, the integration demos). On this backend a cold compile can
take minutes; the on-disk cache cuts warm runs to seconds."""

from __future__ import annotations

CACHE_DIR = "/tmp/rpde_jax_cache"


def enable_compile_cache(cache_dir: str = CACHE_DIR) -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the persistent-cache config
