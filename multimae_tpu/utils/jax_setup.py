"""Shared JAX runtime setup for all entry points."""

from __future__ import annotations

import os


def setup_jax(cache_dir: str | None = None):
    """Enable the persistent compilation cache (first ViT-B train-step
    compile is minutes through a remote-compile tunnel; cached reruns are
    near-instant) and other prudent defaults. Safe to call repeatedly."""
    import jax

    cache_dir = cache_dir or os.environ.get(
        "MULTIMAE_TPU_COMPILATION_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "multimae_tpu_xla"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # older jax or read-only fs — non-fatal
        print(f"[jax_setup] compilation cache disabled: {e}")
