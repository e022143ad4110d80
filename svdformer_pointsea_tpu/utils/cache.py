"""Persistent XLA compilation cache setup.

On tunneled/remote-compile TPU backends a single model-sized jit compile
can take minutes; the persistent cache amortizes it across processes and
runs. Call once at entrypoint import time (CLI mains, bench, graft entry).
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "SVDFORMER_TPU_COMPILE_CACHE", "/tmp/svdformer_tpu_xla_cache"
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
