"""TPU environment helpers.

The axon tunnel makes every XLA compile a network round trip (~minutes for
large programs), so: (1) persist the compilation cache across processes,
(2) keep work inside as few jit boundaries as possible (eager op-by-op
dispatch is pathological here).
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = "/root/.jax_compile_cache"):
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
