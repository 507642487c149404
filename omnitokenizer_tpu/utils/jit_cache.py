"""Persistent XLA compilation cache (opt-in helper).

First compiles of the flagship graphs cost minutes on this host; the
persistent cache makes every identical recompile (re-running bench.py,
re-running an unchanged test file, driver entry checks) near-instant.
Safe on any backend — entries are keyed by HLO + compile options + backend.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.environ.get("OMNITOK_JIT_CACHE", "/tmp/omnitokenizer-jax-cache")


def enable_persistent_cache(path: str = DEFAULT_DIR) -> None:
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took noticeable compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax or read-only fs: run without the cache
