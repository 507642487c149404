"""Persistent XLA compilation cache (opt-in helper).

First compiles of the flagship graphs cost minutes on this host; the
persistent cache makes every identical recompile (re-running bench.py,
re-running an unchanged test file, driver entry checks) near-instant.
Entries are keyed by HLO + compile options + backend, but the cache DIR is
additionally split by the JAX_PLATFORMS env: CPU AOT executables written by
a TPU-plugin-attached process carry different target-machine features
(prefer-no-scatter/gather) than ones from a pure-CPU process, and XLA loads
them cross-process with a SIGILL warning (cpu_aot_loader.cc) — observed
round 5 between the chip bench and the CPU test suite sharing /tmp.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.environ.get("OMNITOK_JIT_CACHE", "/tmp/omnitokenizer-jax-cache")


def enable_persistent_cache(path: str = DEFAULT_DIR) -> None:
    import jax

    plat = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if plat and path == DEFAULT_DIR and "OMNITOK_JIT_CACHE" not in os.environ:
        path = f"{path}-{plat}"
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took noticeable compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax or read-only fs: run without the cache
