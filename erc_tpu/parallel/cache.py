"""Persistent XLA compilation cache.

First compiles through the axon remote-compile tunnel cost minutes; the
persistent cache makes every later process start instant for unchanged
programs.  Safe to call multiple times.
"""

from __future__ import annotations

import os

_enabled = False


def enable_persistent_cache(path: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    import jax

    try:
        if jax.default_backend() != "tpu":
            # CPU AOT cache entries are machine-feature-specific and can
            # SIGILL across hosts; only the (slow) TPU compiles benefit
            return
    except Exception:
        return
    path = path or os.environ.get(
        "ERC_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/erc_tpu_xla")
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    except Exception:
        pass
