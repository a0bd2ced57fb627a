"""Opt-in persistent XLA compilation cache.

Large Monarch kernels compile for minutes through the TPU relay (the 1M
(16,512,128) forward was observed at ~30 min cold); a persistent cache makes
every rerun of the parity/benchmark/example CLIs hit disk instead. Opt-in
(env ``FLASHFFTCONV_COMPILE_CACHE``, checked at ``import flashfftconv_tpu``)
rather than always-on: unconditionally mutating global JAX config on library
import would leak into host applications, and the experimental axon relay
backend has not been soak-tested with cache serialization.

The reference has no analog (torch.compile/cpp-extension builds cache at the
.so level); this is the JAX-native equivalent.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> bool:
    """Enable JAX's persistent compilation cache; returns True if enabled.

    ``cache_dir`` defaults to ``$FLASHFFTCONV_COMPILE_CACHE`` (a path, or
    "1" for ``~/.cache/flashfftconv_tpu/xla``). No-ops (returns False) when
    the env var is unset and no explicit dir is given, or if configuring the
    cache raises (old jax, read-only fs) — callers never have to guard.
    """
    env = os.environ.get("FLASHFFTCONV_COMPILE_CACHE", "")
    if cache_dir is None:
        if not env:
            return False
        cache_dir = (
            os.path.expanduser("~/.cache/flashfftconv_tpu/xla")
            if env in ("1", "true", "yes")
            else env
        )
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache every program: the big Monarch kernels are exactly the
        # long-compile outliers, but the small ones recompile per process too.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        return True
    except Exception:
        return False
