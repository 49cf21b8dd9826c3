"""Persistent XLA compilation cache (VERDICT r2 item 4).

Bench-scale graphs compile in 3-10 minutes on the remote compile service
(CLAUDE.md); without a persistent cache every cold process pays that again
for an identical graph.  ``enable_compile_cache()`` points JAX's
compilation cache at a stable on-disk directory so repeat invocations of
``bench.py`` / ``train_ln.py`` / ``__graft_entry__.py`` reuse serialized
executables.

Reference analog: none -- torch caches nothing across processes; this is
a TPU/XLA-stack capability (SURVEY §5.1 iteration-speed concerns).
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.environ.get(
    "TLN_COMPILE_CACHE_DIR", os.path.expanduser("~/.cache/tln_xla_cache")
)


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Enable JAX's persistent compilation cache; returns the cache dir.

    Safe to call multiple times.  No-op on the CPU backend: XLA:CPU AOT
    results embed host "machine features" (incl. pseudo-features like
    +prefer-no-scatter) whose reload check warns per entry and can SIGILL
    on mismatch -- and CPU compiles are fast anyway.  The motivation is the
    remote TPU compile service (minutes per bench-scale graph).
    """
    import jax

    if jax.default_backend() == "cpu":
        return None
    path = cache_dir or DEFAULT_CACHE_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache everything: the tunnel dispatch floor (~31 ms) dwarfs cache
    # lookup cost, and even small graphs pay seconds of remote compile.
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return path
