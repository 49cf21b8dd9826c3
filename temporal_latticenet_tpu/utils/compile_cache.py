"""Persistent XLA compilation cache (VERDICT r2 item 4, r3 item 4).

Bench-scale graphs compile in 3-10 minutes on the remote compile service
(CLAUDE.md); without a persistent cache every cold process pays that again
for an identical graph.  ``enable_compile_cache()`` points JAX's
compilation cache at a stable on-disk directory so repeat invocations of
``bench.py`` / ``train_ln.py`` / ``__graft_entry__.py`` reuse serialized
executables.

CPU gets a cache too (r4): the test suite re-jits the same graphs every
run (74-minute suite without it, ~7x faster per-graph with a warm cache).
XLA:CPU AOT results embed the *compile-time* machine-feature list, which
includes XLA pseudo-features (``+prefer-no-scatter``) that never appear in
the host's raw CPUID flags, so the loader logs a scary-but-false
per-entry feature-mismatch ERROR; re-tested on current jax the entries
load and run correctly on the same machine.  To make cross-machine reuse
impossible (the case that genuinely can SIGILL), the CPU cache directory
is scoped by a fingerprint of /proc/cpuinfo's feature flags.

Reference analog: none -- torch caches nothing across processes; this is
a TPU/XLA-stack capability (SURVEY §5.1 iteration-speed concerns).
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.environ.get(
    "TLN_COMPILE_CACHE_DIR", os.path.expanduser("~/.cache/tln_xla_cache")
)


def _machine_tag() -> str:
    """Fingerprint of the host CPU's feature flags (plus arch)."""
    import hashlib
    import platform

    feats = platform.processor() or platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = line.strip()
                    break
    except OSError:
        pass
    return hashlib.sha256(
        (platform.machine() + ":" + feats).encode()).hexdigest()[:12]


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Enable JAX's persistent compilation cache; returns the cache dir.

    Safe to call multiple times.  On the CPU backend the directory is
    suffixed with a machine-feature fingerprint (see module docstring);
    the TPU/remote-compile cache is host-independent.
    """
    import jax

    path = cache_dir or DEFAULT_CACHE_DIR
    if jax.default_backend() == "cpu":
        path = f"{path}_cpu-{_machine_tag()}"
        # the AOT loader logs a false-positive feature-mismatch ERROR per
        # cached entry (XLA pseudo-features never appear in raw CPUID
        # flags).  NOTE (ADVICE r4): on this box jax is pre-imported by an
        # axon sitecustomize, so C++ logging is already initialized and
        # this setdefault is too late to suppress the line -- it only works
        # when exported in the shell BEFORE the interpreter starts.  Kept
        # for environments without the pre-import; the log line is cosmetic.
        os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache everything: the tunnel dispatch floor (~31 ms) dwarfs cache
    # lookup cost, and even small graphs pay seconds of remote compile.
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return path
