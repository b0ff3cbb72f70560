"""Persistent-compilation-cache setup, keyed by the backend build.

The axon TPU tunnel compiles remotely and slowly, so a persistent cache is
essential for re-runs (bench.py, entry()). But AOT-compiled executables are
only valid for the exact libtpu build that produced them: loading an entry
compiled under an older libtpu raises ``FAILED_PRECONDITION: libtpu version
mismatch`` (this killed the round-1 multichip artifact). Keying the cache
directory by the backend's ``platform_version`` makes a mid-flight libtpu
upgrade start a fresh cache instead of serving stale executables.
"""

from __future__ import annotations

import hashlib
import os

import jax


def enable_persistent_cache(root: str | None = None) -> str | None:
    """Enable the persistent compilation cache under ``root`` for TPU backends.

    ``root=None`` → ``<repo>/.jax_cache`` (derived from this package's path),
    so tools share bench.py's warm cache regardless of cwd.

    Returns the cache directory, or None if the backend is not a TPU (CPU AOT
    entries are machine-feature-pinned and only emit loader warnings) or the
    backend cannot be initialized.
    """
    if root is None:
        root = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache",
        )
    try:
        dev = jax.devices()[0]
    except Exception:  # pragma: no cover - no backend at all
        return None
    if dev.platform not in ("tpu", "axon"):
        return None
    version = str(getattr(dev.client, "platform_version", "unknown"))
    tag = hashlib.sha1(version.encode()).hexdigest()[:12]
    cache_dir = os.path.join(root, tag)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
