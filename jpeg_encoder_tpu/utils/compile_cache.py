"""Persistent XLA compilation cache for the CLI and other entry points.

The reference binary's whole runtime for a small image is file I/O plus a
few ms of compute (main.rs:8-68); a jit-compiled pipeline that recompiles
from scratch on every process start cannot match that single-shot UX — on
this environment the remote-compile service takes minutes for the fused
pipeline. Wiring jax's persistent compilation cache makes every process
after the first pay only the (sub-second) cache deserialization.

Callers invoke enable() BEFORE the first jit trace. Library users who
manage their own jax.config are unaffected unless they call it.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "jpeg_encoder_tpu", "jax"
)

_enabled = False


def enable(cache_dir: str | None = None) -> str | None:
    """Turn on jax's persistent compilation cache (idempotent).

    Resolution order: explicit argument, $JPEG_TPU_CACHE_DIR, the default
    user cache dir. Set JPEG_TPU_NO_CACHE=1 to disable entirely (returns
    None). Returns the cache directory in use.
    """
    global _enabled
    if os.environ.get("JPEG_TPU_NO_CACHE") == "1":
        return None
    path = cache_dir or os.environ.get("JPEG_TPU_CACHE_DIR") or _DEFAULT_DIR
    if _enabled:
        return path
    os.makedirs(path, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # Cache every compile that costs more than the deserialization itself;
    # the CLI's pipeline programs all take seconds to minutes.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _enabled = True
    return path
