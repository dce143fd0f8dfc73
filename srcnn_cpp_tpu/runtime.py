"""Process-level runtime knobs for the TPU backend.

The Axon/TPU environment compiles XLA programs through a remote service with
high first-compile latency and variance (observed 1-500 s per program).  A
persistent on-disk compilation cache makes every shape compile at most once
per machine, which turns the CLI from a batch job into an interactive tool.
"""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT_CACHE = Path(os.environ.get(
    "SRCNN_TPU_CACHE", str(Path.home() / ".cache" / "srcnn_tpu_xla")))


def enable_compilation_cache(path: str | os.PathLike | None = None) -> None:
    """Enable JAX's persistent compilation cache (idempotent)."""
    import jax

    cache_dir = Path(path) if path is not None else _DEFAULT_CACHE
    cache_dir.mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without these flags: non-fatal
