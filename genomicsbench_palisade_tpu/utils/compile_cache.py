"""Persistent XLA compilation cache for the CLI drivers.

First compile of a big kernel through the axon relay costs 30-100 s;
bucketed drivers (chain, phmm, fmi) compile one executable per shape
bucket.  Enabling jax's persistent cache makes every rerun start warm.
Called by every CLI main(); safe to call more than once.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.expanduser("~/.cache/genomicsbench_palisade_tpu/xla")


def enable(cache_dir: str | None = None):
    import jax

    path = cache_dir or os.environ.get("GENOMICS_TPU_CACHE_DIR", DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
    return path
