"""Persistent XLA compilation cache bootstrap, shared by the benchmark
drivers (bench.py, bench/cluster_value.py).

Remote-tunnel compiles cost minutes with high variance (same kernel
19 s-8 min through the Mosaic compile service); warm cache entries load
in ~0.2 s. Keyed by HLO hash, so stale entries are simply misses —
always safe to enable."""

from __future__ import annotations

import os


def enable_persistent_cache(path=None):
    """Point jax at the repo-local .xla_cache (or `path`, or the
    MCS_BENCH_XLA_CACHE env override). Best-effort: never raises."""
    import jax

    try:
        if path is None:
            path = os.environ.get(
                "MCS_BENCH_XLA_CACHE",
                os.path.join(
                    os.path.dirname(os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__)))),
                    ".xla_cache",
                ),
            )
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return path
    except Exception:  # noqa: BLE001 - cache is an optimization, never fatal
        return None
