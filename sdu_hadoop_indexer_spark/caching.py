"""Session-scoped persisted-artifact memoization.

Several operators rebuild the same intermediate relation on every call —
the MinHash band table (`llm.dedup._lsh_bands`), the blocked all-pairs
replication (`llm.similarity.blocked_pair_groups`). Re-persisting a fresh
copy per call leaks cached partitions into the long-lived gate/bench
session until LRU eviction silently recomputes lineage mid-suite; this
helper pins ONE persisted copy per (application, sf_dir) and unpersists
stale entries (other sf_dir, dead session) on entry. At cluster scale these
artifacts are staged tables (parquet); in-session they are the engine's
pinned build-side relations.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def memoized_persist(
    cache: dict[tuple[str, str], DataFrame],
    spark: SparkSession,
    sf_dir: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return the cached persisted relation for (app, sf_dir), building and
    persisting it on first use; evicts every other entry first."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = cache.get(key)
    if cached is not None:
        return cached
    for k in list(cache):
        try:
            if k[0] == key[0]:
                cache[k].unpersist()
        except Exception:
            pass  # dead session — nothing to release
        del cache[k]
    out = build().persist()
    cache[key] = out
    return out
