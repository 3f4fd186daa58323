"""Session-scoped persisted-artifact memoization.

Several operators rebuild the same intermediate relation on every call —
the MinHash band table (`llm.dedup._lsh_bands`), the blocked all-pairs
replication (`llm.similarity.blocked_pair_groups`). Re-persisting a fresh
copy per call leaks cached partitions into the long-lived gate/bench
session until LRU eviction silently recomputes lineage mid-suite; this
helper pins ONE persisted copy per (application, sf_dir) and unpersists
only genuinely stale entries — dead sessions, or a SUPERSEDED entry for the
same sf_dir. Live entries for OTHER sf_dirs of the same app are kept, so a
caller interleaving SFs (the multi-SF gate loop) does not thrash-recompute
the expensive band/blocked-pair lineage on every switch (round-3 ADVICE).
At cluster scale these artifacts are staged tables (parquet); in-session
they are the engine's pinned build-side relations.
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
    persisting it on first use. Eviction policy: drop entries whose session
    is dead (other applicationId — their executors are gone, the handle is
    unusable) and any previous entry for THIS (app, sf_dir); keep live
    same-app entries for other sf_dirs."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = cache.get(key)
    if cached is not None:
        return cached
    for k in list(cache):
        if k[0] == key[0] and k[1] != sf_dir:
            continue  # live entry for another SF of this app — keep
        try:
            if k[0] == key[0]:
                cache[k].unpersist()
        except Exception:
            pass  # dead session — nothing to release
        del cache[k]
    out = build().persist()
    cache[key] = out
    return out
