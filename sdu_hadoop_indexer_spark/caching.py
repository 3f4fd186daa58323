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
    pin: bool = True,
) -> DataFrame:
    """Return the cached persisted relation for (app, sf_dir), building and
    persisting it on first use. Eviction policy: on a miss, drop only
    entries from DEAD sessions (other applicationId — their executors are
    gone, the handles are unusable, nothing to unpersist); every live
    entry of the current app (necessarily for other sf_dirs — a same-SF
    entry would have been the hit) is kept, so a multi-SF gate loop never
    thrash-recomputes the expensive band/blocked-pair lineage.

    Two pin forms coexist since r15 (ADVICE r15 — keep them distinct):

    * CORPUS-SHAPED pins (the LSH bands relation, blocked pairs) persist
      the lazy handle (``pin=True``, the default). A checkpoint leaf here
      would freeze the build's AQE-coalesced partitioning — the bands pin
      collapses to ~1 partition and the bucket self-join's pair expansion
      serializes into one task (measured r15: est_quality 1.9 s → 19 s).
    * SMALL EDGE pins (capped edges, near-jaccard/containment edge sets)
      stage a checkpoint LEAF inside ``build`` so multi-branch consumers
      plan against the leaf instead of re-analyzing the full lineage per
      reference. Those builds pass ``pin=False``: the checkpoint blocks
      ARE the pinned storage, and a second ``.persist()`` on top would
      double-store every block (and cache eviction would unpersist only
      the outer handle, never the checkpoint blocks). Executor-loss
      caveat: a leafed pin cannot recompute after executor loss (lineage
      is truncated), so on a real cluster these pins are the staged
      tables a pipeline writes between stages (``stage_round``'s
      ``reliable=True`` form), not localCheckpoints.
    """
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = cache.get(key)
    if cached is not None:
        return cached
    for k in list(cache):
        if k[0] != key[0]:
            del cache[k]
    out = build()
    if pin:
        out = out.persist()
    cache[key] = out
    return out
