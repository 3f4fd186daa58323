"""The stale-sink-dir sweep must only ever delete directories it owns.

SPARK_GRAFT_SINK_ROOT may point at a shared scratch directory holding
unrelated data; an unfiltered TTL rmtree there would silently destroy it
(ADVICE r14 medium). The sweep therefore (a) only considers names shaped
like Spark applicationIds, (b) never touches the CURRENT app's dir, and
(c) `app_sink_dir` freshens the live app dir's mtime on every call so a
long session that wrote early and reads late can't be reaped by a sibling
process's sweep (ADVICE r14 low #2).
"""

import os
import time

from sdu_hadoop_indexer_spark import session as S


def _mkdir_old(root: str, name: str, age_s: float) -> str:
    p = os.path.join(root, name)
    os.makedirs(p)
    old = time.time() - age_s
    os.utime(p, (old, old))
    return p


def test_sweep_only_reaps_app_id_shaped_dirs(tmp_path):
    root = str(tmp_path)
    stale_ttl = S._SINK_TTL_S + 3600
    reapable = [
        _mkdir_old(root, "local-1723810000000", stale_ttl),
        _mkdir_old(root, "application_1687000000000_0042", stale_ttl),
        _mkdir_old(root, "app-20230101123456-0001", stale_ttl),
    ]
    kept_foreign = [
        _mkdir_old(root, "my-precious-data", stale_ttl),
        _mkdir_old(root, "local-notanumber", stale_ttl),
        _mkdir_old(root, "2024-backup", stale_ttl),
    ]
    kept_fresh = _mkdir_old(root, "local-999", 60)  # app-shaped but fresh
    kept_self = _mkdir_old(root, "local-111", stale_ttl)  # stale but OURS

    S._swept_roots.discard(root)
    S._sweep_stale_app_dirs(root, keep_app_id="local-111")

    for p in reapable:
        assert not os.path.exists(p), p
    for p in kept_foreign + [kept_fresh, kept_self]:
        assert os.path.exists(p), p


def test_sweep_memoized_per_root(tmp_path):
    root = str(tmp_path)
    S._swept_roots.discard(root)
    S._sweep_stale_app_dirs(root)
    late = _mkdir_old(root, "local-222", S._SINK_TTL_S + 3600)
    S._sweep_stale_app_dirs(root)  # second call is a no-op by design
    assert os.path.exists(late)


def test_app_sink_dir_freshens_own_mtime(tmp_path, monkeypatch, spark):
    root = str(tmp_path)
    monkeypatch.setenv("SPARK_GRAFT_SINK_ROOT", root)
    app_id = spark.sparkContext.applicationId
    stale = S._SINK_TTL_S + 3600
    app_dir = _mkdir_old(root, app_id, stale)
    before = os.stat(app_dir).st_mtime
    S._swept_roots.discard(root)
    path = S.app_sink_dir(spark, "some_sink")
    assert path == f"{root}/{app_id}/some_sink"
    assert os.path.exists(app_dir)  # never reaped, and...
    assert os.stat(app_dir).st_mtime > before  # ...freshened for siblings
