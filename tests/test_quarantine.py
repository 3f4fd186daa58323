"""Dead-letter quarantine: the two branches partition the input exactly."""

from __future__ import annotations


def test_quarantine_partitions_input(spark, sf_dir):
    from sdu_hadoop_indexer_spark.operators import scans
    from sdu_hadoop_indexer_spark.session import app_sink_dir

    valid = scans.sink_quarantine_split(spark, sf_dir)
    src = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rejected = spark.read.parquet(
        app_sink_dir(spark, "orders_quarantine", "SPARK_GRAFT_QUARANTINE_DIR")
    )
    n_valid, n_rej, n_src = valid.count(), rejected.count(), src.count()
    assert n_rej > 0, "the price cap must quarantine some fixture rows"
    assert n_valid + n_rej == n_src
    # disjoint by key, and every key accounted for
    v_keys = {r.o_orderkey for r in valid.select("o_orderkey").collect()}
    r_keys = {r.o_orderkey for r in rejected.select("o_orderkey").collect()}
    assert not v_keys & r_keys
    assert len(v_keys | r_keys) == n_src
    # every reject carries a reason
    assert rejected.where("violation IS NULL").count() == 0
