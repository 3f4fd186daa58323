"""Z-order layout: multi-dimensional file skipping proven from real footers."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from sdu_hadoop_indexer_spark.operators import scans


def _file_ranges(path_glob):
    """Per-file (min, max) of l_partkey and l_suppkey from parquet footers."""
    out = []
    for f in glob.glob(path_glob):
        md = pq.read_metadata(f)
        pk = [None, None]
        sk = [None, None]
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == "l_partkey":
                    st = col.statistics
                    pk[0] = st.min if pk[0] is None else min(pk[0], st.min)
                    pk[1] = st.max if pk[1] is None else max(pk[1], st.max)
                elif col.path_in_schema == "l_suppkey":
                    st = col.statistics
                    sk[0] = st.min if sk[0] is None else min(sk[0], st.min)
                    sk[1] = st.max if sk[1] is None else max(sk[1], st.max)
        out.append((tuple(pk), tuple(sk)))
    return out


def test_zorder_files_prune_2d_box(spark, sf_dir):
    """Each z-ordered file covers a rectangle of (partkey, suppkey) space, so
    a 2D box predicate must overlap only a strict minority of files — the
    data-skipping property the layout exists for. (A random or
    single-column-sorted layout leaves every file spanning the full range of
    at least one dimension, overlapping everything.)

    Pinned to the sf0.01 fixture: at sf0.001 the suppkey domain is 10 values
    and the probe box covers most of the key space, so there is nothing to
    prune — the property under test is a property of scale."""
    out = scans.write_zorder_layout(spark, "/root/testdata/sf0.01")
    ranges = _file_ranges(f"{out}/part-*.parquet")
    assert len(ranges) >= scans.ZORDER_FILES // 2  # range partitioner kept fan-out
    b = scans.ZORDER_BOX
    overlapping = [
        (pk, sk)
        for pk, sk in ranges
        if pk[0] <= b["pk_hi"] and pk[1] >= b["pk_lo"]
        and sk[0] <= b["sk_hi"] and sk[1] >= b["sk_lo"]
    ]
    assert len(overlapping) < len(ranges), (overlapping, ranges)
    # the box is a small corner of key space: pruning should drop >= half
    assert len(overlapping) <= len(ranges) // 2, (overlapping, ranges)


def test_zorder_roundtrip_lossless(spark, sf_dir):
    """Row count through the layout equals the source count (no loss/dup)."""
    out = scans.write_zorder_layout(spark, sf_dir)
    assert (
        spark.read.parquet(out).count()
        == spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    )
