"""Storage-layout techniques: range-clustered writes produce files
with disjoint min/max ranges on the cluster key — the layout parquet
data skipping (and any format's file pruning) depends on at scale."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.plans.inspect import formatted_plan
from de_project_airflow_etl_spark.tables import load


def test_range_clustered_write_has_disjoint_file_ranges(
        spark, sf_dir, tmp_path):
    out = str(tmp_path / "clustered")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice")
    clustered = (li.repartitionByRange(8, "l_shipdate")
                   .sortWithinPartitions("l_shipdate"))
    # the plan must carry a range exchange (sampling-based partitioner)
    assert "rangepartitioning" in formatted_plan(clustered).lower()
    clustered.write.mode("overwrite").parquet(out)

    # footer stats: file [min,max] intervals on the cluster key must
    # not overlap (modulo boundary duplicates landing in one file) —
    # a predicate on l_shipdate then touches ~1/8 of the files.
    ranges = []
    for f in glob.glob(f"{out}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = [md.schema.column(i).name
               for i in range(md.num_columns)].index("l_shipdate")
        stats = md.row_group(0).column(idx).statistics
        ranges.append((stats.min, stats.max))
    assert len(ranges) >= 4  # the range partitioner actually fanned out
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, (hi1, lo2)


def test_range_clustered_scan_skips_files(spark, sf_dir, tmp_path):
    """A tight filter over the clustered layout must push down to the
    scan so parquet can prune on footer stats."""
    out = str(tmp_path / "clustered2")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    (li.repartitionByRange(8, "l_shipdate")
       .sortWithinPartitions("l_shipdate")
       .write.mode("overwrite").parquet(out))
    df = (spark.read.parquet(out)
               .filter(F.col("l_shipdate") == "1994-01-01"))
    plan = formatted_plan(df)
    assert "PushedFilters" in plan and "l_shipdate" in plan, plan
