"""Source/sink format breadth: the engine must round-trip its tables
through every bulk format Spark ships (parquet is the lake default and
covered everywhere else; ORC is the columnar alternative, CSV/JSON the
interchange formats with explicit-schema reads)."""

from __future__ import annotations

from pyspark.sql import functions as F

from de_project_airflow_etl_spark.tables import load


def _orders_digest(df):
    """Order-insensitive exact digest of the orders table content."""
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
        F.sum(F.pmod(F.xxhash64("o_orderkey", "o_orderstatus"),
                     F.lit(10**9))).alias("h"),
    ).collect()[0]


def test_orc_round_trip(spark, sf_dir, tmp_path):
    src = load(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_orc")
    src.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.schema == src.schema
    assert _orders_digest(back) == _orders_digest(src)


def test_csv_round_trip_with_schema(spark, sf_dir, tmp_path):
    src = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    out = str(tmp_path / "orders_csv")
    src.write.mode("overwrite").option("header", True).csv(out)
    back = (spark.read.schema(src.schema)  # never infer in production
                 .option("header", True).csv(out))
    assert _orders_digest(back.withColumn("o_totalprice",
                                          F.col("o_totalprice"))) \
        == _orders_digest(src)


def test_json_round_trip_with_schema(spark, sf_dir, tmp_path):
    src = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    out = str(tmp_path / "orders_json")
    src.write.mode("overwrite").json(out)
    back = spark.read.schema(src.schema).json(out)
    assert _orders_digest(back) == _orders_digest(src)


def test_csv_corrupt_record_capture(spark, tmp_path):
    """PERMISSIVE reads must quarantine malformed rows into
    _corrupt_record instead of failing the job — the bulk-load posture
    at scale (fail-fast on 100 TB means one bad row kills hours)."""
    p = tmp_path / "bad.csv"
    p.write_text("k,v\n1,10\nnot_an_int,20\n3,thirty\n")
    df = (spark.read.schema("k INT, v INT, _corrupt_record STRING")
               .option("header", True)
               .option("mode", "PERMISSIVE")
               .option("columnNameOfCorruptRecord", "_corrupt_record")
               .csv(str(p)))
    rows = df.collect()
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    good = [r for r in rows if r["_corrupt_record"] is None]
    assert len(good) == 1 and len(bad) == 2, rows
