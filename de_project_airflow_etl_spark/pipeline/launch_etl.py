"""The launch-events pipeline, Spark-native end to end.

Reference parity map (SURVEY.md §2, file:line cites into
/root/reference/):

* ``ingest``     = S1+K1: incremental fetch -> idempotent raw JSON put
  (dags/rocket_launch_etl.py:24-63). Fetch is pluggable: a callable
  returning the API payload (tests inject fixtures; production wires a
  requests-based fetcher — driver-side, exactly like the reference).
* ``transform``  = S2+T1-T4+K2: raw JSON -> explode results ->
  nested-path projection/rename -> to_date(net) -> silver parquet
  partitioned by net (dags/rocket_launch_etl.py:65-111). Where the
  reference needs ``pd.json_normalize``, Spark reads nested structs
  natively; the whole normalize step disappears into ``select``.
* ``publish``    = S3+T5+K3: partition-pruned read of one day ->
  gold parquet (dags/rocket_launch_etl.py:113-140).
* ``register_table`` = D1-D3: external partitioned table over gold +
  partition-metadata sync (src/sql/ddl/launch_events.sql:1-14,
  src/sql/sync/launch_events.sql:1-2). ``MSCK REPAIR`` replaces
  Trino's ``sync_partition_metadata``.
* ``daily_launch_events`` = A1-A3: the flagship COUNT(DISTINCT) query
  (src/sql/query/daily_launch_events.sql:1-5).

Re-run semantics: silver/gold writes use dynamic partition overwrite,
so re-running an interval replaces exactly that partition (upgrade over
the reference's append-on-rerun, SURVEY.md §7.4 — deliberate
divergence, documented).
"""

from __future__ import annotations

import json
import logging
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

log = logging.getLogger(__name__)

# Explicit raw schema (FIXTURES.md §1) — permissive inference would let
# a day where every record lacks `image` silently drop the nested path
# (SURVEY.md §7.4 hard-part #1).
RAW_LAUNCH_SCHEMA = T.StructType([
    T.StructField("count", T.LongType()),
    T.StructField("next", T.StringType()),
    T.StructField("previous", T.StringType()),
    T.StructField("results", T.ArrayType(T.StructType([
        T.StructField("id", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("status", T.StructType([
            T.StructField("name", T.StringType()),
        ])),
        T.StructField("image", T.StructType([
            T.StructField("image_url", T.StringType()),
            T.StructField("license", T.StructType([
                T.StructField("name", T.StringType()),
            ])),
        ])),
        T.StructField("net", T.StringType()),
    ]))),
])

GOLD_COLUMNS = ("id", "url", "name", "status", "image_url", "license", "net")

# Declared zone schema (src/sql/ddl/launch_events.sql:2-8). Reads use it
# explicitly so an empty zone (day with no launches) is still readable —
# schema-on-write by declaration, not by inference.
SILVER_SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("url", T.StringType()),
    T.StructField("name", T.StringType()),
    T.StructField("status", T.StringType()),
    T.StructField("image_url", T.StringType()),
    T.StructField("license", T.StringType()),
    T.StructField("net", T.DateType()),
])

PayloadFetcher = Callable[[str], dict]


def _ensure_dynamic_overwrite(spark: SparkSession) -> None:
    """Defensively force dynamic partition-overwrite semantics.

    Every partitioned ``mode("overwrite")`` write below relies on it; the
    session factory sets it, but these methods also accept an externally
    built session (the driver hands us one), where Spark's default
    STATIC mode would wipe the whole silver/gold directory instead of
    one partition. Runtime-settable, so set it at each write site —
    same defensive pattern as nanosAsLong in ``tables.load``.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")


class LaunchPipeline:
    """Date-parameterized incremental pipeline over a local/posix lake
    layout ``{base}/raw|processed|reports/launch`` (the reference's
    three zones, s3://datalake/... -> file:// for tests; swap the base
    for an s3a:// URI + fs.s3a.* session confs on a real cluster)."""

    def __init__(self, spark: SparkSession, base_dir: str,
                 table_name: str = "launch_events"):
        self.spark = spark
        self.base = base_dir
        self.raw_dir = os.path.join(base_dir, "raw", "launch")
        self.silver_dir = os.path.join(base_dir, "processed", "launch")
        self.gold_dir = os.path.join(base_dir, "reports", "launch")
        self.table_name = table_name

    # -- stage 1: ingest (S1 + K1) ------------------------------------
    def _hadoop_path(self, path_str: str):
        """(FileSystem, Path) for a URI through Spark's Hadoop conf —
        how the raw put reaches s3a://, hdfs://, or file:// zones (the
        reference puts raw JSON to MinIO via s3fs,
        dags/rocket_launch_etl.py:72-76; fs.s3a.* session confs apply
        here automatically)."""
        jvm = self.spark.sparkContext._jvm
        hconf = self.spark.sparkContext._jsc.hadoopConfiguration()
        jpath = jvm.org.apache.hadoop.fs.Path(path_str)
        return jpath.getFileSystem(hconf), jpath

    def ingest(self, run_date: str, fetch: PayloadFetcher) -> str:
        """Fetch the day's payload and put it in the raw zone,
        idempotently (skip if the key exists — reference behavior,
        dags/rocket_launch_etl.py:53-63). Local bare paths use the OS
        directly; URI bases (s3a://, file://, hdfs://) go through the
        Hadoop FileSystem so the same pipeline runs against an object
        store unchanged."""
        path = os.path.join(self.raw_dir, f"{run_date}.json")
        if "://" in self.base:
            fs, jpath = self._hadoop_path(path)
            if fs.exists(jpath):
                log.info("raw key exists, skipping upload: %s", path)
                return path
            payload = fetch(run_date)
            out = fs.create(jpath, False)  # no overwrite: idempotent put
            try:
                out.write(bytearray(json.dumps(payload).encode("utf-8")))
            finally:
                out.close()
            log.info("uploaded raw launch data: %s", path)
            return path
        os.makedirs(self.raw_dir, exist_ok=True)
        if os.path.exists(path):
            log.info("raw key exists, skipping upload: %s", path)
            return path
        payload = fetch(run_date)
        with open(path, "w") as f:
            json.dump(payload, f)
        log.info("uploaded raw launch data: %s", path)
        return path

    # -- stage 2: transform (S2 + T1-T4 + K2) -------------------------
    @staticmethod
    def _flatten(raw: DataFrame) -> DataFrame:
        """T1-T4: unnest results, project/rename nested paths, cast the
        partition key. Shared by the batch and streaming paths."""
        return (
            raw.select(F.explode("results").alias("r"))    # T1 unnest
               .select(                                     # T2+T3 project/rename
                   F.col("r.id").alias("id"),
                   F.col("r.url").alias("url"),
                   F.col("r.name").alias("name"),
                   F.col("r.status.name").alias("status"),
                   F.col("r.image.image_url").alias("image_url"),
                   F.col("r.image.license.name").alias("license"),
                   F.to_date(F.to_timestamp("r.net")).alias("net"),  # T4 cast
               )
        )

    def validate_raw(self, run_date: str) -> int:
        """Count records the declared schema cannot parse (PERMISSIVE
        read with a corrupt-record column). The reference fails only on
        HTTP errors (`raise_for_status`); a lakehouse also needs a gate
        between landing and transform — callers treat a non-zero count
        as a quality failure for the interval."""
        raw_path = os.path.join(self.raw_dir, f"{run_date}.json")
        schema = T.StructType(RAW_LAUNCH_SCHEMA.fields
                              + [T.StructField("_corrupt_record", T.StringType())])
        raw = (self.spark.read
               .schema(schema)
               .option("multiLine", True)
               .option("mode", "PERMISSIVE")
               .option("columnNameOfCorruptRecord", "_corrupt_record")
               .json(raw_path))
        # Spark disallows querying ONLY the corrupt-record column from a
        # raw scan; the documented workaround is to materialize first.
        raw = raw.cache()
        try:
            n_bad = raw.filter(F.col("_corrupt_record").isNotNull()).count()
        finally:
            raw.unpersist()
        if n_bad:
            log.warning("%d corrupt raw document(s) for %s", n_bad, run_date)
        return n_bad

    def transform(self, run_date: str) -> None:
        raw_path = os.path.join(self.raw_dir, f"{run_date}.json")
        raw = (self.spark.read
               .schema(RAW_LAUNCH_SCHEMA)
               .option("multiLine", True)   # one document per file
               .json(raw_path))
        _ensure_dynamic_overwrite(self.spark)
        (self._flatten(raw).write
             .partitionBy("net")          # K2: hive-layout net=YYYY-MM-DD/
             .mode("overwrite")           # dynamic -> replaces only touched partitions
             .parquet(self.silver_dir))
        log.info("silver partition written for %s", run_date)

    def transform_stream(self, checkpoint_dir: str) -> None:
        """Streaming form of the incremental transform (SURVEY §7.2
        item 3): a file-source stream on the raw zone drained with
        ``availableNow``. The checkpoint remembers which raw days were
        processed, so each run touches only newly landed files — the
        streaming-native version of the reference's per-interval
        re-runnable batch (O1-O3), and foreachBatch keeps K2's dynamic
        partition overwrite semantics per micro-batch."""
        raw = (self.spark.readStream
               .schema(RAW_LAUNCH_SCHEMA)
               .option("multiLine", True)
               .option("pathGlobFilter", "*.json")
               .json(self.raw_dir))

        def write_batch(batch_df: DataFrame, _batch_id: int) -> None:
            _ensure_dynamic_overwrite(batch_df.sparkSession)
            (batch_df.write
                     .partitionBy("net")
                     .mode("overwrite")
                     .parquet(self.silver_dir))

        q = (self._flatten(raw).writeStream
                 .foreachBatch(write_batch)
                 .option("checkpointLocation", checkpoint_dir)
                 .trigger(availableNow=True)
                 .start())
        q.awaitTermination()
        self.spark.catalog.refreshByPath(self.silver_dir)
        log.info("streaming transform drained into %s", self.silver_dir)

    # -- stage 3: publish / sign-off (S3 + T5 + K3) -------------------
    def read_silver(self) -> DataFrame:
        return self.spark.read.schema(SILVER_SCHEMA).parquet(self.silver_dir)

    def read_gold(self) -> DataFrame:
        return self.spark.read.schema(SILVER_SCHEMA).parquet(self.gold_dir)

    def publish(self, run_date: str) -> None:
        silver = self.read_silver()
        day = silver.filter(F.col("net") == F.lit(run_date).cast("date"))  # T5 -> partition pruning
        _ensure_dynamic_overwrite(self.spark)
        (day.write
            .partitionBy("net")
            .mode("overwrite")
            .parquet(self.gold_dir))
        # Dynamic overwrite replaced the partition's files on disk; both
        # path readers and the registered table cache file listings —
        # invalidate them (the re-run analog of the reference's
        # partition sync, src/sql/sync/launch_events.sql:2). The table
        # relation cache is keyed by name, so refreshByPath alone is
        # not enough.
        self.spark.catalog.refreshByPath(self.gold_dir)
        if self.spark.catalog.tableExists(self.table_name):
            self.spark.catalog.refreshTable(self.table_name)
        log.info("gold partition published for %s", run_date)

    # -- catalog (D1-D3) ----------------------------------------------
    def register_table(self) -> None:
        """External partitioned table over gold + partition sync
        (Trino `sync_partition_metadata` -> Spark `MSCK REPAIR`)."""
        # Column comments mirror the reference DDL one-for-one
        # (src/sql/ddl/launch_events.sql:2-8).
        self.spark.sql(f"""
            CREATE TABLE IF NOT EXISTS {self.table_name} (
              id STRING COMMENT 'Unique identifier for the event',
              url STRING COMMENT 'URL associated with the event',
              name STRING COMMENT 'Name of the event',
              status STRING COMMENT 'Current status of the event',
              image_url STRING COMMENT 'URL of the event image',
              license STRING COMMENT 'License information'
            )
            USING PARQUET
            PARTITIONED BY (net DATE COMMENT 'Net date for the event')
            LOCATION '{self.gold_dir}'
        """)
        self.sync_partitions()

    def sync_partitions(self) -> None:
        """Register newly-written partition dirs and drop stale file
        listings — Trino's ``sync_partition_metadata('ADD')`` becomes
        ``MSCK REPAIR`` + a metadata cache refresh."""
        self.spark.sql(f"MSCK REPAIR TABLE {self.table_name}")
        self.spark.catalog.refreshTable(self.table_name)

    # -- flagship query (A1-A3) ---------------------------------------
    def daily_launch_events(self) -> DataFrame:
        return (
            self.spark.table(self.table_name)
                .groupBy("net")
                .agg(F.countDistinct("id").alias("event_count"))
        )

    # -- orchestration (O1-O3: linear stage chain per interval) -------
    def run(self, run_date: str, fetch: PayloadFetcher) -> None:
        self.ingest(run_date, fetch)
        self.transform(run_date)
        self.publish(run_date)
