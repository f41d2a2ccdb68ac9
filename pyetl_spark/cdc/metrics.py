"""Per-batch / per-partition lineage + metrics tables.

Reference parity: the compteur/statistics engine (``Statstore``
formats/interne/stats.py:536-676), per-run stat tables and per-worker
``_wid`` partial stats merged on the master (parallel.py:158-178,516-535),
and the obj/s throughput counters ``perf_r``/``perf_w``
(pyetl.py:1366-1385). Here: every MERGE appends

- one row to ``<table>/_metrics``  (batch-level: events in, dedup survivors,
  buckets touched, rows written, wall ms, events/s), and
- one row per touched bucket to ``<table>/_lineage`` (partition-level:
  events routed to that bucket, upserts vs deletes) — the per-partition
  lineage required by the north_rule.

Both are plain append-only parquet directories (each write lands new files;
no read-modify-write), so metrics writes never contend with data commits.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyetl_spark.cdc.tableio import MergeStats, _bucket_col


def record_batch_metrics(spark: SparkSession, table_root: str, stats: MergeStats) -> None:
    rate = int(stats.events_in / (stats.wall_ms / 1000.0)) if stats.wall_ms else 0
    known = stats.keys_after_dedup >= 0
    row = [
        (
            str(stats.batch_id),
            stats.version,
            stats.events_in,
            stats.keys_after_dedup if known else None,
            (stats.events_in - stats.keys_after_dedup) if known else None,
            stats.buckets_touched,
            stats.rows_written,
            stats.wall_ms,
            rate,
            stats.skipped,
            float(time.time()),
        )
    ]
    schema = (
        "batch_id string, version int, events_in long, keys_upserted long, "
        "dupes_dropped long, buckets_touched int, files_written int, "
        "wall_ms long, events_per_sec long, skipped boolean, ts double"
    )
    spark.createDataFrame(row, schema).coalesce(1).write.mode("append").parquet(
        f"{table_root}/_metrics"
    )


def record_lineage(
    spark: SparkSession,
    table_root: str,
    delta: DataFrame,
    keys: list[str],
    nbuckets: int,
    batch_id: str,
    version: int,
    op_col: str = "op",
) -> None:
    """per-bucket (per-partition) event routing counts for one batch."""
    lin = (
        delta.withColumn("bucket", _bucket_col(keys, nbuckets))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("events_in"),
            F.sum(F.when(F.col(op_col) == "delete", 1).otherwise(0)).alias("deletes"),
            F.sum(F.when(F.col(op_col) != "delete", 1).otherwise(0)).alias("upserts"),
        )
        .withColumn("batch_id", F.lit(str(batch_id)))
        .withColumn("version", F.lit(version))
        .withColumn("ts", F.lit(float(time.time())))
    )
    lin.coalesce(1).write.mode("append").parquet(f"{table_root}/_lineage")


def read_metrics(spark: SparkSession, table_root: str) -> DataFrame:
    return spark.read.parquet(f"{table_root}/_metrics")


def read_lineage(spark: SparkSession, table_root: str) -> DataFrame:
    return spark.read.parquet(f"{table_root}/_lineage")
