"""Custom stateful streaming operator (applyInPandasWithState): per-key
running CDC stats survive across micro-batches and match a batch oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyetl_spark.cdc import change_events, write_event_batches
from pyetl_spark.cdc.datagen import EVENT_SCHEMA
from pyetl_spark.cdc.stateful import running_key_stats

N, GEN = 2000, dict(n_repos=15, paths_per_repo=8, seed=11)


@pytest.fixture(scope="module")
def stats_rows(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sf_events"))
    write_event_batches(spark, d, N, n_batches=5, **GEN)
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "2")  # force multiple micro-batches
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    q = (
        running_key_stats(stream)
        .writeStream.format("memory")
        .queryName("key_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # update mode emits one row per key per micro-batch → keep the LAST emit
    # per key (micro-batches are appended in order)
    pdf = spark.sql("SELECT * FROM key_stats").toPandas()
    return pdf.groupby(["repo", "path"]).last().reset_index()


def test_stateful_counts_match_batch_oracle(spark, stats_rows):
    ev = change_events(spark, N, **GEN)
    oracle = (
        ev.groupBy("repo", "path")
        .agg(
            F.count("*").alias("events_seen"),
            F.sum(F.when(F.col("op") != "delete", 1).otherwise(0)).alias("upserts"),
            F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)).alias("deletes"),
            F.max("seq").alias("max_seq"),
        )
        .toPandas()
        .groupby(["repo", "path"])
        .last()
        .reset_index()
    )
    got = stats_rows.sort_values(["repo", "path"]).reset_index(drop=True)
    want = oracle.sort_values(["repo", "path"]).reset_index(drop=True)
    assert len(got) == len(want)
    for col in ("events_seen", "upserts", "deletes", "max_seq"):
        assert list(got[col]) == list(want[col]), col


def test_stateful_state_accumulates_across_batches(stats_rows):
    """with maxFilesPerTrigger=2 over 5 files there were >=2 micro-batches;
    totals per key still equal the full count — state carried over."""
    assert stats_rows["events_seen"].sum() == N
