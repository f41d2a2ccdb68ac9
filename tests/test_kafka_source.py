"""Kafka-shaped source adapter: envelope roundtrip, corrupt-payload
dead-lettering, and the full ingest path over a simulated topic reaching
the same table state as the direct file tail."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyetl_spark.cdc import SnapshotTable, change_events, replay_oracle
from pyetl_spark.cdc.kafka_source import (
    KAFKA_ENVELOPE_SCHEMA,
    events_to_envelope,
    kafka_ingest,
    parse_kafka_envelope,
    write_kafka_envelope_batches,
)
from pyetl_spark.cdc.oracle import content_hashes

N_EVENTS = 2000
GEN = dict(n_repos=25, paths_per_repo=15, seed=42)


@pytest.fixture(scope="module")
def events(spark):
    return change_events(spark, N_EVENTS, **GEN)


@pytest.fixture(scope="module")
def topic_dir(spark, events, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("topic"))
    total = write_kafka_envelope_batches(spark, events, d, n_batches=4)
    assert total == N_EVENTS
    return d


def test_envelope_schema_and_roundtrip(spark, events):
    env = events_to_envelope(events)
    assert env.schema.simpleString() == (
        "struct<key:binary,value:binary,topic:string,partition:int,"
        "offset:bigint,timestamp:timestamp,timestampType:int>"
    )
    parsed = parse_kafka_envelope(env, keep_meta=False)
    a = events.orderBy("seq").toPandas()
    b = parsed.drop("_corrupt", "_tombstone").orderBy("seq").toPandas()[a.columns.tolist()]
    assert a.equals(b)


def test_partitioning_is_key_deterministic(spark, events):
    # Kafka contract: same key -> same partition (ordering per key survives)
    env = events_to_envelope(events, n_partitions=8)
    npart = (
        env.groupBy("key").agg(F.count_distinct("partition").alias("n"))
        .agg(F.max("n")).collect()[0][0]
    )
    assert npart == 1


def test_corrupt_payload_flagged_not_dropped(spark, events):
    env = events_to_envelope(events.limit(10))
    bad = env.withColumn(
        "value",
        F.when(F.col("offset") == 3, F.lit(b"{not json")).otherwise(F.col("value")),
    )
    parsed = parse_kafka_envelope(bad)
    assert parsed.count() == 10
    flagged = parsed.filter("_corrupt").select("_offset").collect()
    assert [r[0] for r in flagged] == [3]
    # corrupt row keeps its kafka identity for dead-lettering
    assert parsed.filter("_corrupt").select("repo").collect()[0][0] is None


def test_kafka_ingest_matches_oracle_and_is_exactly_once(
    spark, events, topic_dir, tmp_path
):
    table = SnapshotTable.create(
        spark, str(tmp_path / "t"), keys=["repo", "path"], nbuckets=8
    )
    ingest = kafka_ingest(spark, topic_dir, table, str(tmp_path / "ckpt"))
    ingest.run_until_drained()
    got = (
        table.read_raw()
        .filter(~F.col("_deleted"))
        .orderBy("repo", "path")
        .toPandas()
        .reset_index(drop=True)
    )
    expected = replay_oracle(change_events(spark, N_EVENTS, **GEN).toPandas())
    assert content_hashes(got) == content_hashes(expected)
    v = table.current_version()
    # drained topic: a re-run discovers nothing new and commits nothing
    ingest2 = kafka_ingest(spark, topic_dir, table, str(tmp_path / "ckpt"))
    ingest2.run_until_drained()
    assert table.current_version() == v


def test_dead_letter_clean_replay_voids_stale_partition(spark, events, topic_dir, tmp_path):
    """idempotency must hold for the ZERO-bad case too (ADVICE r03): a
    replayed epoch that now parses clean (e.g. after a value_schema fix)
    must void its previous attempt's dead-letter partition AND its
    driver-side count, not leave them standing."""
    import os

    table = SnapshotTable.create(spark, str(tmp_path / "t"), keys=["repo", "path"], nbuckets=4)
    dl_dir = str(tmp_path / "dl")
    ingest = kafka_ingest(
        spark, topic_dir, table, str(tmp_path / "ckpt"), dead_letter_dir=dl_dir
    )
    env = events_to_envelope(events.limit(10))
    corrupt = env.withColumn(
        "value",
        F.when(F.col("offset") < 3, F.lit(b"{not json")).otherwise(F.col("value")),
    )
    # first attempt of epoch 7: 3 corrupt rows land in the dead letter
    ingest.transform(corrupt, 7)
    assert os.path.isdir(f"{dl_dir}/batch=7")
    assert spark.read.parquet(f"{dl_dir}/batch=7").count() == 3
    assert ingest.dead_letters == [{"batch": 7, "corrupt": 3}]
    # replay of epoch 7 parses clean: stale partition removed, count voided
    ingest.transform(env, 7)
    assert not os.path.isdir(f"{dl_dir}/batch=7")
    assert ingest.dead_letters == []
    # replay with FEWER bad rows: latest attempt wins, overwrite not append
    ingest.transform(
        env.withColumn(
            "value",
            F.when(F.col("offset") == 0, F.lit(b"xx")).otherwise(F.col("value")),
        ),
        7,
    )
    assert spark.read.parquet(f"{dl_dir}/batch=7").count() == 1
    assert ingest.dead_letters == [{"batch": 7, "corrupt": 1}]


def test_tombstone_routed_not_merged(spark, events):
    """null-value records are deletion markers, not corrupt rows, and must
    not reach the MERGE as null-key upserts."""
    env = events_to_envelope(events.limit(5))
    withnull = env.withColumn(
        "value", F.when(F.col("offset") == 2, F.lit(None).cast("binary")).otherwise(F.col("value"))
    )
    parsed = parse_kafka_envelope(withnull)
    flags = {r["_offset"]: (r["_corrupt"], r["_tombstone"]) for r in parsed.collect()}
    assert flags[2] == (False, True)
    assert all(not c and not t for o, (c, t) in flags.items() if o != 2)
