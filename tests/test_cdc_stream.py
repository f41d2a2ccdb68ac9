"""Structured Streaming CDC: checkpointed micro-batches, kill-and-resume,
transform rules in the stream path, metrics/lineage tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyetl_spark.cdc import SnapshotTable, change_events, replay_oracle, write_event_batches
from pyetl_spark.cdc.metrics import read_lineage, read_metrics
from pyetl_spark.cdc.oracle import content_hashes
from pyetl_spark.cdc.stream import StreamingIngest
from pyetl_spark.rules import Rule, RuleContext, compile_rules

N_EVENTS = 3000
GEN = dict(n_repos=30, paths_per_repo=20, seed=42)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("events")
    write_event_batches(spark, str(d), N_EVENTS, n_batches=6, **GEN)
    return str(d)


@pytest.fixture(scope="module")
def oracle_state(spark):
    ev = change_events(spark, N_EVENTS, **GEN).toPandas()
    return replay_oracle(ev)


def visible(table):
    return (
        table.read_raw()
        .filter(~F.col("_deleted"))
        .orderBy("repo", "path")
        .toPandas()
        .reset_index(drop=True)
    )


def test_stream_full_replay_matches_oracle(spark, events_dir, oracle_state, tmp_path):
    table = SnapshotTable.create(spark, str(tmp_path / "t"), keys=["repo", "path"], nbuckets=8)
    ingest = StreamingIngest(
        spark, events_dir, table, str(tmp_path / "ckpt"), max_files_per_trigger=8
    )
    ingest.run_until_drained()
    got = visible(table)
    assert content_hashes(got) == content_hashes(oracle_state)
    # exactly-once ledger: every committed stream batch distinct
    ledger = table.committed_batches()
    assert len(ledger) == len(set(ledger)) and len(ledger) >= 1


def test_stream_resume_from_checkpoint(spark, events_dir, oracle_state, tmp_path):
    """kill after the first tranche, restart with the same checkpoint: the
    source must not re-emit consumed files and the final state must match."""
    import glob
    import shutil

    staged = str(tmp_path / "staged_events")
    batches = sorted(glob.glob(f"{events_dir}/batch_*"))
    # stage only the first half of the stream
    for b in batches[:3]:
        shutil.copytree(b, f"{staged}/{b.split('/')[-1]}")

    table = SnapshotTable.create(spark, str(tmp_path / "t"), keys=["repo", "path"], nbuckets=8)
    ckpt = str(tmp_path / "ckpt")
    ingest1 = StreamingIngest(spark, staged, table, ckpt, max_files_per_trigger=2)
    ingest1.run_until_drained()
    v_mid = table.current_version()
    assert v_mid >= 1
    mid_ledger = set(table.committed_batches())

    # "crash" happened; later the remaining events arrive and we restart
    for b in batches[3:]:
        shutil.copytree(b, f"{staged}/{b.split('/')[-1]}")
    ingest2 = StreamingIngest(spark, staged, table, ckpt, max_files_per_trigger=2)
    ingest2.run_until_drained()

    got = visible(table)
    assert content_hashes(got) == content_hashes(oracle_state)
    # resumed epochs continued, not restarted (no batch id collision dropped data)
    assert mid_ledger.issubset(set(table.committed_batches()))


def test_stream_with_transform_rules(spark, events_dir, tmp_path):
    """pyetl-style transform rules applied inside the micro-batch: lang
    normalization + content sha256 column, mirrored in the oracle."""
    rules = [
        Rule(op="upper", out="lang", inp="lang"),
        Rule(op="checksum", out="content_sha", inp="content"),
        Rule(op="set", out="origin", default="cdc:[repo]"),
    ]
    pipeline = compile_rules(rules, RuleContext())
    table = SnapshotTable.create(spark, str(tmp_path / "t"), keys=["repo", "path"], nbuckets=8)
    ingest = StreamingIngest(
        spark, events_dir, table, str(tmp_path / "ckpt"), transform=pipeline
    )
    ingest.run_until_drained()

    ev = change_events(spark, N_EVENTS, **GEN).toPandas()

    def pandas_mirror(pdf):
        import hashlib

        pdf = pdf.copy()
        pdf["lang"] = pdf["lang"].str.upper()
        pdf["content_sha"] = pdf["content"].map(lambda c: hashlib.sha256(c.encode()).hexdigest())
        pdf["origin"] = "cdc:" + pdf["repo"]
        return pdf

    expected = replay_oracle(ev, transform=pandas_mirror)
    got = visible(table)
    assert list(got["lang"]) == list(expected["lang"])
    assert list(got["content_sha"]) == list(expected["content_sha"])
    assert list(got["origin"]) == list(expected["origin"])


def test_metrics_and_lineage_tables(spark, events_dir, oracle_state, tmp_path):
    table = SnapshotTable.create(spark, str(tmp_path / "t"), keys=["repo", "path"], nbuckets=8)
    ingest = StreamingIngest(spark, events_dir, table, str(tmp_path / "ckpt"))
    ingest.run_until_drained()

    m = read_metrics(spark, table.root).toPandas()
    assert m["events_in"].sum() == N_EVENTS
    assert (m["events_per_sec"] >= 0).all()

    lin = read_lineage(spark, table.root).toPandas()
    assert lin["events_in"].sum() == N_EVENTS
    assert (lin.groupby("batch_id")["bucket"].nunique() <= 8).all()
    assert ((lin["upserts"] + lin["deletes"]) == lin["events_in"]).all()


def test_stream_processing_time_trigger(spark, tmp_path):
    """continuous tail: events land WHILE the query runs on a
    Trigger.ProcessingTime cadence (the reference's polling-loop recast);
    the table converges to the oracle without restarts."""
    import time

    events_dir = str(tmp_path / "ev")
    n, gen = 1200, dict(n_repos=20, paths_per_repo=10, seed=7)
    write_event_batches(spark, events_dir, n // 2, n_batches=2, **gen)

    table = SnapshotTable.create(spark, str(tmp_path / "t"), keys=["repo", "path"], nbuckets=4)
    ingest = StreamingIngest(
        spark, events_dir, table, str(tmp_path / "ckpt"),
        max_files_per_trigger=10, processing_time="1 seconds",
    )
    q = ingest.start()
    try:
        # late arrivals: the second half lands mid-stream
        time.sleep(2)
        df = change_events(spark, n, start=n // 2, **gen)
        df.write.mode("overwrite").parquet(f"{events_dir}/batch_late")
        deadline = time.time() + 120
        expect = replay_oracle(change_events(spark, n, **gen).toPandas())
        while time.time() < deadline:
            if table.max_seq() == n - 1:
                break
            time.sleep(1)
    finally:
        q.stop()
    got = visible(table)
    assert content_hashes(got) == content_hashes(expect)


def test_stream_dedup_within_watermark(spark, tmp_path):
    """redelivered events inside the watermark are dropped at source;
    distinct commits for the same key are kept."""
    from pyspark.sql import functions as F2

    from pyetl_spark.cdc.dedup import stream_dedup_within_watermark

    ev = change_events(spark, 400, n_repos=5, paths_per_repo=4, seed=5).withColumn(
        "event_ts", F2.to_timestamp(F2.lit("2024-01-01 00:00:00")) + F2.make_interval(secs=F2.col("seq"))
    )
    d = str(tmp_path / "ev")
    ev.write.mode("overwrite").parquet(f"{d}/b0")
    ev.write.mode("overwrite").parquet(f"{d}/b1")  # full redelivery

    schema = ev.schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").option(
        "recursiveFileLookup", "true"
    ).parquet(d)
    deduped = stream_dedup_within_watermark(stream)
    q = (
        deduped.writeStream.format("memory").queryName("wm_dedup")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = spark.sql("SELECT * FROM wm_dedup")
    assert got.count() == 400  # the redelivered copy was dropped
    assert got.select("repo", "path", "commit").distinct().count() == 400
