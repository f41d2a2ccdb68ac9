"""Structured-Streaming change-feed source (cdc/cdf_source.py — the Delta
CDF streaming-source analog over SnapshotTable, built on the PySpark 4
Python Data Source API). Row-for-row parity with the batch feed
(SnapshotTable.changes) is the contract; offsets are table versions, so
Spark's checkpoint gives exactly-once commit-range delivery."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyetl_spark.cdc import cdf_source  # noqa: E402
from pyetl_spark.cdc.tableio import SnapshotTable  # noqa: E402


def _mk(spark, tmp_path, **props):
    return SnapshotTable.create(
        spark, str(tmp_path / "t"), keys=["k"], nbuckets=4, props=props or None
    )


def _delta(spark, rows):
    return spark.createDataFrame(rows, "k INT, v DOUBLE, tag STRING, op STRING, seq LONG")


def _drain(spark, root, ckpt, out, **opts):
    """availableNow pass into a parquet sink (supports checkpoint
    recovery, unlike the memory sink): consume everything committed so
    far, stop, read the sink back. Repeated calls with the same
    (ckpt, out) resume the stream."""
    df = cdf_source.read_stream_changes(spark, root, **opts)
    q = (
        df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    if not os.path.isdir(out):
        return spark.createDataFrame([], df.schema)
    return spark.read.schema(df.schema).parquet(out)


def _rowset(df):
    return sorted(
        (r["k"], r["_change_type"], r["_commit_version"], r["v"], r["tag"])
        for r in df.collect()
    )


def test_stream_feed_matches_batch_changes(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(i, float(i), "a", "upsert", i) for i in range(12)]), "w:1")
    t.merge(
        _delta(
            spark,
            [
                (1, 99.0, "b", "upsert", 100),  # update
                (2, 0.0, None, "delete", 101),  # delete
                (50, 7.0, "c", "upsert", 102),  # insert
                (60, 0.0, None, "delete", 103),  # first-appearance tombstone: no row
            ],
        ),
        "w:2",
    )
    t.merge(
        _delta(
            spark,
            [
                (2, 55.0, "z", "upsert", 200),  # tombstone overwritten -> insert
                (60, 0.0, None, "delete", 201),  # tombstone refreshed -> no row
            ],
        ),
        "w:3",
    )
    got = _drain(spark, t.root, str(tmp_path / "c1"), str(tmp_path / "o1"), startingVersion=0)
    assert got.columns == t.changes(0).columns
    assert _rowset(got) == _rowset(t.changes(0))
    types = {r["_change_type"] for r in got.collect()}
    assert types == {"insert", "delete", "update_preimage", "update_postimage"}


def test_stream_default_start_is_current_version(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(1, 1.0, "a", "upsert", 1)]), "w:1")
    # default startingVersion=current: the v1 history is NOT replayed
    got0 = _drain(spark, t.root, str(tmp_path / "c2"), str(tmp_path / "o2"))
    assert got0.count() == 0
    t.merge(_delta(spark, [(2, 2.0, "b", "upsert", 2)]), "w:2")
    got = _drain(
        spark, t.root, str(tmp_path / "c2"), str(tmp_path / "o2"), startingVersion=0
    )  # same checkpoint: offset wins over the option
    assert _rowset(got) == [(2, "insert", 2, 2.0, "b")]


def test_stream_resume_from_checkpoint_exactly_once(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(i, float(i), "a", "upsert", i) for i in range(6)]), "w:1")
    ckpt, out = str(tmp_path / "c3"), str(tmp_path / "o3")
    first = _rowset(_drain(spark, t.root, ckpt, out, startingVersion=0))
    # advance the table, resume the SAME checkpoint: only the new commits
    t.merge(_delta(spark, [(0, 9.0, "u", "upsert", 50), (7, 7.0, "n", "upsert", 51)]), "w:2")
    second = _rowset(_drain(spark, t.root, ckpt, out, startingVersion=0))
    resumed_only = [r for r in second if r not in first]
    assert sorted(first + resumed_only) == _rowset(t.changes(0))
    assert len(second) == len(first) + 3  # pre+post for k=0, insert k=7...
    # ...plus nothing replayed: every first-pass row appears exactly once
    assert [r for r in first if r not in second] == []


def test_stream_rate_limit_still_complete(spark, tmp_path):
    t = _mk(spark, tmp_path)
    for b in range(4):
        t.merge(_delta(spark, [(b, float(b), "a", "upsert", b)]), f"w:{b}")
    got = _drain(
        spark,
        t.root,
        str(tmp_path / "c4"),
        str(tmp_path / "o4"),
        startingVersion=0,
        maxCommitsPerBatch=1,
    )
    assert _rowset(got) == _rowset(t.changes(0))
    # every commit's emission arrived, each tagged with its own version.
    # (Under availableNow, Spark's Python-source fallback plans ONE batch
    # for the whole range — the cap governs ProcessingTime tails, and can
    # never lose data either way; see the cdf_source docstring.)
    assert got.select("_commit_version").distinct().count() == 4


def test_stream_parity_through_mor_and_compaction(spark, tmp_path):
    t = _mk(spark, tmp_path, merge_mode="mor")
    t.merge(_delta(spark, [(i, float(i), "a", "upsert", i) for i in range(8)]), "w:1")
    t.merge(_delta(spark, [(1, 11.0, "b", "upsert", 100)]), "w:2")  # MOR append
    t.compact(min_files=1)  # pure rewrite: must contribute NOTHING
    t.merge(_delta(spark, [(2, 22.0, "c", "upsert", 200)]), "w:3")
    got = _drain(spark, t.root, str(tmp_path / "c5"), str(tmp_path / "o5"), startingVersion=0)
    assert _rowset(got) == _rowset(t.changes(0))
    compact_v = [
        r["version"]
        for r in t.history_df().collect()
        if r["operation"] == "compact"
    ]
    assert not [r for r in got.collect() if r["_commit_version"] in compact_v]


def test_stream_parity_through_rescale_and_schema_widening_guard(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(i, float(i), "a", "upsert", i) for i in range(8)]), "w:1")
    t.rescale(8)  # lazy: opens an un-migrated legacy window
    # a merge INSIDE the window updates one key and migrates touched
    # buckets; the stream must emit exactly what the batch feed emits
    t.merge(_delta(spark, [(1, 77.0, "m", "upsert", 100)]), "w:2")
    got = _drain(spark, t.root, str(tmp_path / "c6"), str(tmp_path / "o6"), startingVersion=0)
    assert _rowset(got) == _rowset(t.changes(0))
    t.compact(min_files=1)  # finish migration (pure rewrite: no feed rows)
    got = _drain(spark, t.root, str(tmp_path / "c6b"), str(tmp_path / "o6b"), startingVersion=0)
    assert _rowset(got) == _rowset(t.changes(0))
    assert len(_rowset(got)) == 8 + 2  # 8 inserts + pre/post for k=1

    # widen the schema mid-history: a stream pinned BEFORE the widening
    # must refuse the widened commit and ask for a restart
    reader = cdf_source.TableChangesStreamReader(
        cdf_source._table_feed_schema(t.root), {"path": t.root, "startingversion": "0"}
    )
    wide = spark.createDataFrame(
        [(99, 1.0, "x", 5.5, "upsert", 999)],
        "k INT, v DOUBLE, tag STRING, extra DOUBLE, op STRING, seq LONG",
    )
    t.merge(wide, "w:wide")
    with pytest.raises(Exception, match="restart"):
        reader.partitions(
            {"version": 0}, {"version": t.current_version()}
        )
    # a fresh stream (pinning the widened schema) reads the whole history
    got2 = _drain(spark, t.root, str(tmp_path / "c7"), str(tmp_path / "o7"), startingVersion=0)
    assert "extra" in got2.columns
    assert _rowset(got2) == _rowset(t.changes(0))


def test_batch_format_read_matches_changes(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(i, float(i), "a", "upsert", i) for i in range(10)]), "w:1")
    t.merge(_delta(spark, [(1, 9.0, "b", "upsert", 50), (2, 0.0, None, "delete", 51)]), "w:2")
    t.merge(_delta(spark, [(3, 7.0, "c", "upsert", 60)]), "w:3")
    # full history (batch default startingVersion=0, endingVersion=current)
    got = cdf_source.read_changes(spark, t.root)
    assert got.columns == t.changes(0).columns
    assert _rowset(got) == _rowset(t.changes(0))
    # bounded range (1, 2]: exactly commit 2's emission
    got12 = cdf_source.read_changes(spark, t.root, startingVersion=1, endingVersion=2)
    assert _rowset(got12) == _rowset(t.changes(1, 2))
    # the source is a real relation: filters/aggregates compose on top
    n_del = (
        cdf_source.read_changes(spark, t.root)
        .filter(F.col("_change_type") == "delete")
        .count()
    )
    assert n_del == 1


def test_stream_delete_only_and_empty_ranges(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(1, 1.0, "a", "upsert", 1), (2, 2.0, "b", "upsert", 2)]), "w:1")
    t.delete_where([("v", ">=", 2.0)], batch_id="w:2")
    t.expire_snapshots(keep_last=10)  # metadata-only ops between reads
    got = _drain(spark, t.root, str(tmp_path / "c8"), str(tmp_path / "o8"), startingVersion=0)
    assert _rowset(got) == _rowset(t.changes(0))
    assert (2, "delete", 2, 2.0, "b") in _rowset(got)


def test_batch_read_after_rollback_to_empty_root_plus_alter(spark, tmp_path):
    """Rollback to the empty root followed by a metadata-only commit
    (alter_props) leaves the CURRENT manifest schema-less; the format
    reader must still serve retained history by anchoring the schema at
    endingVersion and walking to the nearest schema'd ancestor
    (property-test find — previously raised 'table has no schema yet')."""
    from pyetl_spark.cdc import cdf_source

    root = str(tmp_path / "t")
    t = SnapshotTable.create(spark, root, keys=["k"], nbuckets=2)
    t.merge(
        spark.createDataFrame([(1, "a", "upsert", 1)], ["k", "val", "op", "seq"]),
        "b0",
    )
    v1 = t.current_version()
    t.rollback(0)
    t.alter_props({"max_file_rows": 4})  # metadata-only: schema stays empty

    rows = cdf_source.read_changes(
        spark, root, startingVersion=0, endingVersion=v1
    ).collect()
    assert [(r["k"], r["val"], r["_change_type"]) for r in rows] == [
        (1, "a", "insert")
    ]
