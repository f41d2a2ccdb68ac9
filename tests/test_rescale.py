"""Bucket-spec evolution — SnapshotTable.rescale (Iceberg
partition-spec-evolution analog): metadata-only spec change, migrate-on-
touch merges, compact() as the migration finisher, exact reads throughout
the window."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyetl_spark.cdc.tableio import SnapshotTable  # noqa: E402


def _mk(spark, tmp_path, nbuckets=2, **props):
    return SnapshotTable.create(
        spark, str(tmp_path / "t"), keys=["k"], nbuckets=nbuckets, props=props or None
    )


def _delta(spark, rows):
    # rows: (k, x, op, seq)
    return spark.createDataFrame(rows, ["k", "x", "op", "seq"])


def _state(t) -> dict:
    return {r["k"]: r["x"] for r in t.read().collect()}


def test_rescale_is_metadata_only_and_reads_exact(spark, tmp_path):
    t = _mk(spark, tmp_path, nbuckets=2)
    t.merge(_delta(spark, [(i, i * 10, "upsert", i) for i in range(40)]), "b1")
    before = _state(t)
    v = t.rescale(8)
    m = t.manifest()
    assert m["nbuckets"] == 8 and m["version"] == v
    assert m["buckets"] == {} and len(m["legacy"]) == 1
    assert m["legacy"][0]["nbuckets"] == 2
    assert _state(t) == before
    assert t.read().count() == 40


def test_merge_migrates_touched_legacy_buckets(spark, tmp_path):
    t = _mk(spark, tmp_path, nbuckets=2)
    t.merge(_delta(spark, [(i, i, "upsert", i) for i in range(40)]), "b1")
    t.rescale(8)
    st = t.merge(_delta(spark, [(3, 333, "upsert", 100), (3000, 1, "upsert", 101)]), "b2")
    assert st.buckets_migrated >= 1
    want = {i: i for i in range(40)} | {3: 333, 3000: 1}
    assert _state(t) == want
    # the touched legacy bucket left the window
    legacy_left = sum(len(sp["buckets"]) for sp in t.manifest()["legacy"])
    assert legacy_left < 2


def test_compact_finishes_migration(spark, tmp_path):
    t = _mk(spark, tmp_path, nbuckets=2)
    t.merge(_delta(spark, [(i, i, "upsert", i) for i in range(40)]), "b1")
    t.rescale(8)
    t.compact(min_files=1)
    m = t.manifest()
    assert m["legacy"] == []
    assert set(int(b) for b in m["buckets"]) <= set(range(8))
    assert _state(t) == {i: i for i in range(40)}


def test_rescale_migrate_now(spark, tmp_path):
    t = _mk(spark, tmp_path, nbuckets=8)
    t.merge(_delta(spark, [(i, i, "upsert", i) for i in range(40)]), "b1")
    t.rescale(2, migrate="now")  # downsize too
    m = t.manifest()
    assert m["legacy"] == [] and m["nbuckets"] == 2
    assert set(int(b) for b in m["buckets"]) <= {0, 1}
    assert _state(t) == {i: i for i in range(40)}


def test_rescale_folds_mor_dirty_first(spark, tmp_path):
    t = _mk(spark, tmp_path, nbuckets=2)
    t.merge(_delta(spark, [(i, i, "upsert", i) for i in range(20)]), "b1")
    t.merge(_delta(spark, [(5, 555, "upsert", 100)]), "b2", mode="mor")
    assert t.dirty_buckets()
    t.rescale(4)
    assert t.manifest()["dirty"] == []
    assert _state(t)[5] == 555


def test_mor_merge_post_rescale_falls_back_to_cow_on_legacy_touch(spark, tmp_path):
    t = _mk(spark, tmp_path, nbuckets=2)
    t.merge(_delta(spark, [(i, i, "upsert", i) for i in range(20)]), "b1")
    t.rescale(4)
    st = t.merge(_delta(spark, [(5, 555, "upsert", 100)]), "b2", mode="mor")
    assert st.mode == "cow" and st.buckets_migrated >= 1
    assert _state(t)[5] == 555
    # once its legacy bucket is gone, MOR appends resume for those keys
    t.compact(min_files=1)
    st2 = t.merge(_delta(spark, [(5, 666, "upsert", 200)]), "b3", mode="mor")
    assert st2.mode == "mor"
    assert _state(t)[5] == 666


def test_deletes_and_updates_across_window(spark, tmp_path):
    t = _mk(spark, tmp_path, nbuckets=2)
    t.merge(_delta(spark, [(i, i, "upsert", i) for i in range(30)]), "b1")
    t.rescale(8)
    t.merge(
        _delta(spark, [(7, 0, "delete", 100), (8, 888, "upsert", 101)]), "b2"
    )
    st = _state(t)
    assert 7 not in st and st[8] == 888
    # stale pre-delete event must not resurrect through the legacy path
    t.merge(_delta(spark, [(7, 77, "upsert", 5)]), "b3")
    assert 7 not in _state(t)


def test_time_travel_and_changes_across_rescale(spark, tmp_path):
    t = _mk(spark, tmp_path, nbuckets=2)
    t.merge(_delta(spark, [(i, i, "upsert", i) for i in range(20)]), "b1")
    v1 = t.current_version()
    t.rescale(8)
    t.merge(_delta(spark, [(3, 333, "upsert", 100), (20, 20, "upsert", 101)]), "b2")
    t.compact(min_files=1)
    # time travel to the pre-rescale version
    assert {r["k"]: r["x"] for r in t.read(v1).collect()} == {i: i for i in range(20)}
    # the feed across the boundary carries ONLY the real row changes
    feed = t.changes(v1).collect()
    by_type = {}
    for r in feed:
        by_type.setdefault(r["_change_type"], []).append(r["k"])
    assert sorted(by_type.get("insert", [])) == [20]
    assert by_type.get("update_preimage") == [3]
    assert by_type.get("update_postimage") == [3]
    assert "delete" not in by_type


def test_scan_and_bucket_pruned_read_during_window(spark, tmp_path):
    t = SnapshotTable.create(
        spark,
        str(tmp_path / "t"),
        keys=["k"],
        nbuckets=2,
        props={"stats_cols": ["x"], "max_file_rows": 8},
    )
    t.merge(_delta(spark, [(i, i, "upsert", i) for i in range(40)]), "b1")
    t.rescale(8)
    got = t.scan([("x", ">=", 30)])
    assert sorted(r["k"] for r in got.collect()) == list(range(30, 40))
    probe = spark.createDataFrame([(7,), (13,)], ["k"])
    bids = t.bucket_ids(probe)
    rows = {r["k"]: r["x"] for r in t.read(buckets=bids).collect()}
    assert rows[7] == 7 and rows[13] == 13


def test_exactly_once_survives_rescale(spark, tmp_path):
    t = _mk(spark, tmp_path, nbuckets=2)
    t.merge(_delta(spark, [(i, i, "upsert", i) for i in range(10)]), "w:1")
    t.rescale(4)
    st = t.merge(_delta(spark, [(i, i, "upsert", i) for i in range(10)]), "w:1")
    assert st.skipped
    assert t.read().count() == 10


def test_expire_keeps_unmigrated_legacy_files(spark, tmp_path):
    t = _mk(spark, tmp_path, nbuckets=2)
    t.merge(_delta(spark, [(i, i, "upsert", i) for i in range(30)]), "b1")
    t.rescale(8)
    t.merge(_delta(spark, [(1, 111, "upsert", 100)]), "b2")  # migrates one bucket
    t.expire_snapshots(keep_last=1)
    st = _state(t)
    assert len(st) == 30 and st[1] == 111


def test_chained_rescales(spark, tmp_path):
    t = _mk(spark, tmp_path, nbuckets=2)
    t.merge(_delta(spark, [(i, i, "upsert", i) for i in range(20)]), "b1")
    t.rescale(4)
    t.merge(_delta(spark, [(100, 100, "upsert", 100)]), "b2")
    t.rescale(16)
    t.merge(_delta(spark, [(2, 222, "upsert", 200)]), "b3")
    want = {i: i for i in range(20)} | {100: 100, 2: 222}
    assert _state(t) == want
    t.compact(min_files=1)
    assert t.manifest()["legacy"] == []
    assert _state(t) == want


def test_schema_evolution_through_migration(spark, tmp_path):
    t = _mk(spark, tmp_path, nbuckets=2)
    t.merge(_delta(spark, [(i, i, "upsert", i) for i in range(10)]), "b1")
    t.rescale(4)
    wide = spark.createDataFrame([(3, 33, "fr", "upsert", 100)], ["k", "x", "lang", "op", "seq"])
    t.merge(wide, "b2")
    rows = {r["k"]: (r["x"], r["lang"]) for r in t.read().collect()}
    assert rows[3] == (33, "fr")
    assert rows[4][1] is None
