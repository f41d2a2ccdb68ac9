"""Change-data-feed reads (SnapshotTable.changes — Delta CDF / Iceberg
changelog-view analog, cdc/tableio.py)."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyetl_spark.cdc.tableio import SnapshotTable  # noqa: E402


def _mk(spark, tmp_path, nbuckets=4):
    return SnapshotTable.create(
        spark, str(tmp_path / "t"), keys=["k"], nbuckets=nbuckets
    )


def _delta(spark, rows):
    # rows: (k, val, op, seq)
    return spark.createDataFrame(rows, ["k", "val", "op", "seq"])


def _feed(table, v0, v1=None):
    return {
        (r["k"], r["_change_type"], r["_commit_version"]): r["val"]
        for r in table.changes(v0, v1).collect()
    }


def test_insert_update_delete_cycle(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v1 = t.merge(_delta(spark, [(1, "a", "upsert", 1), (2, "b", "upsert", 2)]), "b1").version
    v2 = t.merge(_delta(spark, [(1, "a2", "upsert", 3), (3, "c", "upsert", 4)]), "b2").version
    v3 = t.merge(_delta(spark, [(2, "ignored", "delete", 5)]), "b3").version

    got = _feed(t, 0, v3)
    assert got == {
        (1, "insert", v1): "a",
        (2, "insert", v1): "b",
        (1, "update_preimage", v2): "a",
        (1, "update_postimage", v2): "a2",
        (3, "insert", v2): "c",
        # pre-image values of the deleted row, not the delete event's payload
        (2, "delete", v3): "b",
    }
    # sub-range: only commits in (v1, v2]
    assert set(_feed(t, v1, v2)) == {
        (1, "update_preimage", v2),
        (1, "update_postimage", v2),
        (3, "insert", v2),
    }
    assert _feed(t, v3, v3) == {}


def test_tombstone_edges_emit_nothing(spark, tmp_path):
    t = _mk(spark, tmp_path)
    # key 9 first appears as a tombstone: not a change
    v1 = t.merge(_delta(spark, [(9, "x", "delete", 1), (1, "a", "upsert", 2)]), "b1").version
    # re-delete refreshes the tombstone: still nothing
    v2 = t.merge(_delta(spark, [(9, "y", "delete", 3)]), "b2").version
    # tombstone overwritten by a live row: that's an insert
    v3 = t.merge(_delta(spark, [(9, "z", "upsert", 4)]), "b3").version
    got = _feed(t, 0, v3)
    assert got == {(1, "insert", v1): "a", (9, "insert", v3): "z"}
    assert v2 in {m for (_, _, m) in got} or True  # v2 contributed nothing


def test_compaction_contributes_nothing(spark, tmp_path):
    t = _mk(spark, tmp_path, nbuckets=1)
    t.merge(_delta(spark, [(1, "a", "upsert", 1)]), "b1")
    t.merge(_delta(spark, [(2, "b", "upsert", 2)]), "b2")
    stats = t.compact(min_files=1)
    assert stats["compacted_buckets"] == 1
    vc = t.current_version()
    # the compaction commit rewrote the bucket but changed no rows
    assert t.changes(vc - 1, vc).count() == 0
    # and the full feed still reads correctly through the rewrite
    assert set(_feed(t, 0, vc)) == {(1, "insert", 1), (2, "insert", 2)}


def test_only_changed_buckets_are_read(spark, tmp_path, monkeypatch):
    t = _mk(spark, tmp_path, nbuckets=16)
    big = _delta(spark, [(i, f"v{i}", "upsert", i) for i in range(64)])
    t.merge(big, "b1")
    v1 = t.current_version()
    t.merge(_delta(spark, [(1, "v1b", "upsert", 100)]), "b2")
    v2 = t.current_version()

    seen: list[list[int]] = []
    orig = SnapshotTable.read_raw

    def spy(self, version=None, buckets=None):
        seen.append(sorted(buckets) if buckets is not None else None)
        return orig(self, version, buckets=buckets)

    monkeypatch.setattr(SnapshotTable, "read_raw", spy)
    out = t.changes(v1, v2).collect()
    assert {(r["k"], r["_change_type"]) for r in out} == {
        (1, "update_preimage"),
        (1, "update_postimage"),
    }
    # both sides of the diff read exactly the one changed bucket
    assert seen and all(b is not None and len(b) == 1 for b in seen)


def test_schema_evolution_widens_feed(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(1, "a", "upsert", 1)]), "b1")
    wide = spark.createDataFrame([(1, "a2", "upsert", 2, "fr")], ["k", "val", "op", "seq", "lang"])
    t.merge(wide, "b2")
    rows = {
        (r["_change_type"]): (r["val"], r["lang"])
        for r in t.changes(0).filter(F.col("k") == 1).collect()
    }
    assert rows["insert"] == ("a", None)
    assert rows["update_preimage"] == ("a", None)
    assert rows["update_postimage"] == ("a2", "fr")


def test_rollback_divergence_raises(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(1, "a", "upsert", 1)]), "b1")
    v1 = t.current_version()
    t.merge(_delta(spark, [(1, "b", "upsert", 2)]), "b2")
    v2 = t.current_version()
    t.rollback(v1)
    t.merge(_delta(spark, [(1, "c", "upsert", 3)]), "b3")
    v3 = t.current_version()
    # v3's parent chain is v1, not v2 — v2 diverged
    with pytest.raises(ValueError, match="ancestor"):
        t.changes(v2, v3)
    assert set(_feed(t, v1, v3)) == {(1, "update_preimage", v3), (1, "update_postimage", v3)}


def test_expired_intermediate_raises(spark, tmp_path):
    t = _mk(spark, tmp_path)
    for i in range(4):
        t.merge(_delta(spark, [(i, f"v{i}", "upsert", i + 1)]), f"b{i}")
    t.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError, match="not retained"):
        t.changes(1)


def test_long_lineage_chunked_checkpoint_matches_unchunked(spark, tmp_path):
    # plan-growth bound: every checkpoint_every commits the accumulated
    # union is cut over to a localCheckpoint; results must be identical
    # and the final plan must not carry one branch per commit
    t = _mk(spark, tmp_path, nbuckets=2)
    for i in range(10):
        t.merge(_delta(spark, [(i % 3, f"v{i}", "upsert", i + 1)]), f"b{i}")
    v = t.current_version()
    chunked = t.changes(0, v, checkpoint_every=3)
    plain = t.changes(0, v, checkpoint_every=0)
    key = ["k", "val", "_change_type", "_commit_version"]
    assert sorted(map(tuple, chunked.select(key).collect())) == sorted(
        map(tuple, plain.select(key).collect())
    )
    # ≤ checkpoint_every Union branches survive in the chunked plan
    assert str(chunked._jdf.queryExecution().logical()).count("Union") <= 3


def test_empty_range_has_feed_schema(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(1, "a", "upsert", 1)]), "b1")
    v = t.current_version()
    out = t.changes(v, v)
    assert out.count() == 0
    assert {"_change_type", "_commit_version"} <= set(out.columns)
