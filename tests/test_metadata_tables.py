"""Metadata/inspection tables — SnapshotTable.history_df / snapshots_df /
files_df / refs_df (the Iceberg ``table$history`` / ``$snapshots`` /
``$files`` / ``$refs`` analog). Reference parity: pyetl's compteur /
statistics reporting surface (moteur/compteurs.py) recast as queryable
lake-level observability."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyetl_spark.cdc.tableio import SnapshotTable  # noqa: E402


def _mk(spark, tmp_path, **props):
    return SnapshotTable.create(
        spark,
        str(tmp_path / "t"),
        keys=["k"],
        nbuckets=4,
        props={"stats_cols": ["x"], **props},
    )


def _delta(spark, rows):
    return spark.createDataFrame(rows, "k INT, x DOUBLE, op STRING, seq LONG")


def test_history_chain_and_operations(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(i, float(i), "upsert", i) for i in range(12)]), "w:1")
    t.merge(_delta(spark, [(0, 99.0, "upsert", 100)]), "w:2")
    t.compact(min_files=1)
    t.delete_where([("x", ">=", 90.0)], batch_id="w:3")
    h = {r["version"]: r for r in t.history_df().collect()}
    assert [h[v]["operation"] for v in sorted(h)] == [
        "create",
        "merge",
        "merge",
        "compact",
        "delete",
    ]
    # parent chain is the commit order; batch ids ride the summary
    assert [h[v]["parent"] for v in sorted(h)] == [None, 0, 1, 2, 3]
    assert h[1]["batch_id"] == "w:1" and h[4]["batch_id"] == "w:3"
    assert all(h[v]["is_current_ancestor"] for v in h)
    assert [v for v in h if h[v]["is_current"]] == [max(h)]
    # timestamps are monotone along the chain
    ts = [h[v]["committed_ts"] for v in sorted(h)]
    assert ts == sorted(ts)


def test_snapshot_records_match_time_travel_reads(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(i, float(i), "upsert", i) for i in range(10)]), "w:1")
    t.merge(_delta(spark, [(i, float(i) * 2, "upsert", 50 + i) for i in range(5, 15)]), "w:2")
    snaps = {r["version"]: r for r in t.snapshots_df().collect()}
    for v, row in snaps.items():
        # physical rows per version == what a versioned read returns
        # (upsert-only stream: no tombstones; empty v0 reads as None)
        raw = t.read_raw(version=v)
        assert row["total_records"] == (raw.count() if raw is not None else 0)
    assert snaps[1]["events_in"] == 10 and snaps[2]["events_in"] == 10
    assert snaps[2]["total_records"] == 15
    assert snaps[0]["data_files"] == 0 and snaps[0]["total_records"] == 0


def test_files_df_matches_manifest_and_footer_counts(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(i, float(i), "upsert", i) for i in range(40)]), "w:1")
    m = t.manifest()
    fdf = t.files_df().collect()
    assert {r["file_path"] for r in fdf} == {
        f for fs in m["buckets"].values() for f in fs
    }
    # per-file record counts sum to the table; per-file min/max are sane
    assert sum(r["record_count"] for r in fdf) == 40
    import json as _json

    for r in fdf:
        lo, hi = _json.loads(r["column_stats"])["x"]
        assert 0.0 <= lo <= hi <= 39.0
        assert not r["is_dirty"] and r["spec"] == "current"
        assert r["spec_nbuckets"] == 4


def test_files_df_tracks_mor_dirty_and_legacy_specs(spark, tmp_path):
    t = _mk(spark, tmp_path, merge_mode="mor")
    t.merge(_delta(spark, [(i, float(i), "upsert", i) for i in range(8)]), "w:1")
    t.merge(_delta(spark, [(0, 5.0, "upsert", 100)]), "w:2")  # MOR append → dirty
    assert any(r["is_dirty"] for r in t.files_df().collect())
    t.compact(min_files=1)
    assert not any(r["is_dirty"] for r in t.files_df().collect())
    t.rescale(8)  # metadata-only: all files now under a legacy spec
    rows = t.files_df().collect()
    assert rows and all(r["spec"] == "legacy" and r["spec_nbuckets"] == 4 for r in rows)
    assert {r["operation"] for r in t.history_df().collect()} >= {"rescale"}


def test_refs_df_and_rollback_ancestry(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(1, 1.0, "upsert", 1)]), "w:1")
    t.create_tag("audited")
    t.create_branch("wap")
    t.merge(_delta(spark, [(2, 2.0, "upsert", 2)]), "w:2")
    refs = {(r["name"], r["kind"]): r["version"] for r in t.refs_df().collect()}
    assert refs[("main", "branch")] == 2
    assert refs[("audited", "tag")] == 1 and refs[("wap", "branch")] == 1
    t.rollback(1)
    h = {r["version"]: r for r in t.history_df().collect()}
    # v2 is retained but no longer on the current pointer's chain
    assert h[2]["is_current_ancestor"] is False and h[1]["is_current"] is True


def test_metadata_without_stats_tracking_is_null_not_wrong(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t0"), keys=["k"], nbuckets=2)
    t.merge(_delta(spark, [(1, 1.0, "upsert", 1)]), "w:1")
    snap = t.snapshots_df().orderBy(F.desc("version")).first()
    assert snap["total_records"] is None  # unknown, never fabricated
    assert all(r["record_count"] is None for r in t.files_df().collect())
    # track_counts alone (no stats_cols) records footer row counts
    t2 = SnapshotTable.create(
        spark, str(tmp_path / "t1"), keys=["k"], nbuckets=2, props={"track_counts": True}
    )
    t2.merge(_delta(spark, [(i, 1.0, "upsert", i) for i in range(6)]), "w:1")
    assert t2.snapshots_df().orderBy(F.desc("version")).first()["total_records"] == 6


def test_metadata_survives_expiry(spark, tmp_path):
    t = _mk(spark, tmp_path)
    for b in range(5):
        t.merge(_delta(spark, [(b, float(b), "upsert", b)]), f"w:{b}")
    t.expire_snapshots(keep_last=2)
    versions = [r["version"] for r in t.history_df().collect()]
    assert versions == sorted(versions) and len(versions) == 2
    snaps = t.snapshots_df().collect()
    assert all(s["total_records"] is not None for s in snaps)
    live = {r["file_path"] for r in t.files_df().collect()}
    assert all(os.path.exists(f) for f in live)
