"""SnapshotTable.verify — the metadata fsck (ops complement of the
metadata tables; reference analog: jobcontrol completion-marker audits)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyetl_spark.cdc.tableio import SnapshotTable  # noqa: E402


def _mk(spark, tmp_path):
    return SnapshotTable.create(
        spark, str(tmp_path / "t"), keys=["k"], nbuckets=4,
        props={"stats_cols": ["x"]},
    )


def _delta(spark, rows):
    return spark.createDataFrame(rows, "k INT, x DOUBLE, op STRING, seq LONG")


def test_healthy_table_verifies_clean(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(i, float(i), "upsert", i) for i in range(10)]), "b0")
    t.merge(_delta(spark, [(1, 9.0, "upsert", 50)]), "b1")
    t.create_tag("ok")
    t.compact(min_files=1)
    rep = t.verify(all_versions=True)
    assert rep["ok"] and rep["issues"] == []
    assert rep["checked_versions"] == [0, 1, 2, 3]
    assert rep["orphan_files"] == 0


def test_missing_data_file_is_reported(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(i, float(i), "upsert", i) for i in range(10)]), "b0")
    victim = next(f for fs in t.manifest()["buckets"].values() for f in fs)
    os.remove(victim)
    rep = t.verify()
    assert not rep["ok"]
    assert any("missing data file" in i for i in rep["issues"])


def test_orphans_counted_and_reclaimed(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(1, 1.0, "upsert", 1)]), "b0")
    # plant an unreferenced file where a losing writer would leave one
    vdir = os.path.join(t.root, "data", "v00000099-deadbeef", "__b=0")
    os.makedirs(vdir)
    with open(os.path.join(vdir, "part-orphan.parquet"), "wb") as f:
        f.write(b"not really parquet")
    rep = t.verify()
    assert rep["ok"] and rep["orphan_files"] == 1  # reclaimable, not an issue
    t.expire_snapshots(keep_last=10)
    assert t.verify()["orphan_files"] == 0


def test_dangling_ref_and_stale_stats_are_issues(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(1, 1.0, "upsert", 1)]), "b0")
    # dangling tag: pin a version, then hand-delete its manifest
    t.create_tag("pinned", version=0)
    os.remove(t._manifest_path(0))
    rep = t.verify()
    assert any("pins v0" in i for i in rep["issues"])
    # stale stats: inject a file_stats key for a file no longer live
    import json as _json

    m = t.manifest()
    m["file_stats"]["v00000001-x/__b=0/ghost.parquet"] = {"x": [0, 1]}
    with open(t._manifest_path(m["version"]), "w") as f:
        _json.dump(m, f)
    rep = t.verify()
    assert any("dead file" in i for i in rep["issues"])
