"""File-level min/max statistics + data-skipping scans
(SnapshotTable.scan — Iceberg metrics-based file pruning analog)."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyetl_spark.cdc.tableio import (  # noqa: E402
    SnapshotTable,
    _file_prunable,
    _footer_minmax,
)


def _mk(spark, tmp_path, **props):
    return SnapshotTable.create(
        spark,
        str(tmp_path / "t"),
        keys=["k"],
        nbuckets=2,
        props={"stats_cols": ["x"], "max_file_rows": 8, **props},
    )


def _delta(spark, rows):
    # rows: (k, x, op, seq)
    return spark.createDataFrame(rows, ["k", "x", "op", "seq"])


def test_stats_recorded_and_scan_matches_read(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(i, i * 10, "upsert", i) for i in range(40)]), "b1")
    m = t.manifest()
    assert m["file_stats"], "merge must record footer stats"
    for s in m["file_stats"].values():
        mn, mx = s["x"]
        assert mn <= mx
    got = t.scan([("x", ">=", 200)])
    want = t.read().filter(F.col("x") >= 200)
    assert sorted(r["k"] for r in got.collect()) == sorted(
        r["k"] for r in want.collect()
    )
    # clustering + 8-row file cap: a selective range must skip real files
    assert t.last_scan["files_pruned"] > 0
    assert t.last_scan["files_read"] < t.last_scan["files_total"]


def test_scan_prunes_everything_outside_range(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(i, i, "upsert", i) for i in range(20)]), "b1")
    out = t.scan([("x", ">", 10_000)])
    assert out.count() == 0
    assert t.last_scan["files_read"] == 0


def test_scan_without_stats_still_correct(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), keys=["k"], nbuckets=2)
    t.merge(_delta(spark, [(i, i, "upsert", i) for i in range(20)]), "b1")
    out = t.scan([("x", "<=", 5)])
    assert sorted(r["k"] for r in out.collect()) == list(range(6))
    assert t.last_scan["files_pruned"] == 0  # no stats: nothing prunable


def test_tombstones_stay_invisible_through_scan(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(1, 100, "upsert", 1), (2, 100, "upsert", 2)]), "b1")
    t.merge(_delta(spark, [(1, 100, "delete", 3)]), "b2")
    assert [r["k"] for r in t.scan([("x", "=", 100)]).collect()] == [2]


def test_stats_carry_forward_for_untouched_buckets(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(i, i, "upsert", i) for i in range(40)]), "b1")
    n0 = len(t.manifest()["file_stats"])
    # a one-key merge touches one bucket; the other bucket's stats persist
    t.merge(_delta(spark, [(1, 999, "upsert", 100)]), "b2")
    m = t.manifest()
    assert len(m["file_stats"]) >= 1
    live = {os.path.basename(f) for fs in m["buckets"].values() for f in fs}
    assert {k.split("/")[-1] for k in m["file_stats"]} == live
    assert n0 > 0


def test_compact_reclusters_and_keeps_pruning_sound(spark, tmp_path):
    t = _mk(spark, tmp_path)
    # interleaved ranges across merges fragment the clustering
    t.merge(_delta(spark, [(i, i % 7, "upsert", i) for i in range(24)]), "b1")
    t.merge(_delta(spark, [(i, 1000 + i, "upsert", 100 + i) for i in range(24, 48)]), "b2")
    t.compact(min_files=1)
    got = sorted(r["k"] for r in t.scan([("x", ">=", 1000)]).collect())
    assert got == list(range(24, 48))
    assert t.last_scan["files_pruned"] > 0


def test_evolved_column_absent_files_prune(spark, tmp_path):
    t = _mk(spark, tmp_path, stats_cols=["x", "lang"])
    t.merge(_delta(spark, [(i, i, "upsert", i) for i in range(10)]), "b1")
    wide = spark.createDataFrame([(100, 5, "upsert", 100, "fr")], ["k", "x", "op", "seq", "lang"])
    t.merge(wide, "b2")
    out = t.scan([("lang", "=", "fr")])
    assert [r["k"] for r in out.collect()] == [100]
    # note: b2's merge rewrote the touched bucket (old rows get lang=NULL in
    # the rewritten file), but any bucket untouched since b1 has no lang
    # column at all and is skipped via the "absent" marker
    pruned_ok = any(
        s.get("lang") == "absent" for s in t.manifest()["file_stats"].values()
    )
    assert pruned_ok


def test_scan_rejects_unknown_op(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="unsupported op"):
        t.scan([("x", "!=", 1)])


def test_prunable_unit():
    assert _file_prunable({"x": [0, 10]}, [("x", ">", 10)])
    assert not _file_prunable({"x": [0, 10]}, [("x", ">=", 10)])
    assert _file_prunable({"x": [5, 10]}, [("x", "<", 5)])
    assert not _file_prunable({"x": [5, 10]}, [("x", "<=", 5)])
    assert _file_prunable({"x": [5, 10]}, [("x", "=", 11)])
    assert not _file_prunable({"x": None}, [("x", "=", 11)])
    assert not _file_prunable(None, [("x", "=", 11)])
    assert _file_prunable({"x": "absent"}, [("x", "=", 1)])
    # type mismatch keeps the file
    assert not _file_prunable({"x": [0, 10]}, [("x", "=", "eleven")])


def test_footer_minmax_types(spark, tmp_path):
    p = str(tmp_path / "f.parquet")
    spark.createDataFrame(
        [(1, 1.5, "aa", True), (9, 9.5, "zz", False)], ["i", "d", "s", "b"]
    ).coalesce(1).write.mode("overwrite").parquet(p)
    f = [x for x in os.listdir(p) if x.endswith(".parquet")][0]
    st = _footer_minmax(os.path.join(p, f), ["i", "d", "s", "b", "ghost"])
    assert st["i"] == [1, 9]
    assert st["d"] == [1.5, 9.5]
    assert st["s"] == ["aa", "zz"]
    assert st["b"] is None  # bools are not prunable scalars here
    assert st["ghost"] == "absent"
