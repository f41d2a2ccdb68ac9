"""Row-level predicate deletes — SnapshotTable.delete_where (the
Iceberg/Delta ``DELETE FROM ... WHERE`` analog; GDPR-erasure primitive)."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyetl_spark.cdc.tableio import SnapshotTable  # noqa: E402


def _mk(spark, tmp_path, **props):
    return SnapshotTable.create(
        spark,
        str(tmp_path / "t"),
        keys=["k"],
        nbuckets=2,
        props={"stats_cols": ["x"], "max_file_rows": 8, **props},
    )


def _delta(spark, rows):
    return spark.createDataFrame(rows, ["k", "x", "op", "seq"])


def _state(t) -> dict:
    return {r["k"]: r["x"] for r in t.read().collect()}


def test_delete_where_basic_and_tombstone_wins(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(i, i * 10, "upsert", i) for i in range(20)]), "b1")
    st = t.delete_where([("x", ">=", 100)], batch_id="gdpr:1")
    assert st.events_in == 10
    assert _state(t) == {i: i * 10 for i in range(10)}
    # a late stale event for a deleted key must lose to the tombstone
    t.merge(_delta(spark, [(15, 1, "upsert", 3)]), "late")
    assert 15 not in _state(t)
    # but a genuinely NEWER event resurrects it (LWW, not a permanent ban)
    t.merge(_delta(spark, [(15, 2, "upsert", 10_000)]), "new")
    assert _state(t)[15] == 2


def test_delete_where_emits_cdf_deletes(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(i, i, "upsert", i) for i in range(10)]), "b1")
    v = t.current_version()
    t.delete_where([("x", "<", 3)])
    feed = t.changes(v).collect()
    assert sorted(r["k"] for r in feed) == [0, 1, 2]
    assert {r["_change_type"] for r in feed} == {"delete"}


def test_delete_where_idempotent_batch(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(i, i, "upsert", i) for i in range(10)]), "b1")
    t.delete_where([("x", ">=", 5)], batch_id="sweep:1")
    st = t.delete_where([("x", ">=", 5)], batch_id="sweep:1")
    assert st.skipped
    assert _state(t) == {i: i for i in range(5)}


def test_delete_where_no_match_keeps_state(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(1, 1, "upsert", 1)]), "b1")
    st = t.delete_where([("x", ">", 10_000)])
    assert st.events_in == 0
    assert _state(t) == {1: 1}


def test_delete_where_in_list_and_rescale_window(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(i, i, "upsert", i) for i in range(20)]), "b1")
    t.rescale(8)  # delete mid-window: scan covers legacy, merge migrates
    st = t.delete_where([("x", "in", [3, 7, 11, 999])])
    assert st.events_in == 3
    want = {i: i for i in range(20) if i not in (3, 7, 11)}
    assert _state(t) == want
    t.compact(min_files=1)
    assert t.manifest()["legacy"] == []
    assert _state(t) == want


def test_delete_then_expire_erases_history(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(i, i, "upsert", i) for i in range(10)]), "b1")
    t.delete_where([("x", "<", 5)])
    t.compact(min_files=1)
    t.expire_snapshots(keep_last=1)
    # pre-delete versions are gone: the erased rows exist in no retained file
    root = str(tmp_path / "t")
    kept = 0
    for dirpath, _, names in os.walk(os.path.join(root, "data")):
        kept += sum(1 for n in names if n.endswith(".parquet"))
    raw = t.read_raw()
    live = raw.filter(~F.col("_deleted")).count()
    assert live == 5 and kept > 0
