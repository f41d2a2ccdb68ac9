"""Incremental view maintenance over the change feed (cdc/ivm.py)."""

from __future__ import annotations

import os
import sys
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyetl_spark.cdc.ivm import IncrementalAgg, delta_aggregate  # noqa: E402
from pyetl_spark.cdc.tableio import SnapshotTable  # noqa: E402


def _base(spark, tmp_path):
    return SnapshotTable.create(spark, str(tmp_path / "base"), keys=["k"], nbuckets=4)


def _delta(spark, rows):
    # (k, grp, x, op, seq)
    return spark.createDataFrame(rows, ["k", "grp", "x", "op", "seq"])


def _view_state(view):
    return {
        r["grp"]: (r["count"], r["sum_x"]) for r in view.state().collect()
    }


def _recompute(table):
    return {
        r["grp"]: (r["n"], r["s"])
        for r in table.read()
        .groupBy("grp")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("x").cast("decimal(28,6)")).cast("decimal(28,6)").alias("s"),
        )
        .collect()
    }


def test_view_tracks_recompute_through_cdc_lifecycle(spark, tmp_path):
    base = _base(spark, tmp_path)
    view = IncrementalAgg(spark, str(tmp_path / "v"), ["grp"], ["x"])
    batches = [
        [(1, "a", 10.5, "upsert", 1), (2, "a", 1.0, "upsert", 2), (3, "b", 2.0, "upsert", 3)],
        # update k=1 within group, move k=2 a→b, insert k=4
        [(1, "a", 11.5, "upsert", 4), (2, "b", 1.0, "upsert", 5), (4, "b", 7.0, "upsert", 6)],
        # delete k=3 and k=4
        [(3, "x", 0.0, "delete", 7), (4, "x", 0.0, "delete", 8)],
    ]
    v_prev = 0
    for i, rows in enumerate(batches):
        base.merge(_delta(spark, rows), batch_id=f"b{i}")
        v_now = base.current_version()
        view.apply(base.changes(v_prev, v_now), batch_id=f"b{i}")
        v_prev = v_now
        assert _view_state(view) == _recompute(base), f"diverged after batch {i}"
    got = _view_state(view)
    assert got["a"] == (1, Decimal("11.500000"))
    assert got["b"] == (1, Decimal("1.000000"))


def test_group_emptied_leaves_view(spark, tmp_path):
    base = _base(spark, tmp_path)
    view = IncrementalAgg(spark, str(tmp_path / "v"), ["grp"], ["x"])
    base.merge(_delta(spark, [(1, "solo", 5.0, "upsert", 1)]), "b0")
    view.apply(base.changes(0), "b0")
    assert "solo" in _view_state(view)
    v1 = base.current_version()
    base.merge(_delta(spark, [(1, "solo", 0.0, "delete", 2)]), "b1")
    view.apply(base.changes(v1), "b1")
    assert _view_state(view) == {}
    # and the group can come back
    v2 = base.current_version()
    base.merge(_delta(spark, [(9, "solo", 3.0, "upsert", 3)]), "b2")
    view.apply(base.changes(v2), "b2")
    assert _view_state(view) == {"solo": (1, Decimal("3.000000"))}


def test_replayed_slice_is_noop(spark, tmp_path):
    base = _base(spark, tmp_path)
    view = IncrementalAgg(spark, str(tmp_path / "v"), ["grp"], ["x"])
    base.merge(_delta(spark, [(1, "a", 5.0, "upsert", 1)]), "b0")
    feed = base.changes(0)
    view.apply(feed, "b0")
    stats = view.apply(feed, "b0")  # at-least-once redelivery
    assert stats.skipped
    assert _view_state(view) == {"a": (1, Decimal("5.000000"))}


def test_reopen_with_different_definition_raises(spark, tmp_path):
    IncrementalAgg(spark, str(tmp_path / "v"), ["grp"], ["x"])
    with pytest.raises(ValueError, match="view definitions"):
        IncrementalAgg(spark, str(tmp_path / "v"), ["grp"], [])


def test_delta_aggregate_signs(spark):
    rows = [
        ("a", 10.0, "insert"),
        ("a", 10.0, "update_preimage"),
        ("b", 10.0, "update_postimage"),
        ("b", 4.0, "delete"),
    ]
    ch = spark.createDataFrame(rows, ["grp", "x", "_change_type"])
    got = {
        r["grp"]: (r["d_count"], r["d_sum_x"])
        for r in delta_aggregate(ch, ["grp"], ["x"]).collect()
    }
    assert got["a"] == (0, Decimal("0.000000"))
    assert got["b"] == (0, Decimal("6.000000"))
