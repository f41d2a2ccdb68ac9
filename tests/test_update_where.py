"""Row-level predicate updates — SnapshotTable.update_where (the
Iceberg/Delta ``UPDATE ... SET ... WHERE`` analog; completes the DML
triad with delete_where and merge_into)."""

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


def test_update_where_basic_and_wins_lww(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(i, i * 10, "upsert", i) for i in range(20)]), "b1")
    st = t.update_where({"x": "x + 1"}, [("x", ">=", 100)], batch_id="fix:1")
    assert st.events_in == 10
    assert _state(t) == {
        i: i * 10 + (1 if i >= 10 else 0) for i in range(20)
    }
    # a late stale event for an updated key must lose to the update's seq
    t.merge(_delta(spark, [(15, 1, "upsert", 3)]), "late")
    assert _state(t)[15] == 151
    # a genuinely newer event wins (LWW, the update is not a freeze)
    t.merge(_delta(spark, [(15, 2, "upsert", 10_000)]), "new")
    assert _state(t)[15] == 2


def test_update_where_emits_cdf_update_pairs(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(i, i, "upsert", i) for i in range(10)]), "b1")
    v = t.current_version()
    t.update_where({"x": "x * 100"}, [("x", "<", 3)])
    feed = t.changes(v).collect()
    assert sorted(r["k"] for r in feed if r["_change_type"] == "update_postimage") == [0, 1, 2]
    pre = {r["k"]: r["x"] for r in feed if r["_change_type"] == "update_preimage"}
    post = {r["k"]: r["x"] for r in feed if r["_change_type"] == "update_postimage"}
    assert pre == {0: 0, 1: 1, 2: 2}
    assert post == {0: 0, 1: 100, 2: 200}


def test_update_where_idempotent_batch(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(i, i, "upsert", i) for i in range(10)]), "b1")
    t.update_where({"x": "x + 5"}, [("x", ">=", 5)], batch_id="u:1")
    st = t.update_where({"x": "x + 5"}, [("x", ">=", 5)], batch_id="u:1")
    assert st.skipped
    assert _state(t) == {i: i + (5 if i >= 5 else 0) for i in range(10)}


def test_update_where_no_match_keeps_state(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(1, 1, "upsert", 1)]), "b1")
    st = t.update_where({"x": "0"}, [("x", ">", 10_000)])
    assert st.events_in == 0
    assert _state(t) == {1: 1}


def test_update_where_rejects_key_assignment(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(1, 1, "upsert", 1)]), "b1")
    with pytest.raises(ValueError, match="key columns"):
        t.update_where({"k": "k + 1"}, [("x", ">=", 0)])


def test_update_where_new_column_widens_schema(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(i, i, "upsert", i) for i in range(4)]), "b1")
    t.update_where({"flag": "'reviewed'"}, [("x", ">=", 2)])
    rows = {r["k"]: r["flag"] for r in t.read().collect()}
    assert rows == {0: None, 1: None, 2: "reviewed", 3: "reviewed"}


def test_update_where_time_travel_sees_pre_update(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(1, 7, "upsert", 1)]), "b1")
    v = t.current_version()
    t.update_where({"x": "x * 2"}, [("x", "=", 7)])
    assert {r["k"]: r["x"] for r in t.read(version=v).collect()} == {1: 7}
    assert _state(t) == {1: 14}


def test_update_where_scan_prunes_files(spark, tmp_path):
    """The matching-row read goes through the data-skipping scan: with
    clustered stats files, a narrow predicate reads fewer files than the
    table holds."""
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(i, i, "upsert", i) for i in range(64)]), "b1")
    t.update_where({"x": "x + 1000"}, [("x", ">=", 60)])
    assert t.last_scan["files_read"] < t.last_scan["files_total"]
    assert _state(t)[63] == 1063 and _state(t)[0] == 0


def test_dml_on_empty_root_is_noop_and_keeps_schema_clean(spark, tmp_path):
    """delete_where/update_where on a table with no stored schema (fresh,
    or rolled back to the empty root) must no-op WITHOUT committing the
    string-typed fallback frame — a later real merge with proper key
    types must not hit a schema-evolution conflict (property-test find)."""
    t = _mk(spark, tmp_path)
    st = t.delete_where([("x", "<", 10)], batch_id="dw:0")
    assert st.skipped and st.events_in == 0
    st = t.update_where({"x": "x + 1"}, [("x", "<", 10)], batch_id="uw:0")
    assert st.skipped
    # the real first merge with bigint keys must go through unharmed
    t.merge(_delta(spark, [(1, 5, "upsert", 1)]), "b0")
    assert _state(t) == {1: 5}
    # rolled back to the empty root: same guard applies
    t.rollback(0)
    st = t.delete_where([("x", "<", 10)])
    assert st.skipped
    t.merge(_delta(spark, [(2, 6, "upsert", 2)]), "b1")
    assert _state(t) == {2: 6}
