"""General conditional MERGE — SnapshotTable.merge_into (the Delta/Iceberg
``MERGE INTO ... WHEN MATCHED/NOT MATCHED`` analog; pyetl's update-vs-insert
load-mode recast, traitement_db.py update/insert command split)."""

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
        nbuckets=4,
        props=props or None,
    )


def _delta(spark, rows):
    return spark.createDataFrame(rows, ["k", "x", "op", "seq"])


def _src(spark, rows, cols=("k", "x")):
    return spark.createDataFrame(rows, list(cols))


def _state(t) -> dict:
    return {r["k"]: r["x"] for r in t.read().collect()}


def test_full_clause_matrix(spark, tmp_path):
    """One call exercising all five outcomes: matched-update, matched-delete,
    matched-noop (no clause condition holds), unmatched-insert and
    unmatched-noop (insert condition fails)."""
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(i, i * 10, "upsert", i) for i in range(5)]), "b0")
    # source: k=0 delete, k=1 update (+1000), k=2 matched-noop (both conds
    # false), k=10 insert, k=11 unmatched-noop (insert cond false)
    src = _src(spark, [(0, -1), (1, 1000), (2, -1), (10, 7), (11, -1)])
    st = t.merge_into(
        src,
        when_matched_update={"x": "t.x + s.x"},
        matched_condition="s.x > 0",
        when_matched_delete="s.x < 0 AND s.k = 0",
        when_not_matched_insert="*",
        not_matched_condition="s.x > 0",
        batch_id="mi:0",
    )
    assert st.events_in == 3  # delete(0) + update(1) + insert(10)
    assert _state(t) == {1: 10 + 1000, 2: 20, 3: 30, 4: 40, 10: 7}


def test_untouched_rows_and_buckets_survive(spark, tmp_path):
    """Rows never named by the source stay put, and the merge only rewrites
    the buckets the source keys hash into (pruning contract)."""
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(i, i, "upsert", i) for i in range(40)]), "b0")
    v0 = t.current_version()
    before = dict(t.manifest()["buckets"])
    touched = set(map(str, t.bucket_ids(_src(spark, [(3, 0)]).select("k"))))
    st = t.merge_into(_src(spark, [(3, 99)]), when_matched_update="*")
    assert st.version == v0 + 1
    after = t.manifest()["buckets"]
    assert _state(t)[3] == 99
    for b, files in before.items():
        if b not in touched:
            assert after[b] == files  # untouched bucket: identical files


def test_sequencing_beats_stored_rows_not_table_scan(spark, tmp_path):
    """Emitted rows must win LWW over everything stored for their keys; a
    later genuine CDC event with a higher seq must still win over the
    merge_into result."""
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(1, 5, "upsert", 100)]), "b0")
    t.merge_into(_src(spark, [(1, 6)]), when_matched_update="*")
    assert _state(t)[1] == 6  # beat seq=100
    t.merge(_delta(spark, [(1, 7, "upsert", 50)]), "stale")
    assert _state(t)[1] == 6  # stale event lost
    t.merge(_delta(spark, [(1, 8, "upsert", 10_000)]), "new")
    assert _state(t)[1] == 8


def test_insert_only_and_delete_only(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(1, 1, "upsert", 1), (2, 2, "upsert", 2)]), "b0")
    # insert-only (default clause set): matched rows untouched
    t.merge_into(_src(spark, [(1, 99), (3, 3)]))
    assert _state(t) == {1: 1, 2: 2, 3: 3}
    # delete-only: when_matched_delete=True, no update/insert
    t.merge_into(
        _src(spark, [(2, 0), (9, 0)]),
        when_matched_delete=True,
        when_not_matched_insert=None,
    )
    assert _state(t) == {1: 1, 3: 3}


def test_source_duplicate_keys_raise(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(1, 1, "upsert", 1)]), "b0")
    with pytest.raises(ValueError, match="not unique"):
        t.merge_into(_src(spark, [(1, 1), (1, 2)]), when_matched_update="*")
    # and the table was not advanced
    assert t.current_version() == 1


def test_ledger_idempotence(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(1, 1, "upsert", 1)]), "b0")
    st1 = t.merge_into(
        _src(spark, [(1, 10)]), when_matched_update="*", batch_id="mi:1"
    )
    st2 = t.merge_into(
        _src(spark, [(1, 999)]), when_matched_update="*", batch_id="mi:1"
    )
    assert not st1.skipped and st2.skipped
    assert _state(t)[1] == 10


def test_schema_evolution_source_only_column(spark, tmp_path):
    """A source-only payload column widens the table via the normal merge
    evolution; pre-existing rows surface NULL for it."""
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(1, 1, "upsert", 1), (2, 2, "upsert", 2)]), "b0")
    src = _src(spark, [(2, 20, "fr"), (3, 30, "de")], cols=("k", "x", "lang"))
    t.merge_into(src, when_matched_update="*")
    got = {r["k"]: (r["x"], r["lang"]) for r in t.read().collect()}
    assert got == {1: (1, None), 2: (20, "fr"), 3: (30, "de")}


def test_cdf_rows_from_merge_into(spark, tmp_path):
    """The change feed classifies merge_into's effects like any commit:
    update_pre/update_post for updates, delete for deletes, insert for
    inserts."""
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(1, 1, "upsert", 1), (2, 2, "upsert", 2)]), "b0")
    v0 = t.current_version()
    t.merge_into(
        _src(spark, [(1, 10), (2, -1), (3, 3)]),
        when_matched_update={"x": "s.x"},
        matched_condition="s.x > 0",
        when_matched_delete="s.x < 0",
    )
    feed = {
        (r["k"], r["_change_type"]): r["x"]
        for r in t.changes(v0, t.current_version()).collect()
    }
    assert feed[(1, "update_preimage")] == 1
    assert feed[(1, "update_postimage")] == 10
    assert (2, "delete") in {k for k in feed}
    assert feed[(3, "insert")] == 3


def test_merge_into_mid_rescale_window(spark, tmp_path):
    """Stored rows still in legacy-spec files must match (read_raw's
    row-filtered legacy inclusion), not be silently treated as unmatched."""
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(i, i, "upsert", i) for i in range(20)]), "b0")
    t.rescale(8)  # lazy: nothing migrated yet
    assert t.manifest().get("legacy")
    t.merge_into(
        _src(spark, [(k, 100 + k) for k in range(20)]),
        when_matched_update="*",
        when_not_matched_insert=None,
    )
    assert _state(t) == {i: 100 + i for i in range(20)}


def test_merge_into_on_empty_table_inserts(spark, tmp_path):
    t = _mk(spark, tmp_path)
    st = t.merge_into(_src(spark, [(1, 1), (2, 2)]))
    assert st.events_in == 2
    assert _state(t) == {1: 1, 2: 2}


def test_assigning_key_columns_raises(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(1, 1, "upsert", 1)]), "b0")
    with pytest.raises(ValueError, match="key columns"):
        t.merge_into(_src(spark, [(1, 2)]), when_matched_update={"k": "s.k + 1"})


def test_mor_mode_merge_into(spark, tmp_path):
    """merge_into through a merge-on-read table resolves to the same state
    (the clause layer is commit-mode agnostic)."""
    t = _mk(spark, tmp_path, merge_mode="mor")
    t.merge(_delta(spark, [(1, 1, "upsert", 1), (2, 2, "upsert", 2)]), "b0")
    t.merge_into(
        _src(spark, [(1, 10), (3, 3)]),
        when_matched_update="*",
    )
    assert _state(t) == {1: 10, 2: 2, 3: 3}
    t.compact()
    assert _state(t) == {1: 10, 2: 2, 3: 3}


def test_merge_into_after_rollback_to_empty(spark, tmp_path):
    """Found by the CDF property test: after rollback to the create version
    the table stores no schema, and clause expressions over t.<col> must
    still analyze (as typed nulls) — every source row is unmatched."""
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(1, 1, "upsert", 1)]), "b0")
    t.rollback(0)
    t.merge_into(
        _src(spark, [(1, 10), (2, -5)]),
        when_matched_update={"x": "t.x + s.x"},
        when_matched_delete="s.x < 0",
        when_not_matched_insert="*",
        not_matched_condition="s.x > 0",
    )
    assert _state(t) == {1: 10}
