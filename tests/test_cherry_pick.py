"""Cherry-pick — SnapshotTable.cherry_pick (the Iceberg
``cherrypick_snapshot`` analog): transplant one commit's row-level changes
onto a diverged head, completing write-audit-publish for the case
:meth:`publish`'s fast-forward refuses."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyetl_spark.cdc.tableio import SnapshotTable  # noqa: E402


def _mk(spark, tmp_path):
    return SnapshotTable.create(spark, str(tmp_path / "t"), keys=["k"], nbuckets=2)


def _delta(spark, rows):
    return spark.createDataFrame(rows, ["k", "x", "op", "seq"])


def _state(t) -> dict:
    return {r["k"]: r["x"] for r in t.read().collect()}


def test_pick_branch_commit_onto_diverged_main(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(1, 1, "upsert", 1), (2, 2, "upsert", 1)]), "b1")
    b = t.create_branch("audit")
    b.merge(_delta(spark, [(2, 222, "upsert", 5), (3, 3, "upsert", 5)]), "a1")
    picked = b.current_version()
    # main diverges: fast-forward publish must refuse, cherry-pick must not
    t.merge(_delta(spark, [(4, 4, "upsert", 2)]), "b2")
    with pytest.raises(ValueError, match="diverged|fast-forward"):
        t.publish("audit")
    st = t.cherry_pick(picked, batch_id="pick:1")
    assert not st.skipped
    assert _state(t) == {1: 1, 2: 222, 3: 3, 4: 4}
    # exactly-once: re-picking under the same id is a no-op
    assert t.cherry_pick(picked, batch_id="pick:1").skipped
    # the pick transplants the CHANGE, not the snapshot: a later commit
    # still wins over it
    t.merge(_delta(spark, [(2, 7, "upsert", 10_000)]), "b3")
    assert _state(t)[2] == 7


def test_pick_transplants_deletes(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(1, 1, "upsert", 1), (2, 2, "upsert", 1)]), "b1")
    b = t.create_branch("wip")
    b.merge(_delta(spark, [(1, 0, "delete", 5)]), "a1")
    picked = b.current_version()
    t.merge(_delta(spark, [(1, 99, "upsert", 6)]), "b2")  # diverge ON the key
    t.cherry_pick(picked)
    # the delete is re-applied TODAY: it wins over main's newer row, like a
    # user re-running the erase now
    assert _state(t) == {2: 2}


def test_pick_untouched_keys_keep_current_values(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(1, 1, "upsert", 1), (2, 2, "upsert", 1)]), "b1")
    b = t.create_branch("wip")
    b.merge(_delta(spark, [(1, 10, "upsert", 5)]), "a1")
    picked = b.current_version()
    t.merge(_delta(spark, [(2, 20, "upsert", 6)]), "b2")
    t.cherry_pick(picked)
    # key 2 was not part of the picked commit: main's value survives even
    # though the SOURCE SNAPSHOT still said x=2
    assert _state(t) == {1: 10, 2: 20}


def test_pick_metadata_commit_is_a_noop_change(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(1, 1, "upsert", 1)]), "b1")
    v = t.alter_props({"max_file_rows": 4})
    before = _state(t)
    t.cherry_pick(v)
    assert _state(t) == before


def test_pick_root_refused(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(1, 1, "upsert", 1)]), "b1")
    with pytest.raises(ValueError, match="create/clone root"):
        t.cherry_pick(0)


def test_pick_widens_schema(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_delta(spark, [(1, 1, "upsert", 1)]), "b1")
    b = t.create_branch("wip")
    b.merge(
        spark.createDataFrame([(2, 2, "new", "upsert", 5)], ["k", "x", "extra", "op", "seq"]),
        "a1",
    )
    picked = b.current_version()
    t.cherry_pick(picked)
    row = {r["k"]: (r["x"], r["extra"]) for r in t.read().collect()}
    assert row == {1: (1, None), 2: (2, "new")}
