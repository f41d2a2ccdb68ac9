"""Merge-on-read commits (Iceberg v2 row-delta analog).

``merge(mode="mor")`` appends the in-batch-deduped delta instead of
rewriting touched buckets; readers resolve LWW over the appended row
versions, ``compact()`` folds them back, and COW merges interleave freely.
Reference parity: the same lecture → transformation → ecriture event
semantics as the COW path (SURVEY §2.9); the mode only changes the commit's
physical shape, never the visible state.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pyetl_spark.cdc import SnapshotTable

from conftest import rows  # noqa: E402


def _mk(spark, root, **kw):
    return SnapshotTable.create(spark, os.path.join(root, "t"), keys=["k"], **kw)


def _ev(spark, triples):
    """triples: (k, val, op, seq)"""
    return spark.createDataFrame(triples, ["k", "val", "op", "seq"])


BATCHES = [
    [("a", 1, "upsert", 1), ("b", 2, "upsert", 2), ("c", 3, "upsert", 3)],
    [("a", 10, "upsert", 4), ("b", 0, "delete", 5), ("d", 4, "upsert", 6)],
    # stale event for a (seq 0 loses), in-batch duplicate for d
    [("a", 99, "upsert", 0), ("d", 40, "upsert", 7), ("d", 41, "upsert", 8)],
    [("b", 20, "upsert", 9), ("c", 0, "delete", 10)],
]
FINAL = [("a", 10), ("b", 20), ("d", 41)]


def _replay(spark, root, modes):
    t = _mk(spark, root, nbuckets=4)
    for i, (batch, mode) in enumerate(zip(BATCHES, modes)):
        t.merge(_ev(spark, batch), batch_id=f"m{i}", mode=mode)
    return t


@pytest.mark.parametrize(
    "modes",
    [
        ["mor", "mor", "mor", "mor"],
        ["cow", "mor", "cow", "mor"],
        ["mor", "cow", "mor", "cow"],
    ],
    ids=["all-mor", "cow-mor-interleaved", "mor-cow-interleaved"],
)
def test_mor_state_matches_cow(spark, tmp_path, modes):
    cow = _replay(spark, str(tmp_path / "cow"), ["cow"] * 4)
    alt = _replay(spark, str(tmp_path / "alt"), modes)
    assert rows(cow.read(), "k", "val") == rows(alt.read(), "k", "val") == FINAL
    # time travel resolves at every version too
    for v in range(1, 5):
        assert rows(cow.read(version=v), "k", "val") == rows(
            alt.read(version=v), "k", "val"
        )


def test_mor_appends_do_not_rewrite_base(spark, tmp_path):
    t = _mk(spark, str(tmp_path), nbuckets=2)
    t.merge(_ev(spark, BATCHES[0]), batch_id="m0")  # COW seed
    base_files = {f for fs in t.manifest()["buckets"].values() for f in fs}
    st = t.merge(_ev(spark, BATCHES[1]), batch_id="m1", mode="mor")
    assert st.mode == "mor"
    after = {f for fs in t.manifest()["buckets"].values() for f in fs}
    assert base_files <= after, "MOR must keep every base file referenced"
    assert t.dirty_buckets(), "appended-over buckets must be marked dirty"
    # a fresh bucket written only by one in-batch-deduped MOR commit is clean
    t2 = _mk(spark, str(tmp_path / "fresh"), nbuckets=2)
    t2.merge(_ev(spark, BATCHES[0]), batch_id="m0", mode="mor")
    assert t2.dirty_buckets() == []
    assert rows(t2.read(), "k", "val") == [("a", 1), ("b", 2), ("c", 3)]


def test_mor_scan_never_returns_superseded_rows(spark, tmp_path):
    t = _mk(spark, str(tmp_path), nbuckets=1, props={"stats_cols": ["val"]})
    t.merge(_ev(spark, [("a", 1, "upsert", 1), ("b", 2, "upsert", 2)]), batch_id="m0")
    t.merge(_ev(spark, [("a", 100, "upsert", 3)]), batch_id="m1", mode="mor")
    # the superseded (a, 1) row matches val < 50 but must not surface
    assert rows(t.scan([("val", "<", 50)]), "k", "val") == [("b", 2)]
    assert rows(t.scan([("val", ">", 50)]), "k", "val") == [("a", 100)]
    # after compaction the same scans hold and files can prune again
    t.compact(min_files=2)
    assert t.dirty_buckets() == []
    assert rows(t.scan([("val", "<", 50)]), "k", "val") == [("b", 2)]
    assert rows(t.scan([("val", ">", 50)]), "k", "val") == [("a", 100)]


def test_mor_compact_folds_row_versions(spark, tmp_path):
    t = _replay(spark, str(tmp_path), ["cow", "mor", "mor", "mor"])
    assert t.dirty_buckets()
    before = sum(len(fs) for fs in t.manifest()["buckets"].values())
    out = t.compact(min_files=2)
    assert out["compacted_buckets"] >= 1
    assert t.dirty_buckets() == []
    after = sum(len(fs) for fs in t.manifest()["buckets"].values())
    assert after < before
    assert rows(t.read(), "k", "val") == FINAL
    # physical fold: raw files now hold exactly one row per key
    raw = t.read_raw()
    assert raw.count() == raw.select("k").distinct().count()


def test_mor_idempotent_replay_and_ledger(spark, tmp_path):
    t = _mk(spark, str(tmp_path), nbuckets=2)
    t.merge(_ev(spark, BATCHES[0]), batch_id="m0", mode="mor")
    st = t.merge(_ev(spark, BATCHES[0]), batch_id="m0", mode="mor")
    assert st.skipped
    assert rows(t.read(), "k", "val") == [("a", 1), ("b", 2), ("c", 3)]


def test_mor_schema_evolution(spark, tmp_path):
    t = _mk(spark, str(tmp_path), nbuckets=2)
    t.merge(_ev(spark, BATCHES[0]), batch_id="m0", mode="mor")
    wide = spark.createDataFrame(
        [("a", 10, "fr", "upsert", 4), ("e", 5, "de", "upsert", 5)],
        ["k", "val", "lang", "op", "seq"],
    )
    t.merge(wide, batch_id="m1", mode="mor")
    got = rows(t.read(), "k", "val", "lang")
    assert got == [
        ("a", 10, "fr"),
        ("b", 2, None),
        ("c", 3, None),
        ("e", 5, "de"),
    ]
    # same-name type conflict raises at plan time, like the COW union would
    bad = spark.createDataFrame([("a", "oops", "upsert", 6)], ["k", "val", "op", "seq"])
    with pytest.raises(ValueError, match="type conflict"):
        t.merge(bad, batch_id="m2", mode="mor")


def test_mor_change_feed_matches_cow(spark, tmp_path):
    cow = _replay(spark, str(tmp_path / "cow"), ["cow"] * 4)
    mor = _replay(spark, str(tmp_path / "mor"), ["mor"] * 4)
    for a, b in [(0, 1), (1, 2), (2, 3), (3, 4), (0, 4)]:
        ca = rows(cow.changes(a, b), "k", "val", "_change_type", "_commit_version")
        cb = rows(mor.changes(a, b), "k", "val", "_change_type", "_commit_version")
        assert ca == cb, f"feed mismatch on ({a},{b}]"


def test_merge_mode_table_prop_default(spark, tmp_path):
    t = _mk(spark, str(tmp_path), nbuckets=2, props={"merge_mode": "mor"})
    t.merge(_ev(spark, BATCHES[0]), batch_id="m0")
    st = t.merge(_ev(spark, BATCHES[1]), batch_id="m1")
    assert st.mode == "mor"
    assert t.dirty_buckets()
    with pytest.raises(ValueError, match="unknown mode"):
        t.merge(_ev(spark, BATCHES[2]), batch_id="m2", mode="sideways")


def test_mor_read_is_bucket_pruned(spark, tmp_path):
    """resolved_raw shuffles ONLY dirty buckets: clean buckets must stream
    through with no aggregate on their path."""
    t = _mk(spark, str(tmp_path), nbuckets=8)
    seed = [(f"k{i}", i, "upsert", i + 1) for i in range(64)]
    t.merge(_ev(spark, seed), batch_id="m0")
    t.merge(_ev(spark, [("k1", 999, "upsert", 100)]), batch_id="m1", mode="mor")
    dirty = t.dirty_buckets()
    assert len(dirty) == 1
    clean_plan = t.read(
        buckets=[b for b in range(8) if b not in dirty]
    )._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" not in clean_plan, (
        "clean-bucket read must not pay the MOR resolution aggregate"
    )
    assert rows(t.read().filter(F.col("k") == "k1"), "k", "val") == [("k1", 999)]
