"""Streaming change-feed consumer job (jobs/cdf_stream.py): the
table_changes source feeding the incremental view through foreachBatch,
exactly-once, interchangeable with the batch catch-up job on one view."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jobs.cdf_stream import start_stream  # noqa: E402
from jobs.cdf_view import consume  # noqa: E402
from pyetl_spark.cdc.tableio import SnapshotTable  # noqa: E402


def _delta(spark, rows):
    return spark.createDataFrame(rows, ["k", "grp", "x", "op", "seq"])


def _recompute(base):
    return {
        r["grp"]: (r["n"], float(r["s"]))
        for r in base.read()
        .groupBy("grp")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("x").cast("decimal(28,6)")).alias("s"),
        )
        .collect()
    }


def _view_state(spark, view_dir):
    from pyetl_spark.cdc.ivm import IncrementalAgg

    v = IncrementalAgg(spark, view_dir, ["grp"], ["x"])
    return {r["grp"]: (r["count"], float(r["sum_x"])) for r in v.state().collect()}


def _drain(spark, base_dir, view_dir, ckpt, **kw):
    q = start_stream(
        spark, base_dir, view_dir, ckpt, ["grp"], ["x"], starting_version="0", **kw
    )
    q.awaitTermination(240)


def test_stream_job_maintains_view_and_resumes(spark, tmp_path):
    base_dir, view_dir = str(tmp_path / "base"), str(tmp_path / "view")
    ckpt = str(tmp_path / "ckpt")
    base = SnapshotTable.create(spark, base_dir, keys=["k"], nbuckets=4)
    base.merge(_delta(spark, [(1, "a", 1.0, "upsert", 1), (2, "b", 2.0, "upsert", 2)]), "b0")
    base.merge(_delta(spark, [(3, "b", 3.0, "upsert", 3)]), "b1")

    _drain(spark, base_dir, view_dir, ckpt)
    assert _view_state(spark, view_dir) == _recompute(base)

    # idle rerun: nothing new, view untouched
    v_before = SnapshotTable(spark, view_dir).current_version()
    _drain(spark, base_dir, view_dir, ckpt)
    assert SnapshotTable(spark, view_dir).current_version() == v_before

    # base advances (update + delete + new group); resume the checkpoint
    base.merge(
        _delta(
            spark,
            [(1, "a", 9.0, "upsert", 10), (2, None, 0.0, "delete", 11), (4, "c", 4.0, "upsert", 12)],
        ),
        "b2",
    )
    _drain(spark, base_dir, view_dir, ckpt)
    assert _view_state(spark, view_dir) == _recompute(base)


def test_stream_job_exactly_once_after_checkpoint_loss(spark, tmp_path):
    base_dir, view_dir = str(tmp_path / "base"), str(tmp_path / "view")
    base = SnapshotTable.create(spark, base_dir, keys=["k"], nbuckets=4)
    base.merge(_delta(spark, [(1, "a", 1.0, "upsert", 1), (2, "b", 2.0, "upsert", 2)]), "b0")
    base.merge(_delta(spark, [(1, "a", 5.0, "upsert", 3)]), "b1")

    _drain(spark, base_dir, view_dir, str(tmp_path / "ck1"))
    want = _recompute(base)
    assert _view_state(spark, view_dir) == want

    # checkpoint lost: full source redelivery — the view's own per-commit
    # ledger (keys v<version>) absorbs every replayed slice
    _drain(spark, base_dir, view_dir, str(tmp_path / "ck2"))
    assert _view_state(spark, view_dir) == want


def test_stream_and_batch_consumers_share_one_ledger(spark, tmp_path):
    base_dir, view_dir = str(tmp_path / "base"), str(tmp_path / "view")
    base = SnapshotTable.create(spark, base_dir, keys=["k"], nbuckets=4)
    base.merge(_delta(spark, [(1, "a", 1.0, "upsert", 1)]), "b0")

    # day shift: batch catch-up applies v1
    consume(spark, base_dir, view_dir, ["grp"], ["x"])
    base.merge(_delta(spark, [(2, "b", 2.0, "upsert", 2)]), "b1")

    # night shift: the streaming tail (startingVersion=0 replays v1 too)
    # applies ONLY v2 — v1 is already in the shared ledger
    _drain(spark, base_dir, view_dir, str(tmp_path / "ckpt"))
    assert _view_state(spark, view_dir) == _recompute(base)
    ledger = SnapshotTable(spark, view_dir).committed_batches()
    assert {"v1", "v2"} <= set(ledger)
    # and the batch consumer can take over again without double-applying
    base.merge(_delta(spark, [(3, "c", 3.0, "upsert", 3)]), "b2")
    summary = consume(spark, base_dir, view_dir, ["grp"], ["x"])
    assert summary["applied_now"] == [3]
    assert _view_state(spark, view_dir) == _recompute(base)


def test_stream_minmax_boundary_retraction(spark, tmp_path):
    """Streaming consumer with min/max: a commit that retracts a group's
    boundary value recomputes against the base AT that commit's version
    inside foreachBatch, and the drained view equals a recompute."""
    base_dir = str(tmp_path / "base")
    view_dir = str(tmp_path / "view")
    ckpt = str(tmp_path / "ckpt")
    base = SnapshotTable.create(spark, base_dir, keys=["k"], nbuckets=4)
    base.merge(_delta(spark, [(1, "a", 1.0, "upsert", 1), (2, "a", 5.0, "upsert", 2)]), "b0")
    base.merge(_delta(spark, [(1, "a", 0.0, "delete", 3)]), "b1")  # retract min
    base.merge(_delta(spark, [(3, "a", 0.5, "upsert", 4), (4, "b", 7.0, "upsert", 5)]), "b2")

    q = start_stream(
        spark, base_dir, view_dir, ckpt, ["grp"], [], ["x"], ["x"],
        starting_version="0",
    )
    q.awaitTermination(120)
    from pyetl_spark.cdc.ivm import IncrementalAgg

    v = IncrementalAgg(spark, view_dir, ["grp"], [], min_cols=["x"], max_cols=["x"])
    got = {r["grp"]: (r["count"], r["min_x"], r["max_x"]) for r in v.state().collect()}
    assert got == {"a": (2, 0.5, 5.0), "b": (1, 7.0, 7.0)}


def test_stream_distinct_col_interchangeable_with_batch(spark, tmp_path):
    """--distinct-col on the streaming tail: the chained count(DISTINCT)
    view drains commits exactly-once, matches a from-scratch recompute
    incl. across a delete, and shares ledger keys with the batch job —
    a follow-up cdf_view catch-up on the same view applies nothing."""
    from pyetl_spark.cdc.ivm import IncrementalDistinct

    base_dir = str(tmp_path / "base")
    view_dir = str(tmp_path / "view")
    ckpt = str(tmp_path / "ckpt")
    base = SnapshotTable.create(spark, base_dir, keys=["k"], nbuckets=4)
    base.merge(
        _delta(spark, [(1, "a", 1.0, "upsert", 1), (2, "a", 1.0, "upsert", 2),
                       (3, "a", 3.0, "upsert", 3), (4, "b", 9.0, "upsert", 4)]),
        "b0",
    )
    base.merge(_delta(spark, [(2, "a", 0.0, "delete", 5)]), "b1")

    q = start_stream(
        spark, base_dir, view_dir, ckpt, ["grp"], [],
        distinct_col="x", starting_version="0",
    )
    q.awaitTermination(240)

    d = IncrementalDistinct(spark, view_dir, ["grp"], "x")
    got = {r["grp"]: r["n_distinct"] for r in d.state().collect()}
    # group a: values {1.0, 3.0} after k=2's delete (1.0 still carried by k=1)
    assert got == {"a": 2, "b": 1}

    # batch catch-up on the SAME view: everything already ledgered
    s = consume(spark, base_dir, view_dir, ["grp"], [], distinct_col="x")
    assert s["applied_now"] == []
    assert {r["grp"]: r["n_distinct"] for r in d.state().collect()} == got

    # new commit: a fresh stream drain picks up only that commit
    base.merge(_delta(spark, [(9, "b", 9.0, "upsert", 6)]), "b2")
    q = start_stream(
        spark, base_dir, view_dir, str(tmp_path / "ckpt2"), ["grp"], [],
        distinct_col="x", starting_version="0",
    )
    q.awaitTermination(240)
    assert {r["grp"]: r["n_distinct"] for r in d.state().collect()} == {"a": 2, "b": 1}
