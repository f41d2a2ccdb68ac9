"""Multi-writer commit races — SnapshotTable.merge_retry (the Iceberg
optimistic-concurrency commit-retry analog).

The table's single-writer contract is enforced at the pointer swap
(ConcurrentWriteError); merge_retry turns that into safe multi-writer
coexistence: the loser re-plans against the fresh snapshot and re-commits.
These tests drive REAL concurrent writers (threads sharing one
SparkSession — Spark's supported concurrent-job-submission model) and
assert no lost updates, no double-applies, exact final LWW state."""

from __future__ import annotations

import os
import sys
import threading

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyetl_spark.cdc.tableio import ConcurrentWriteError, SnapshotTable  # noqa: E402


def _delta(spark, rows):
    return spark.createDataFrame(rows, ["k", "x", "op", "seq"])


def test_two_writers_interleaved_no_lost_updates(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), keys=["k"], nbuckets=4)
    n_batches, per = 4, 12
    errors: list[Exception] = []

    def writer(wid: int):
        try:
            for b in range(n_batches):
                lo = (wid * n_batches + b) * per
                rows = [(k % 30, k, "upsert", k) for k in range(lo, lo + per)]
                t.merge_retry(_delta(spark, rows), batch_id=f"w{wid}:{b + 1}")
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors

    # oracle: LWW over every event both writers produced
    oracle: dict[int, int] = {}
    best: dict[int, int] = {}
    for k in range(2 * n_batches * per):
        key = k % 30
        if k >= best.get(key, -1):
            best[key] = k
            oracle[key] = k
    got = {r["k"]: r["x"] for r in t.read().collect()}
    assert got == oracle

    # every batch from both writers actually committed (no lost commits)
    for wid in range(2):
        for b in range(n_batches):
            assert t.is_committed(f"w{wid}:{b + 1}"), (wid, b)


def test_retry_exhaustion_raises(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), keys=["k"], nbuckets=2)
    t.merge(_delta(spark, [(1, 1, "upsert", 1)]), "b1")

    class Always(SnapshotTable):
        def merge(self, *a, **k):  # simulate a permanently-hot pointer
            raise ConcurrentWriteError("busy")

    busy = Always(spark, str(tmp_path / "t"))
    with pytest.raises(ConcurrentWriteError):
        busy.merge_retry(_delta(spark, [(2, 2, "upsert", 2)]), "b2", retries=2)


def test_retry_is_idempotent_after_crash_replay(spark, tmp_path):
    # a batch that committed on a prior attempt is skipped by the ledger,
    # even through the retry loop
    t = SnapshotTable.create(spark, str(tmp_path / "t"), keys=["k"], nbuckets=2)
    st1 = t.merge_retry(_delta(spark, [(1, 10, "upsert", 1)]), "job:1")
    assert not st1.skipped
    st2 = t.merge_retry(_delta(spark, [(1, 99, "upsert", 999)]), "job:1")
    assert st2.skipped
    assert {r["k"]: r["x"] for r in t.read().collect()} == {1: 10}


def test_writer_vs_compactor_race(spark, tmp_path):
    # maintenance (compact) and a writer racing: whoever loses the pointer
    # swap retries/skips; state is never corrupted
    t = SnapshotTable.create(
        spark,
        str(tmp_path / "t"),
        keys=["k"],
        nbuckets=2,
        props={"max_file_rows": 8},
    )
    t.merge(_delta(spark, [(i, i, "upsert", i) for i in range(32)]), "seed")
    errors: list[Exception] = []

    def writer():
        try:
            for b in range(3):
                rows = [(i, 1000 + b, "upsert", 1000 + b) for i in range(0, 32, 5)]
                t.merge_retry(_delta(spark, rows), batch_id=f"wr:{b + 1}")
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def compactor():
        try:
            for _ in range(3):
                try:
                    t.compact(min_files=2)
                except ConcurrentWriteError:
                    pass  # maintenance skips the cycle, like table_maintain.py
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    th = [threading.Thread(target=writer), threading.Thread(target=compactor)]
    for x in th:
        x.start()
    for x in th:
        x.join()
    assert not errors, errors
    got = {r["k"]: r["x"] for r in t.read().collect()}
    want = {i: i for i in range(32)} | {i: 1002 for i in range(0, 32, 5)}
    assert got == want


def test_merge_into_racing_cdc_writer_no_lost_updates(spark, tmp_path):
    """A clause-layer writer (read-modify-write: x := x + 1 per key) racing
    a plain CDC event writer must never commit against a stale pre-image:
    merge_into_retry re-plans the JOIN on every conflict. The increment
    count must land exactly."""
    t = SnapshotTable.create(spark, str(tmp_path / "t"), keys=["k"], nbuckets=4)
    t.merge(_delta(spark, [(k, 0, "upsert", 0) for k in range(8)]), "seed")
    n_rounds = 6
    errors: list[Exception] = []

    def incrementer():
        try:
            src = spark.createDataFrame([(k,) for k in range(8)], ["k"])
            for b in range(n_rounds):
                t.merge_into_retry(
                    src,
                    when_matched_update={"x": "t.x + 1"},
                    when_not_matched_insert=None,
                    batch_id=f"inc:{b + 1}",
                )
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def cdc_writer():
        try:
            for b in range(n_rounds):
                # touches DIFFERENT keys, but the same buckets/pointer
                rows = [(100 + b, b, "upsert", 1_000_000 + b)]
                t.merge_retry(_delta(spark, rows), batch_id=f"cdc:{b + 1}")
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [
        threading.Thread(target=incrementer),
        threading.Thread(target=cdc_writer),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors

    got = {r["k"]: r["x"] for r in t.read().collect()}
    for k in range(8):
        assert got[k] == n_rounds, (k, got[k])  # every increment landed
    for b in range(n_rounds):
        assert got[100 + b] == b  # the CDC writer's rows all present


def test_expire_grace_spares_inflight_writer_files(spark, tmp_path):
    """A maintainer's expire racing a live writer: files staged under the
    next version dir exist BEFORE the manifest commit. With an orphan
    grace window they must survive the sweep; committed-but-superseded
    files must still be reclaimed immediately regardless of grace."""
    t = SnapshotTable.create(spark, str(tmp_path / "t"), keys=["k"], nbuckets=4)
    t.merge(_delta(spark, [(1, 1.0, "upsert", 1)]), batch_id="b1")
    t.merge(_delta(spark, [(1, 2.0, "upsert", 2)]), batch_id="b2")

    # simulate the writer mid-gap: fresh staged parquet, no manifest yet
    staged_dir = os.path.join(t.root, "data", "v00000099-aaaaaaaa", "__b=1")
    os.makedirs(staged_dir)
    staged = os.path.join(staged_dir, "part-00000-staged.parquet")
    with open(staged, "wb") as f:
        f.write(b"staged by an in-flight writer")

    res = t.expire_snapshots(keep_last=1, orphan_grace_s=3600)
    # v1's superseded bucket file was committed garbage: reclaimed now
    assert res["removed_manifests"] >= 1 and res["removed_files"] >= 1
    assert res["skipped_orphans"] == 1 and os.path.exists(staged)

    # past the grace window (grace 0) the true orphan is reclaimed too
    res2 = t.expire_snapshots(keep_last=1, orphan_grace_s=0.0)
    assert res2["skipped_orphans"] == 0 and not os.path.exists(staged)
