"""e2e for the deployable conditional-upsert job (jobs/upsert_batch.py):
clause flags map to merge_into, re-submitting the same batch id is a no-op,
and clause-less invocations are refused."""

from __future__ import annotations

import importlib.util
import os

import pytest
from pyspark.sql import functions as F

from pyetl_spark.cdc.tableio import SnapshotTable


def _load_job():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "upsert_batch_job", os.path.join(repo, "jobs", "upsert_batch.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def job():
    return _load_job()


def test_upsert_job_clauses_and_idempotence(spark, job, tmp_path, capsys):
    root = str(tmp_path / "t")
    t = SnapshotTable.create(spark, root, keys=["k"], nbuckets=2)
    t.merge(
        spark.createDataFrame(
            [(k, k * 10, "upsert", k) for k in range(6)], ["k", "x", "op", "seq"]
        ),
        "seed",
    )
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(0, -1), (1, 7), (9, 9)], ["k", "x"]
    ).write.parquet(src)

    args = [
        src, root, "--batch-id", "up:1",
        "--update", '{"x": "t.x + s.x"}', "--update-when", "s.x > 0",
        "--delete-when", "s.x < 0",
        "--insert-all", "--insert-when", "s.x > 0",
    ]
    assert job.main(args) == 0
    out = capsys.readouterr().out
    assert "events_in=3" in out and "skipped=false" in out
    got = {r["k"]: r["x"] for r in t.read().collect()}
    assert got == {1: 17, 2: 20, 3: 30, 4: 40, 5: 50, 9: 9}

    # same batch id again: fast no-op, state unchanged
    assert job.main(args) == 0
    assert "skipped=true" in capsys.readouterr().out
    assert {r["k"]: r["x"] for r in t.read().collect()} == got


def test_upsert_job_refuses_clause_less_call(spark, job, tmp_path):
    src = str(tmp_path / "src2")
    spark.createDataFrame([(1, 1)], ["k", "x"]).write.parquet(src)
    with pytest.raises(SystemExit, match="no clauses"):
        job.main([src, str(tmp_path / "t2"), "--no-insert"])
