"""Kill-and-resume e2e for the deployable incremental-dedup job
(jobs/incremental_dedup.py): the job claims the CDC ingest's discipline
(registry ledger + per-epoch overwrite sink + streaming checkpoint), so —
like test_cdc_stream does for cdc_ingest — something must actually kill it
mid-stream and assert BOTH the registry and the accepted-docs sink converge
to the uninterrupted run's state (VERDICT r03 #3)."""

from __future__ import annotations

import importlib.util
import os
import time

import pytest
from pyspark.sql import functions as F

from pyetl_spark.functions.incremental import IncrementalDedup, IncrementalLsh


def _load_job():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "incremental_dedup_job", os.path.join(repo, "jobs", "incremental_dedup.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def job():
    return _load_job()


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    """4 single-file deliveries, 40 docs, 25 distinct bodies — duplicates
    land both within a file and across files, so the registry's history
    probe matters in every epoch."""
    d = str(tmp_path_factory.mktemp("docs"))
    rows = [(i, f"document body number {i % 25} with shared words") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for lo in range(0, 40, 10):
        df.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 10)).coalesce(
            1
        ).write.mode("append").parquet(d)
    return d


def _run_stream(spark, register, docs_dir: str, ckpt: str, stop_after=None) -> None:
    """drive the job's foreachBatch over the staged files (availableNow,
    one file per micro-batch). ``stop_after(n_committed)`` kills the query
    as soon as the predicate holds — a mid-stream crash."""
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    q = (
        stream.writeStream.foreachBatch(register)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if stop_after is None:
        q.awaitTermination(300)
        return
    deadline = time.time() + 180
    while time.time() < deadline and q.isActive:
        if stop_after():
            q.stop()
            break
        time.sleep(0.05)
    q.awaitTermination(120)


def _accepted_sink(spark, acc: str) -> set[int]:
    return {r["doc_id"] for r in spark.read.parquet(f"{acc}/batch=*").collect()}


def test_job_kill_and_resume_exact(spark, job, docs_dir, tmp_path):
    # ---------- baseline: uninterrupted run
    a = str(tmp_path / "a")
    reg_a = IncrementalDedup(spark, f"{a}/reg", nbuckets=4)
    _run_stream(
        spark, job.make_register(reg_a, f"{a}/acc"), docs_dir, f"{a}/ckpt"
    )
    want_reg = {(r["fp"], r["doc_id"]) for r in reg_a.accepted().collect()}
    want_sink = _accepted_sink(spark, f"{a}/acc")
    assert len(want_reg) == 25 and want_sink == {r for r in range(25)}

    # ---------- killed run: stop as soon as the FIRST epoch commits
    b = str(tmp_path / "b")
    reg_b = IncrementalDedup(spark, f"{b}/reg", nbuckets=4)
    _run_stream(
        spark,
        job.make_register(reg_b, f"{b}/acc"),
        docs_dir,
        f"{b}/ckpt",
        stop_after=lambda: len(reg_b.table.committed_batches()) >= 1,
    )
    n_mid = len(reg_b.table.committed_batches())
    assert n_mid >= 1  # it really started...
    # (it may occasionally drain fully before the poll sees it; the resume
    # below is then a no-op and the equality assertions still bind)

    # ---------- resume from the same checkpoint: must converge exactly
    reg_b2 = IncrementalDedup(spark, f"{b}/reg", nbuckets=4)
    _run_stream(
        spark, job.make_register(reg_b2, f"{b}/acc"), docs_dir, f"{b}/ckpt"
    )
    assert {(r["fp"], r["doc_id"]) for r in reg_b2.accepted().collect()} == want_reg
    assert _accepted_sink(spark, f"{b}/acc") == want_sink
    # resumed epochs continued under their original ids (ledger integrity)
    assert len(reg_b2.table.committed_batches()) == 4

    # ---------- checkpoint wipe: full source redelivery under the SAME
    # epoch ids — every merge is ledger-skipped, registry state and version
    # are untouched (the cdc_ingest probe, applied to the registry)
    v = reg_b2.table.current_version()
    reg_b3 = IncrementalDedup(spark, f"{b}/reg", nbuckets=4)
    _run_stream(
        spark, job.make_register(reg_b3, f"{b}/acc2"), docs_dir, f"{b}/ckpt_fresh"
    )
    assert reg_b3.table.current_version() == v
    assert {(r["fp"], r["doc_id"]) for r in reg_b3.accepted().collect()} == want_reg


def test_job_kill_and_resume_near_dup(spark, job, docs_dir, tmp_path):
    """same discipline for --near-dup mode: the candidate-pair sink after a
    mid-stream kill + resume equals the uninterrupted run's."""

    def pairs(acc: str) -> set[tuple[int, int]]:
        return {
            (r["a"], r["b"])
            for r in spark.read.parquet(f"{acc}/batch=*").select("a", "b").collect()
        }

    a = str(tmp_path / "a")
    lsh_a = IncrementalLsh(spark, f"{a}/reg", n_hashes=16, bands=8, k_shingle=2, nbuckets=4)
    _run_stream(
        spark,
        job.make_register(lsh_a, f"{a}/acc", near_dup=True, max_bucket=100),
        docs_dir,
        f"{a}/ckpt",
    )
    want = pairs(f"{a}/acc")
    assert want and all(x < y for x, y in want)

    b = str(tmp_path / "b")
    lsh_b = IncrementalLsh(spark, f"{b}/reg", n_hashes=16, bands=8, k_shingle=2, nbuckets=4)
    _run_stream(
        spark,
        job.make_register(lsh_b, f"{b}/acc", near_dup=True, max_bucket=100),
        docs_dir,
        f"{b}/ckpt",
        stop_after=lambda: len(lsh_b.table.committed_batches()) >= 1,
    )
    lsh_b2 = IncrementalLsh(spark, f"{b}/reg", n_hashes=16, bands=8, k_shingle=2, nbuckets=4)
    _run_stream(
        spark,
        job.make_register(lsh_b2, f"{b}/acc", near_dup=True, max_bucket=100),
        docs_dir,
        f"{b}/ckpt",
    )
    assert pairs(f"{b}/acc") == want
    assert {r["doc_id"] for r in lsh_b2.table.read().select("doc_id").collect()} == set(range(40))
