"""Deployable STREAMING change-feed consumer — the always-on sibling of
jobs/cdf_view.py: tails a SnapshotTable's commit log through the
``table_changes`` Structured-Streaming source (cdc/cdf_source.py) and
maintains the same incremental aggregate view (cdc/ivm.py), exactly-once.

Exactly-once is belt-and-braces: Spark's checkpoint tracks the VERSION
offset (a restarted stream resumes at the last committed commit range),
and inside foreachBatch each commit's slice is applied under the ledger
key ``v<version>`` — the SAME key the batch catch-up job uses, so the two
consumers are interchangeable on one view: run the batch job during the
day, attach the streaming tail at night, and a replayed micro-batch
(checkpoint lost, job retried) no-ops against the view's own ledger.

Usage:
    cd <repo> && zip -qr /tmp/pyetl_spark.zip pyetl_spark
    spark-submit --master <cluster|local[N]> --py-files /tmp/pyetl_spark.zip \
        jobs/cdf_stream.py <base_table_dir> <view_dir> <checkpoint_dir> \
        --group-cols event_type [--sum-cols value] \
        [--min-cols value] [--max-cols value] [--sumsq-cols value] \
        [--distinct-col value] \
        [--starting-version 0] [--max-commits-per-batch 64] \
        [--follow <seconds>]

Default trigger is availableNow (drain everything committed, then exit —
cron-able and testable); ``--follow N`` switches to a ProcessingTime
trigger for an always-on tail. Scale shape: the source reads only the
buckets each commit's manifest diff names, the view reads only the state
buckets the slice's groups hash into — an idle base table costs nothing.

Reference analog: pyetl's worker loop over arriving inputs
(pyetl.py multiprocessing fan-out + jobcontrol.py completion markers),
recast as a checkpointed streaming subscription.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyetl_spark.cdc import cdf_source
from pyetl_spark.cdc.ivm import IncrementalAgg, IncrementalDistinct
from pyetl_spark.cdc.tableio import SnapshotTable


def start_stream(
    spark: SparkSession,
    base_dir: str,
    view_dir: str,
    checkpoint_dir: str,
    group_cols: list[str],
    sum_cols: list[str],
    min_cols: list[str] = (),
    max_cols: list[str] = (),
    sumsq_cols: list[str] = (),
    distinct_col: str | None = None,
    starting_version: str = "current",
    max_commits_per_batch: int = 64,
    follow_seconds: float | None = None,
):
    """Open the feed stream and attach the view-maintaining sink; returns
    the StreamingQuery (caller awaits/stops it). ``distinct_col`` switches
    to the chained count(DISTINCT col) view (IncrementalDistinct) — its
    per-commit ledger ids match the batch job's, so the streaming tail and
    cdf_view catch-up runs are interchangeable on one distinct view too."""
    if distinct_col:
        if sum_cols or min_cols or max_cols or sumsq_cols:
            raise ValueError("--distinct-col is exclusive of sum/min/max/sumsq cols")
        view = IncrementalDistinct(spark, view_dir, group_cols, distinct_col)
    else:
        view = IncrementalAgg(
            spark, view_dir, group_cols, sum_cols,
                min_cols=min_cols, max_cols=max_cols, sumsq_cols=sumsq_cols
        )
    needs_base = bool(min_cols or max_cols)
    base = SnapshotTable(spark, base_dir) if needs_base else None
    feed = cdf_source.read_stream_changes(
        spark,
        base_dir,
        startingVersion=starting_version,
        maxCommitsPerBatch=max_commits_per_batch,
    )

    def _apply(batch: DataFrame, _epoch: int) -> None:
        # one ledgered apply PER COMMIT inside the micro-batch: the key is
        # the commit version, not the epoch, so exactly-once survives even
        # a deleted checkpoint (replayed commits no-op against the ledger)
        batch = batch.localCheckpoint(eager=True)
        versions = sorted(
            r[0] for r in batch.select("_commit_version").distinct().collect()
        )
        for v in versions:
            commit_slice = batch.filter(F.col("_commit_version") == v)
            if distinct_col:
                view.apply(commit_slice, batch_id=f"v{v}")
            else:
                view.apply(
                    commit_slice,
                    batch_id=f"v{v}",
                    # min/max boundary retractions recompute against the base
                    # AT COMMIT v (time travel), same as the batch catch-up job
                    base=base.read(version=v) if needs_base else None,
                )

    writer = feed.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if follow_seconds:
        writer = writer.trigger(processingTime=f"{follow_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("base_dir")
    ap.add_argument("view_dir")
    ap.add_argument("checkpoint_dir")
    ap.add_argument("--group-cols", required=True, help="comma-separated")
    ap.add_argument("--sum-cols", default="", help="comma-separated")
    ap.add_argument("--min-cols", default="", help="comma-separated")
    ap.add_argument("--max-cols", default="", help="comma-separated")
    ap.add_argument(
        "--sumsq-cols",
        default="",
        help="comma-separated; additive sum-of-squares for derived AVG/VAR",
    )
    ap.add_argument(
        "--distinct-col",
        default=None,
        help="maintain count(DISTINCT col) per group instead (chained IVM)",
    )
    ap.add_argument("--starting-version", default="0")
    ap.add_argument("--max-commits-per-batch", type=int, default=64)
    ap.add_argument("--follow", type=float, default=None, metavar="SECONDS")
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("cdf-stream").getOrCreate()
    try:
        q = start_stream(
            spark,
            args.base_dir,
            args.view_dir,
            args.checkpoint_dir,
            [c for c in args.group_cols.split(",") if c],
            [c for c in args.sum_cols.split(",") if c],
            [c for c in args.min_cols.split(",") if c],
            [c for c in args.max_cols.split(",") if c],
            sumsq_cols=[c for c in args.sumsq_cols.split(",") if c],
            distinct_col=args.distinct_col,
            starting_version=args.starting_version,
            max_commits_per_batch=args.max_commits_per_batch,
            follow_seconds=args.follow,
        )
        q.awaitTermination()
        gcols = [c for c in args.group_cols.split(",") if c]
        if args.distinct_col:
            view = IncrementalDistinct(spark, args.view_dir, gcols, args.distinct_col)
            summary = {
                "view_version": view.outer.table.current_version(),
                "groups": view.state().count(),
            }
        else:
            view = IncrementalAgg(
                spark,
                args.view_dir,
                gcols,
                [c for c in args.sum_cols.split(",") if c],
                min_cols=[c for c in args.min_cols.split(",") if c],
                max_cols=[c for c in args.max_cols.split(",") if c],
                sumsq_cols=[c for c in args.sumsq_cols.split(",") if c],
            )
            summary = {
                "view_version": view.table.current_version(),
                "groups": view.state().count(),
            }
        print(json.dumps(summary))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
