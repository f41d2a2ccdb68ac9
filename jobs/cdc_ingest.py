"""Deployable CDC ingest job — the north_rule's `spark-submit --py-files` path.

Tails a directory of change-event parquet batches (the binlog/WAL analog;
swap for `readStream.format("kafka")` + `from_json` on a real bus), applies
the transform-rule pipeline, LWW-dedups, MERGE-upserts into the snapshot
table exactly-once, and appends metrics/lineage — resumable from the
checkpoint at any kill point.

Usage:
    cd <repo> && zip -qr /tmp/pyetl_spark.zip pyetl_spark
    spark-submit --master <cluster|local[N]> --py-files /tmp/pyetl_spark.zip \
        jobs/cdc_ingest.py <events_dir> <table_dir> <checkpoint_dir> \
        [--nbuckets 32] [--max-files-per-trigger 4] [--keys repo,path]

On a cluster, spark-submit supplies the master and executor topology; the
job only layers SQL confs (pyetl_spark.session.get_spark does not override a
provided master). Re-submitting after completion is a fast no-op (committed-
batch ledger); deleting the checkpoint forces full source redelivery, which
the ledger absorbs without double-applying (idempotent MERGE).
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession

from pyetl_spark.cdc import SnapshotTable
from pyetl_spark.cdc.stream import StreamingIngest
from pyetl_spark.rules import Rule, RuleContext, compile_rules


def default_rules() -> list[Rule]:
    """The reference-parity transform stage: normalize lang, stamp the
    per-row sha256 invariant (input_hint), record origin lineage."""
    return [
        Rule(op="upper", out="lang", inp="lang"),
        Rule(op="checksum", out="content_sha", inp="content"),
        Rule(op="set", out="origin", default="cdc:[repo]"),
    ]


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("events_dir")
    ap.add_argument("table_dir")
    ap.add_argument("checkpoint_dir")
    ap.add_argument("--nbuckets", type=int, default=32)
    ap.add_argument("--max-files-per-trigger", type=int, default=4)
    ap.add_argument("--keys", default="repo,path")
    ap.add_argument("--no-transform", action="store_true")
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("pyetl_spark_cdc_ingest").getOrCreate()
    keys = [k.strip() for k in args.keys.split(",")]

    if SnapshotTable.exists(args.table_dir):
        table = SnapshotTable(spark, args.table_dir)
    else:
        table = SnapshotTable.create(spark, args.table_dir, keys=keys, nbuckets=args.nbuckets)

    transform = None if args.no_transform else compile_rules(default_rules(), RuleContext())
    ingest = StreamingIngest(
        spark,
        args.events_dir,
        table,
        args.checkpoint_dir,
        transform=transform,
        max_files_per_trigger=args.max_files_per_trigger,
    )
    ingest.run_until_drained()

    m = table.manifest()
    state = table.read()
    print(
        f"rows={state.count()} version={m['version']} "
        f"batches={len(m['committed_batches'])} max_seq={table.max_seq()}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
