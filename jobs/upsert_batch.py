"""Deployable conditional-upsert job — the clause-layer (MERGE INTO) analog
of jobs/cdc_ingest.py, for the batch business-upsert shape pyetl runs as
`maj:`-keyed UPDATE-vs-INSERT loads (reference traitement_db.py
update/insert command split; pyetl.py job entry points).

Reads ONE source batch (any format read_any supports; must be unique on the
table keys), applies MERGE INTO clauses given as SQL expressions over the
``t.``/``s.`` aliases, and commits through merge_into_retry — optimistic
concurrency beside a live streaming ingest, exactly-once under --batch-id
(re-submitting the same batch id is a fast no-op).

Usage:
    cd <repo> && zip -qr /tmp/pyetl_spark.zip pyetl_spark
    spark-submit --master <cluster|local[N]> --py-files /tmp/pyetl_spark.zip \
        jobs/upsert_batch.py <source_path> <table_dir> \
        [--batch-id ID] \
        [--update '{"col": "s.col", ...}' | --update-all] \
        [--update-when SQLCOND] \
        [--delete-when SQLCOND] \
        [--insert '{"col": "s.col", ...}' | --insert-all | --no-insert] \
        [--insert-when SQLCOND] \
        [--format parquet]

Prints one summary line: events_in (delta rows the clauses emitted),
buckets_touched, version, skipped.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession

from pyetl_spark.cdc import SnapshotTable


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("source_path")
    ap.add_argument("table_dir")
    ap.add_argument("--batch-id", default=None)
    ap.add_argument("--update", default=None, metavar="JSON")
    ap.add_argument("--update-all", action="store_true")
    ap.add_argument("--update-when", default=None, metavar="SQLCOND")
    ap.add_argument("--delete-when", default=None, metavar="SQLCOND")
    ap.add_argument("--insert", default=None, metavar="JSON")
    ap.add_argument("--insert-all", action="store_true")
    ap.add_argument("--no-insert", action="store_true")
    ap.add_argument("--insert-when", default=None, metavar="SQLCOND")
    ap.add_argument("--format", default="parquet")
    ap.add_argument("--retries", type=int, default=5)
    args = ap.parse_args(argv)

    upd = "*" if args.update_all else (json.loads(args.update) if args.update else None)
    if args.no_insert:
        ins = None
    elif args.insert:
        ins = json.loads(args.insert)
    else:
        ins = "*"  # merge_into's default: insert every source payload column
    if upd is None and args.delete_when is None and ins is None:
        raise SystemExit("upsert_batch: no clauses given")

    spark = SparkSession.builder.appName("pyetl_spark_upsert_batch").getOrCreate()
    source = spark.read.format(args.format).load(args.source_path)
    table = SnapshotTable(spark, args.table_dir)
    st = table.merge_into_retry(
        source,
        retries=args.retries,
        when_matched_update=upd,
        matched_condition=args.update_when,
        when_matched_delete=args.delete_when,
        when_not_matched_insert=ins,
        not_matched_condition=args.insert_when,
        batch_id=args.batch_id,
    )
    print(
        f"events_in={st.events_in} buckets_touched={st.buckets_touched} "
        f"version={st.version} skipped={str(st.skipped).lower()}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
