"""Deployable lake-maintenance job — the Iceberg ``rewrite_data_files`` +
``expire_snapshots`` maintenance pair for a SnapshotTable, run on a
schedule beside a streaming ingest (the reference's batch housekeeping
analog: jobcontrol.py job-completion sweeps).

Order matters and is fixed: COMPACT first (rewrite fragmented buckets into
clustered files — linear stats_cols sort or the z-order key, whichever the
table declares), then EXPIRE (drop manifests older than --keep-last and
delete unreferenced data files, including the pre-compaction copies just
superseded). Both are safe beside concurrent readers (files are immutable,
commits are atomic pointer swaps) and beside a concurrent writer: compact
raises ConcurrentWriteError instead of clobbering a mid-flight merge, and
this job treats that as "skip this cycle" (exit 0, the next cycle retries).
Expiry passes ``--orphan-grace`` (default 600 s) through to
``expire_snapshots(orphan_grace_s=...)`` so a writer's staged pre-commit
files — on disk before its manifest commit — are never swept mid-write.

``--rescale N`` changes the table's bucket count first (metadata-only
commit; see SnapshotTable.rescale — Iceberg partition-spec evolution): the
compact that follows in the same run migrates every un-migrated legacy
bucket to the new spec, so one maintenance cycle = a complete, atomic-per-
commit re-bucketing that never blocked the concurrent ingest.

``--alter '{"stats_cols": ["x"], ...}'`` evolves the engine layout props
first (metadata-only; see SnapshotTable.alter_props — Iceberg ALTER TABLE
SET TBLPROPERTIES / sort-order evolution): the compact that follows in the
same run re-lays existing files out under the new clustering/blooms, so
one maintenance cycle = a complete re-layout under the new sort order.

``--delete-where`` / ``--update-where`` run the row-level DML sweep BEFORE
compact+expire, so one maintenance cycle is the complete GDPR-erasure /
data-correction path: tombstone (or rewrite) the matching rows, fold the
touched buckets to clean files, then expire the pre-DML history — after
the run, the erased content is gone from live files AND from time travel
(within --keep-last). ``--dml-batch-id`` puts the sweep on the table
ledger: a rerun with the same id is a no-op, so the job stays
crash-safe-idempotent end to end.

``--rename OLD NEW`` / ``--drop-column NAME`` run the metadata-only column
evolution (SnapshotTable.rename_column/drop_column — Iceberg RENAME/DROP
COLUMN) BEFORE compact+expire, so one maintenance cycle is the complete
migration: the compact rewrites every file under the new physical names
and the expiry's name-registry prune frees the retired names as soon as
nothing retained still carries them. ``--add-constraint NAME EXPR`` /
``--drop-constraint NAME`` manage CHECK constraints (Delta constraint
analog; the add validates existing state first).

Usage:
    cd <repo> && zip -qr /tmp/pyetl_spark.zip pyetl_spark
    spark-submit --master <cluster|local[N]> --py-files /tmp/pyetl_spark.zip \
        jobs/table_maintain.py <table_root> [--min-files 2] [--keep-last 2] \
        [--rescale N] [--alter JSON] [--clone DEST [--clone-version V]] \
        [--delete-where JSON] [--update-where JSON] [--dml-batch-id ID] \
        [--add-column NAME TYPE] [--rename OLD NEW] [--drop-column NAME] \
        [--add-constraint NAME EXPR] [--drop-constraint NAME] \
        [--no-compact] [--no-expire] [--orphan-grace 600]

Prints one summary line: buckets compacted, files before/after, manifests
removed, data files removed, final version.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession

from pyetl_spark.cdc.tableio import ConcurrentWriteError, SnapshotTable


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("table_root")
    ap.add_argument("--min-files", type=int, default=2)
    ap.add_argument("--keep-last", type=int, default=2)
    ap.add_argument("--rescale", type=int, default=None, metavar="N")
    ap.add_argument(
        "--alter",
        default=None,
        metavar="JSON",
        help="JSON object of engine layout props to set before compacting "
        "(SnapshotTable.alter_props); keys prefixed '-' are unset",
    )
    ap.add_argument("--no-compact", action="store_true")
    ap.add_argument("--no-expire", action="store_true")
    ap.add_argument(
        "--orphan-grace",
        type=float,
        default=600.0,
        metavar="SECONDS",
        help="never-referenced files younger than this survive expiry — "
        "they may be a live writer's staged pre-commit files (Iceberg "
        "removeOrphanFiles older_than analog); committed-but-superseded "
        "files are always reclaimed regardless",
    )
    ap.add_argument(
        "--clone",
        default=None,
        metavar="DEST",
        help="before any maintenance, shallow-clone the table to DEST "
        "(SnapshotTable.clone — metadata-only, zero data copied); with "
        "--clone-version, clone that retained time-travel version. The "
        "maintenance flags still apply to the SOURCE table afterwards — "
        "note expiry on the source can reclaim files a clone references "
        "(Delta vacuum parity), so pair --clone with --no-expire unless "
        "the clone is throwaway",
    )
    ap.add_argument("--clone-version", type=int, default=None, metavar="V")
    ap.add_argument(
        "--delete-where",
        default=None,
        metavar="JSON",
        help='JSON list of [col, op, literal] filters, e.g. '
        '\'[["v", "<", 30]]\' — tombstone matching rows before compacting '
        "(SnapshotTable.delete_where; with expiry in the same run this is "
        "the complete erasure sweep)",
    )
    ap.add_argument(
        "--update-where",
        default=None,
        metavar="JSON",
        help='JSON {"set": {col: sql_expr}, "where": [[col, op, literal]]} '
        "— rewrite matching rows before compacting "
        "(SnapshotTable.update_where)",
    )
    ap.add_argument(
        "--dml-batch-id",
        default=None,
        metavar="ID",
        help="table-ledger batch id for the DML sweep; a rerun with the "
        "same id is a no-op (exactly-once under retries)",
    )
    ap.add_argument(
        "--add-column",
        nargs=2,
        default=None,
        metavar=("NAME", "TYPE"),
        help="add a typed column (metadata-only; readers see nulls until "
        "a write carries it)",
    )
    ap.add_argument(
        "--rename",
        nargs=2,
        default=None,
        metavar=("OLD", "NEW"),
        help="rename a column (metadata-only; the compact below migrates "
        "the files, the expiry prunes the retired name when free)",
    )
    ap.add_argument(
        "--drop-column",
        default=None,
        metavar="NAME",
        help="drop a payload column (metadata-only; bytes leave files at "
        "compact and history at expiry)",
    )
    ap.add_argument(
        "--add-constraint",
        nargs=2,
        default=None,
        metavar=("NAME", "EXPR"),
        help="add a CHECK constraint (validates existing state first)",
    )
    ap.add_argument(
        "--drop-constraint",
        default=None,
        metavar="NAME",
        help="remove a CHECK constraint",
    )
    ap.add_argument(
        "--verify",
        action="store_true",
        help="run the metadata fsck (SnapshotTable.verify) after "
        "maintenance; exit 1 on issues",
    )
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("pyetl_spark_table_maintain").getOrCreate()
    table = SnapshotTable(spark, args.table_root)

    cloned = ""
    if args.clone is not None:
        t2 = table.clone(args.clone, version=args.clone_version)
        cloned = f"cloned_to={args.clone} cloned_version={t2.current_version()} "

    c = {"compacted_buckets": 0, "files_before": 0, "files_after": 0}
    skipped = False
    dml = ""
    if args.delete_where is not None or args.update_where is not None:
        import json

        # one ledger id per DML op: with both flags set, suffix so the
        # second isn't swallowed by the first's ledger entry
        bid = args.dml_batch_id
        both = args.delete_where is not None and args.update_where is not None
        try:
            if args.delete_where is not None:
                filters = [tuple(f) for f in json.loads(args.delete_where)]
                st = table.delete_where(
                    filters, batch_id=f"{bid}:del" if bid and both else bid
                )
                dml += f"deleted={st.events_in} "
            if args.update_where is not None:
                spec = json.loads(args.update_where)
                st = table.update_where(
                    spec["set"],
                    [tuple(f) for f in spec["where"]],
                    batch_id=f"{bid}:upd" if bid and both else bid,
                )
                dml += f"updated={st.events_in} "
        except ConcurrentWriteError:
            skipped = True  # a merge landed mid-sweep; next cycle retries
    schema_ops = ""
    if args.add_column is not None:
        try:
            table.add_column(args.add_column[0], args.add_column[1])
            schema_ops += f"added_column={args.add_column[0]} "
        except ConcurrentWriteError:
            skipped = True
    if args.rename is not None:
        try:
            table.rename_column(args.rename[0], args.rename[1])
            schema_ops += f"renamed={args.rename[0]}:{args.rename[1]} "
        except ConcurrentWriteError:
            skipped = True
    if args.drop_column is not None:
        try:
            table.drop_column(args.drop_column)
            schema_ops += f"dropped_column={args.drop_column} "
        except ConcurrentWriteError:
            skipped = True
    if args.add_constraint is not None:
        try:
            table.add_constraint(args.add_constraint[0], args.add_constraint[1])
            schema_ops += f"constraint_added={args.add_constraint[0]} "
        except ConcurrentWriteError:
            skipped = True
    if args.drop_constraint is not None:
        try:
            table.drop_constraint(args.drop_constraint)
            schema_ops += f"constraint_dropped={args.drop_constraint} "
        except ConcurrentWriteError:
            skipped = True
    if args.alter is not None:
        import json

        spec = json.loads(args.alter)
        unset = [k[1:] for k in spec if k.startswith("-")]
        sets = {k: v for k, v in spec.items() if not k.startswith("-")}
        try:
            table.alter_props(sets, unset=unset)  # compact below re-lays out
        except ConcurrentWriteError:
            skipped = True
    if args.rescale is not None:
        try:
            table.rescale(args.rescale)  # lazy: compact below finishes it
        except ConcurrentWriteError:
            skipped = True
    if not args.no_compact:
        try:
            c = table.compact(min_files=args.min_files)
        except ConcurrentWriteError:
            skipped = True  # a merge landed mid-rewrite; next cycle retries

    e = {"removed_manifests": 0, "removed_files": 0}
    if not args.no_expire:
        e = table.expire_snapshots(
            keep_last=args.keep_last, orphan_grace_s=args.orphan_grace
        )

    fsck = ""
    rc = 0
    if args.verify:
        rep = table.verify(all_versions=True)
        fsck = (
            f" fsck_ok={str(rep['ok']).lower()}"
            f" fsck_issues={len(rep['issues'])}"
            f" orphan_files={rep['orphan_files']}"
        )
        for issue in rep["issues"]:
            print(f"fsck: {issue}", file=sys.stderr)
        rc = 0 if rep["ok"] else 1
    print(
        cloned + dml + schema_ops + f"compacted_buckets={c['compacted_buckets']} "
        f"files_before={c['files_before']} files_after={c['files_after']} "
        f"compact_skipped={str(skipped).lower()} "
        f"removed_manifests={e['removed_manifests']} "
        f"removed_files={e.get('removed_files', 0)} "
        f"freed_names={e.get('freed_names', 0)} "
        f"version={table.current_version()}" + fsck
    )
    return rc


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
