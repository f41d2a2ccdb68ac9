"""Deployable incremental-dedup job — the training-data counterpart of
cdc_ingest.py: tail a directory of document parquet batches and register
each batch against the persistent fingerprint registry
(functions/incremental.IncrementalDedup), writing ACCEPTED (first-seen)
documents to a partitioned sink. The registry is a SnapshotTable, so the
whole CDC discipline applies: atomic commits, batch ledger (a re-delivered
micro-batch cannot double-insert), expiry/compaction, restart-safe.

Each micro-batch joins ONLY the registry (fingerprints + ids, ~1-2% of
corpus bytes), never the accepted corpus — at 100 TB the per-batch cost is
the batch's own hash-agg plus a bucket-pruned anti-join.

Usage:
    cd <repo> && zip -qr /tmp/pyetl_spark.zip pyetl_spark
    spark-submit --master <cluster|local[N]> --py-files /tmp/pyetl_spark.zip \
        jobs/incremental_dedup.py <docs_dir> <registry_dir> <accepted_dir> \
        <checkpoint_dir> [--nbuckets 32] [--text-col text] [--id-col doc_id]

Exactly-once: the streaming checkpoint dedups source files; inside
foreachBatch the registry MERGE is ledger-guarded by the epoch id and the
accepted-docs sink writes one overwritten directory per batch id, so a
replayed epoch rewrites the same output instead of appending duplicates.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pyetl_spark.functions.incremental import IncrementalDedup


def make_register(
    registry,
    accepted_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    near_dup: bool = False,
    max_bucket: int = 50,
):
    """the job's foreachBatch body, exposed so tests can drive the exact
    production code path (kill mid-stream, resume from checkpoint) without
    going through argv."""

    def _register(batch, epoch_id: int) -> None:
        kw = {"max_bucket": max_bucket} if near_dup else {}
        out = registry.ingest(
            batch, batch_id=f"epoch:{epoch_id}",
            text_col=text_col, id_col=id_col, **kw,
        )
        # idempotent per-epoch sink: replay overwrites, never appends twice
        # (ingest return values are replay-idempotent for both registries)
        if near_dup:  # out = candidate pairs (a, b, band_idx)
            out.write.mode("overwrite").parquet(f"{accepted_dir}/batch={epoch_id}")
        else:  # out = accepted (doc_id, fp): keep the full accepted rows
            (
                batch.join(out.select(F.col("doc_id").alias(id_col)), id_col)
                .write.mode("overwrite")
                .parquet(f"{accepted_dir}/batch={epoch_id}")
            )

    return _register


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("docs_dir")
    ap.add_argument("registry_dir")
    ap.add_argument("accepted_dir")
    ap.add_argument("checkpoint_dir")
    ap.add_argument("--nbuckets", type=int, default=32)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--max-files-per-trigger", type=int, default=4)
    ap.add_argument(
        "--near-dup",
        action="store_true",
        help="use the MinHash band registry (IncrementalLsh) instead of the "
        "exact fingerprint registry: each epoch writes its candidate "
        "near-dup pairs (a, b, band_idx), a < b, against all history",
    )
    ap.add_argument("--n-hashes", type=int, default=32)
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--k-shingle", type=int, default=3)
    ap.add_argument("--hash-family", default="xx", choices=("xx", "md5"))
    ap.add_argument("--max-bucket", type=int, default=50)
    ap.add_argument(
        "--schema",
        default=None,
        help="DDL schema for the document stream (e.g. 'doc_id long, text "
        "string'); skips the startup directory-listing inference and lets "
        "the job start on a not-yet-populated directory",
    )
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("pyetl_spark_incremental_dedup").getOrCreate()
    if args.near_dup:
        from pyetl_spark.functions.incremental import IncrementalLsh

        # banding parameters are persisted in the registry manifest at create
        # time; reopening an existing registry with different values raises
        # instead of silently probing with incompatible band keys
        registry = IncrementalLsh(
            spark,
            args.registry_dir,
            n_hashes=args.n_hashes,
            bands=args.bands,
            k_shingle=args.k_shingle,
            hash_family=args.hash_family,
            nbuckets=args.nbuckets,
        )
    else:
        registry = IncrementalDedup(spark, args.registry_dir, nbuckets=args.nbuckets)

    if args.schema:
        schema = args.schema
    else:
        try:
            schema = spark.read.parquet(args.docs_dir).schema
        except Exception as exc:
            print(
                f"cannot infer schema from {args.docs_dir} (empty or missing?); "
                "pass --schema 'doc_id long, text string' to start the tail "
                "before the first delivery lands",
                file=sys.stderr,
            )
            raise SystemExit(2) from exc

    _register = make_register(
        registry, args.accepted_dir,
        text_col=args.text_col, id_col=args.id_col,
        near_dup=args.near_dup, max_bucket=args.max_bucket,
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", args.max_files_per_trigger)
        .parquet(args.docs_dir)
    )
    q = (
        stream.writeStream.foreachBatch(_register)
        .option("checkpointLocation", args.checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = spark.read.parquet(f"{args.accepted_dir}/batch=*")
    if args.near_dup:
        print(f"registry={registry.table.read().count()} candidate_pairs={out.count()}")
    else:
        print(f"registry={registry.accepted().count()} accepted_rows={out.count()}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
