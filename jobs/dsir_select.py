"""Deployable DSIR data-selection job: score every document by how
target-like its hashed n-gram distribution is (Xie et al., NeurIPS 2023),
then keep the top-k — deterministic rank or seeded Gumbel-top-k resample —
and write the selected rows (with their weights) as parquet.

Usage:
    cd <repo> && zip -qr /tmp/pyetl_spark.zip pyetl_spark
    spark-submit --master <cluster|local[N]> --py-files /tmp/pyetl_spark.zip \
        jobs/dsir_select.py <docs_parquet_dir> <out_dir> \
        --target "lang = 'en'" --k 100000 \
        [--resample] [--buckets 8192] [--alpha 1.0] [--seed 42]

``--target`` is any Spark SQL boolean expression over the input columns
(the in-corpus target subset the selection should imitate). Scale notes:
two corpus-linear passes (bucket-stats hash agg -> <= buckets rows,
broadcast back; per-doc fold, map-side combinable), selection is
TakeOrdered (per-partition heap, no global sort), and the final write joins
selected ids back to the input on the doc key (broadcast when k is small).
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pyetl_spark.functions import dsir


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("docs_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--target", required=True, help="SQL boolean expr marking the target subset")
    ap.add_argument("--k", type=int, required=True)
    ap.add_argument("--resample", action="store_true", help="Gumbel-top-k instead of rank top-k")
    ap.add_argument("--buckets", type=int, default=8192)
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("pyetl_spark_dsir_select").getOrCreate()
    docs = spark.read.parquet(args.docs_dir)

    weights = dsir.dsir_log_weights(
        docs, args.id_col, args.text_col, F.expr(args.target),
        num_buckets=args.buckets, alpha=args.alpha,
    )
    pick = dsir.dsir_resample if args.resample else dsir.dsir_select
    kw = {"seed": args.seed} if args.resample else {}
    chosen = pick(weights, args.k, id_col=args.id_col, **kw)

    # k rows of (id, weight): broadcast-join back to the full input
    selected = docs.join(
        F.broadcast(chosen.select(args.id_col, "weight")), args.id_col
    )
    selected.write.mode("overwrite").parquet(args.out_dir)

    out = spark.read.parquet(args.out_dir)
    stats = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("weight").alias("wmin"),
        F.max("weight").alias("wmax"),
    ).first()
    print(
        f"selected={stats['n']} k={args.k} mode="
        f"{'resample' if args.resample else 'topk'} "
        f"weight_min={stats['wmin']:.4f} weight_max={stats['wmax']:.4f}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
