"""Deployable corpus-curation job — the batch training-data pipeline,
end-to-end: token-count + language gate → per-language stratified sampling
→ exact dedup (first-wins) → token-budget shard packing → shard-partitioned
parquet fan-out (the `sortir` sink pattern with shard_id as the partition
column, so a data loader reads one directory per shard).

The same composition as the `pipeline_curate` contract query (certified
value-exact against a chained-CTE SQL oracle at sf0.01); this job is its
spark-submit deployment shape.

Usage:
    cd <repo> && zip -qr /tmp/pyetl_spark.zip pyetl_spark
    spark-submit --master <cluster|local[N]> --py-files /tmp/pyetl_spark.zip \
        jobs/curate_corpus.py <docs_parquet_dir> <out_dir> \
        [--budget 1048576] [--seed 0] [--langs en,fr,de] \
        [--fractions en=1.0,fr=1.0] [--min-tokens 20] [--max-tokens 1000000]

Scale notes: the gate and sampling are map-side Column work on the scan
(pushdown-eligible); dedup is one hash-partitioned window over the md5
fingerprint; packing's global prefix sum is the range-shuffle +
partition-local-window + O(P)-offsets recipe (functions/packing.py); the
fan-out write shuffles once on shard_id.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from pyetl_spark.functions import text as ftext
from pyetl_spark.functions.packing import pack_shards, sample_stratified


def parse_fractions(spec: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for part in spec.split(","):
        if not part:
            continue
        k, _, v = part.partition("=")
        out[k.strip()] = float(v)
    return out


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("docs_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--budget", type=int, default=1 << 20)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--langs", default="")
    ap.add_argument("--fractions", default="")
    ap.add_argument("--default-fraction", type=float, default=1.0)
    ap.add_argument("--min-tokens", type=int, default=20)
    ap.add_argument("--max-tokens", type=int, default=1_000_000)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--lang-col", default="lang")
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("pyetl_spark_curate_corpus").getOrCreate()
    docs = spark.read.parquet(args.docs_dir)

    toks = ftext.bpe_ish_token_count(F.col(args.text_col))
    gated = docs.withColumn("toks", toks).filter(
        F.col("toks").between(args.min_tokens, args.max_tokens)
    )
    if args.langs:
        gated = gated.filter(F.col(args.lang_col).isin(args.langs.split(",")))

    fractions = parse_fractions(args.fractions)
    if fractions or args.default_fraction < 1.0:
        gated = sample_stratified(
            gated, args.lang_col, fractions, args.id_col,
            seed=args.seed, default_fraction=args.default_fraction,
        )

    w = Window.partitionBy(ftext.fingerprint_md5(F.col(args.text_col)))
    kept = (
        gated.withColumn("__keep", F.min(args.id_col).over(w))
        .filter(F.col(args.id_col) == F.col("__keep"))
        .drop("__keep")
    )

    packed = pack_shards(
        kept, "toks", args.id_col, budget=args.budget, seed=args.seed,
        hash_family="xx",  # scale family; md5 is the oracle configuration
    )
    (
        packed.repartition("shard_id")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(args.out_dir)
    )

    out = spark.read.parquet(args.out_dir)
    stats = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("shard_id").alias("s"),
        F.sum("toks").alias("t"),
    ).first()  # one scan for the whole summary
    print(f"docs={stats['n']} shards={stats['s']} tokens={stats['t']} budget={args.budget}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
