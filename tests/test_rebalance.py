"""Domain-mix rebalancing (functions/packing.py rebalance_mix)."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyetl_spark.functions.packing import md5_int60, rebalance_mix  # noqa: E402


def _corpus(spark, sizes: dict[str, int]):
    rows, i = [], 0
    for dom, n in sizes.items():
        for _ in range(n):
            rows.append((i, dom))
            i += 1
    return spark.createDataFrame(rows, ["doc_id", "dom"])


def test_rebalance_exact_quotas(spark):
    df = _corpus(spark, {"web": 200, "code": 40, "wiki": 25})
    out = rebalance_mix(df, "dom", {"web": 0.5, "code": 0.3, "wiki": 0.2}, "doc_id")
    got = {r["dom"]: r["n"] for r in out.groupBy("dom").agg(F.count("*").alias("n")).collect()}
    # N = min(200/.5, 40/.3, 25/.2) = min(400, 133, 125) = 125
    assert got == {"web": 62, "code": 37, "wiki": 25}


def test_rebalance_matches_rank_by_hash_reference(spark):
    # the scalable two-phase selection must equal the naive
    # "n smallest (hash, id) per stratum" definition the oracle states
    df = _corpus(spark, {"a": 120, "b": 60})
    out = rebalance_mix(df, "dom", {"a": 0.5, "b": 0.5}, "doc_id", seed=3, buckets=8)
    h = md5_int60(F.concat_ws(":", F.lit("3"), F.col("doc_id").cast("string")))
    from pyspark.sql import Window

    ref = (
        df.withColumn("__h", h)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("dom").orderBy("__h", "doc_id")
            ),
        )
        .filter(F.col("rk") <= 60)  # N = min(240, 120) = 120 → 60 each
        .select("doc_id", "dom")
    )
    assert sorted(map(tuple, out.select("doc_id", "dom").collect())) == sorted(
        map(tuple, ref.collect())
    )


def test_rebalance_drops_untargeted_and_weights_normalize(spark):
    df = _corpus(spark, {"a": 50, "b": 50, "junk": 99})
    # integer weights 3:1 normalize to 0.75/0.25; junk is absent from target
    out = rebalance_mix(df, "dom", {"a": 3, "b": 1}, "doc_id")
    got = {r["dom"]: r["n"] for r in out.groupBy("dom").agg(F.count("*").alias("n")).collect()}
    # N = min(floor(50/.75)=66, floor(50/.25)=200) = 66 → a 49, b 16
    assert got == {"a": 49, "b": 16}


def test_rebalance_missing_stratum_raises(spark):
    df = _corpus(spark, {"a": 10})
    with pytest.raises(ValueError, match="absent"):
        rebalance_mix(df, "dom", {"a": 0.5, "ghost": 0.5}, "doc_id")


def test_rebalance_deterministic_across_parallelism(spark):
    df = _corpus(spark, {"a": 100, "b": 30})
    one = rebalance_mix(df.coalesce(1), "dom", {"a": 0.6, "b": 0.4}, "doc_id", seed=7)
    many = rebalance_mix(df.repartition(16), "dom", {"a": 0.6, "b": 0.4}, "doc_id", seed=7)
    assert sorted(map(tuple, one.select("doc_id").collect())) == sorted(
        map(tuple, many.select("doc_id").collect())
    )
