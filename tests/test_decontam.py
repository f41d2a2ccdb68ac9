"""Benchmark decontamination (functions/decontam.py)."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyetl_spark.functions import decontam as dc  # noqa: E402


def test_normalize_text(spark):
    df = spark.createDataFrame([("Hello,  WORLD!! x9--y",)], ["t"])
    got = df.select(dc.normalize_text(F.col("t")).alias("n")).first()["n"]
    assert got == "hello world x9 y"


def test_decontaminate_flags_and_counts(spark):
    eval_df = spark.createDataFrame([("the quick brown fox jumps",)], ["text"])
    docs = spark.createDataFrame(
        [
            # carries the eval 3-gram "quick brown fox" twice
            (0, "a quick brown fox saw a quick brown fox today ok"),
            # exact eval text: 3 grams, all hits
            (1, "The QUICK brown fox jumps"),
            # clean
            (2, "totally unrelated words in this one here"),
            # too short for any 3-gram
            (3, "tiny doc"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in dc.decontaminate(docs, eval_df, n=3).collect()}
    assert (out[0]["n_hits"], out[0]["contaminated"]) == (2, 1)
    assert (out[1]["n_grams"], out[1]["n_hits"], out[1]["contaminated"]) == (3, 3, 1)
    assert (out[2]["n_hits"], out[2]["contaminated"]) == (0, 0)
    assert (out[3]["n_grams"], out[3]["n_hits"], out[3]["contaminated"]) == (0, 0, 0)
    assert sorted(out) == [0, 1, 2, 3]  # every doc routed, none dropped


def test_decontaminate_no_broadcast_same_result(spark):
    eval_df = spark.createDataFrame([("alpha beta gamma",)], ["text"])
    docs = spark.createDataFrame(
        [(0, "x alpha beta gamma y"), (1, "nope")], ["doc_id", "text"]
    )
    a = dc.decontaminate(docs, eval_df, n=3, broadcast=True).collect()
    b = dc.decontaminate(docs, eval_df, n=3, broadcast=False).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_decontaminate_plan_broadcasts_eval_side(spark):
    eval_df = spark.createDataFrame([("alpha beta gamma",)], ["text"])
    docs = spark.createDataFrame([(0, "x alpha beta gamma y")], ["doc_id", "text"])
    plan = dc.decontaminate(docs, eval_df, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
