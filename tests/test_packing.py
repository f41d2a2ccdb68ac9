"""Training-shard packing (functions/packing.py): distributed prefix sum,
token-budget sharding, deterministic shuffle, stratified sampling."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from pyetl_spark.functions.packing import (
    _HASH_SCALE,
    global_cumsum,
    pack_shards,
    sample_stratified,
    shuffle_key,
)


def _docs(spark, n=500, parts=7):
    """synthetic docs with deterministic pseudo-random token counts."""
    return (
        spark.range(n, numPartitions=parts)
        .select(
            F.col("id").alias("doc_id"),
            F.pmod(F.xxhash64("id", F.lit(9)), F.lit(97)).cast("long").alias("toks"),
            F.concat(F.lit("L"), F.pmod(F.col("id"), F.lit(4)).cast("string")).alias("lang"),
        )
    )


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# ---------------------------------------------------------------- cumsum


def test_global_cumsum_exclusive_exact(spark):
    df = _docs(spark)
    out = global_cumsum(df, "toks", "doc_id", out="cum").orderBy("doc_id").collect()
    acc = 0
    for r in out:  # doc_id IS the order key here, so replay sequentially
        assert r["cum"] == acc, f"doc {r['doc_id']}: {r['cum']} != {acc}"
        acc += r["toks"]
    assert out[0]["cum"] == 0  # exclusive: first row gets 0


def test_global_cumsum_empty(spark):
    df = _docs(spark).filter(F.lit(False))
    out = global_cumsum(df, "toks", "doc_id")
    assert out.count() == 0
    assert "cum" in out.columns


def test_global_cumsum_parallelism_invariant(spark):
    a = global_cumsum(_docs(spark, parts=1), "toks", "doc_id").orderBy("doc_id").collect()
    b = global_cumsum(_docs(spark, parts=16), "toks", "doc_id").orderBy("doc_id").collect()
    assert [r["cum"] for r in a] == [r["cum"] for r in b]


# ---------------------------------------------------------------- packing


def _pack_replay(rows, budget, seed):
    """python mirror of pack_shards: order by md5 shuffle key, offset-pack."""
    ordered = sorted(rows, key=lambda r: _md5(f"{seed}:{r['doc_id']}"))
    acc, exp = 0, {}
    for r in ordered:
        exp[r["doc_id"]] = (acc // budget, acc % budget)
        acc += r["toks"]
    return exp


@pytest.mark.parametrize("budget", [64, 1000])
def test_pack_shards_matches_replay(spark, budget):
    df = _docs(spark, n=300)
    exp = _pack_replay([r.asDict() for r in df.collect()], budget, seed=1)
    got = pack_shards(df, "toks", "doc_id", budget=budget, seed=1).collect()
    assert len(got) == 300
    for r in got:
        assert (r["shard_id"], r["token_offset"]) == exp[r["doc_id"]]


def test_pack_shards_budget_validation(spark):
    with pytest.raises(ValueError, match="budget"):
        pack_shards(_docs(spark), "toks", "doc_id", budget=0)


def test_pack_shards_seed_changes_order(spark):
    df = _docs(spark, n=200)
    a = {r["doc_id"]: r["shard_id"] for r in pack_shards(df, "toks", "doc_id", 64, seed=1).collect()}
    b = {r["doc_id"]: r["shard_id"] for r in pack_shards(df, "toks", "doc_id", 64, seed=2).collect()}
    assert a != b  # a different epoch seed reshuffles the packing


def test_pack_shards_xx_family_parallelism_invariant(spark):
    a = pack_shards(_docs(spark, parts=2), "toks", "doc_id", 64, hash_family="xx").collect()
    b = pack_shards(_docs(spark, parts=13), "toks", "doc_id", 64, hash_family="xx").collect()
    assert {(r["doc_id"], r["shard_id"], r["token_offset"]) for r in a} == {
        (r["doc_id"], r["shard_id"], r["token_offset"]) for r in b
    }


def test_shard_span_invariant(spark):
    """every shard except the last starts exactly at shard_id*budget: the
    first doc of shard s has token_offset < its own token count's reach, and
    shard ids are contiguous from 0."""
    budget = 128
    got = pack_shards(_docs(spark, n=400), "toks", "doc_id", budget, seed=3).collect()
    shards = sorted({r["shard_id"] for r in got})
    assert shards == list(range(len(shards)))
    for r in got:
        assert 0 <= r["token_offset"] < budget


# ---------------------------------------------------------------- sampling


def test_sample_stratified_exact_membership(spark):
    df = _docs(spark, n=400)
    fr = {"L0": 0.5, "L1": 0.0, "L2": 1.0}
    got = {r["doc_id"] for r in sample_stratified(df, "lang", fr, "doc_id", seed=7, default_fraction=0.25).collect()}
    for r in df.collect():
        u = int(_md5(f"7:{r['doc_id']}")[:15], 16)
        frac = fr.get(r["lang"], 0.25)
        assert (r["doc_id"] in got) == (u < int(frac * _HASH_SCALE)), r
    # L1 stratum fully dropped; L2 fully kept
    langs = {r["doc_id"]: r["lang"] for r in df.collect()}
    assert not any(langs[d] == "L1" for d in got)
    assert {d for d, l in langs.items() if l == "L2"} <= got


def test_sample_stratified_validation(spark):
    df = _docs(spark)
    with pytest.raises(ValueError, match="fraction"):
        sample_stratified(df, "lang", {"L0": 1.5}, "doc_id")
    with pytest.raises(ValueError, match="default_fraction"):
        sample_stratified(df, "lang", {"L0": 0.5}, "doc_id", default_fraction=-0.1)


def test_sample_stratified_no_shuffle(spark):
    """map-side only: the physical plan must contain no Exchange."""
    df = _docs(spark)
    plan = sample_stratified(df, "lang", {"L0": 0.5}, "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_shuffle_key_deterministic(spark):
    df = spark.range(5).select(shuffle_key(F.col("id"), seed=3).alias("k"))
    assert [r["k"] for r in df.collect()] == [_md5(f"3:{i}") for i in range(5)]


def test_pack_shards_rejects_duplicate_and_null_ids(spark):
    from pyspark.sql import functions as SF

    dup = spark.createDataFrame([(1, 5), (1, 7), (2, 3)], "doc_id long, toks long")
    with pytest.raises(ValueError, match="not unique"):
        pack_shards(dup, "toks", "doc_id", budget=10)
    nul = spark.createDataFrame([(None, 5), (2, 3)], "doc_id long, toks long")
    with pytest.raises(ValueError, match="null"):
        pack_shards(nul, "toks", "doc_id", budget=10)
    del SF


def test_pack_shards_rejects_null_and_negative_tokens(spark):
    """a null token count would silently null the running sum (and so the
    row's shard assignment); a negative one corrupts every later offset —
    both must fail the packing contract loudly (ADVICE r03)."""
    nul = spark.createDataFrame([(1, 5), (2, None), (3, 3)], "doc_id long, toks long")
    with pytest.raises(ValueError, match="token"):
        pack_shards(nul, "toks", "doc_id", budget=10)
    neg = spark.createDataFrame([(1, 5), (2, -4), (3, 3)], "doc_id long, toks long")
    with pytest.raises(ValueError, match="token"):
        pack_shards(neg, "toks", "doc_id", budget=10)
    # zero-token documents are legal (empty after cleaning): no raise
    zero = spark.createDataFrame([(1, 0), (2, 4)], "doc_id long, toks long")
    assert pack_shards(zero, "toks", "doc_id", budget=10).count() == 2
