"""Incremental dedup registries (functions/incremental.py): batched ingest
must converge to the same answer as the one-shot batch operators, survive
re-delivered batches, and never re-accept a fingerprint."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyetl_spark.functions.dedup import band_keys, minhash_lsh_pairs
from pyetl_spark.functions.incremental import IncrementalDedup, IncrementalLsh


@pytest.fixture()
def corpus(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, base),                       # dup of 1, same batch
        (3, "something else entirely here with many different words"),
        (4, base.upper()),               # dup of 1 after normalization
        (5, "third unique document body mentioning foxes and dogs once"),
        (6, base),                       # dup of 1, later batch
        (7, "something else entirely here with many different words"),  # dup of 3
        (8, "a genuinely new late arrival document nothing matches"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_exact_matches_batch(spark, corpus, tmp_path):
    inc = IncrementalDedup(spark, str(tmp_path))
    accepted = []
    for b, (lo, hi) in enumerate([(1, 4), (4, 7), (7, 9)]):
        batch = corpus.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        accepted += [r["doc_id"] for r in inc.ingest(batch, batch_id=f"b{b}").collect()]
    # batch oracle: min doc_id per fingerprint group
    want = sorted(
        r["keep"]
        for r in corpus.groupBy(F.md5(F.lower(F.col("text"))).alias("x"))
        .agg(F.min("doc_id").alias("keep"))
        .collect()
    )
    assert sorted(accepted) == [1, 3, 5, 8] == want
    reg = {r["doc_id"] for r in inc.accepted().collect()}
    assert reg == {1, 3, 5, 8}


def test_incremental_exact_redelivery_is_idempotent(spark, corpus, tmp_path):
    inc = IncrementalDedup(spark, str(tmp_path))
    b0 = corpus.filter(F.col("doc_id") <= 4)
    first = {r["doc_id"] for r in inc.ingest(b0, batch_id="b0").collect()}
    assert first == {1, 3}
    v = inc.table.current_version()
    # re-delivered batch: ledger skips the merge, registry state unchanged,
    # and the IDENTICAL accepted set comes back (computed against the
    # post-merge registry) — a per-epoch overwrite sink converges on retry
    again = {r["doc_id"] for r in inc.ingest(b0, batch_id="b0").collect()}
    assert again == {1, 3}
    assert inc.table.current_version() == v
    assert {r["doc_id"] for r in inc.accepted().collect()} == {1, 3}


def test_incremental_reopen_persists(spark, corpus, tmp_path):
    root = str(tmp_path)
    IncrementalDedup(spark, root).ingest(
        corpus.filter(F.col("doc_id") <= 4), batch_id="b0"
    )
    # a NEW handle over the same root sees the registry (restart survival)
    inc2 = IncrementalDedup(spark, root)
    out = {r["doc_id"] for r in inc2.ingest(corpus.filter(F.col("doc_id") > 4), batch_id="b1").collect()}
    assert out == {5, 8}


def test_incremental_lsh_candidates_cover_batch_pairs(spark, corpus, tmp_path):
    """union of per-batch incremental candidates ⊇ the banding candidates of
    the one-shot batch LSH (same signature math ⇒ same buckets)."""
    inc = IncrementalLsh(spark, str(tmp_path), n_hashes=32, bands=16, k_shingle=2)
    got = set()
    for b, (lo, hi) in enumerate([(1, 5), (5, 9)]):
        batch = corpus.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        for r in inc.ingest(batch, batch_id=f"b{b}").collect():
            got.add((max(r["new_id"], r["old_id"]), min(r["new_id"], r["old_id"])))
    full = minhash_lsh_pairs(
        corpus, n_hashes=32, bands=16, k_shingle=2, threshold=0.5
    )
    want = {(max(r["a"], r["b"]), min(r["a"], r["b"])) for r in full.collect()}
    assert want <= got
    # the exact dups must collide against HISTORY, not just within-batch:
    # 6 (batch 1) vs 1/2/4 (batch 0)
    assert (6, 1) in got and (7, 3) in got


def test_band_keys_consistency(spark, corpus):
    """band_keys is deterministic and identical across calls — the property
    the persistent registry depends on."""
    a = {(r["doc_id"], r["band_idx"], r["band_hash"]) for r in band_keys(corpus).collect()}
    b = {(r["doc_id"], r["band_idx"], r["band_hash"]) for r in band_keys(corpus).collect()}
    assert a == b
    # identical docs share ALL bands
    by_doc = {}
    for d, i, h in a:
        by_doc.setdefault(d, set()).add((i, h))
    assert by_doc[1] == by_doc[2]
