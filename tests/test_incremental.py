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
    # the SAME documents arriving under a NEW batch id are source
    # duplication, not a replay: nothing is re-accepted (their registry
    # rows belong to b0) — the accepted corpus never holds a doc twice
    fresh = {r["doc_id"] for r in inc.ingest(b0, batch_id="b1").collect()}
    assert fresh == set()
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
            got.add((min(r["a"], r["b"]), max(r["a"], r["b"])))
    full = minhash_lsh_pairs(
        corpus, n_hashes=32, bands=16, k_shingle=2, threshold=0.5
    )
    want = {(min(r["a"], r["b"]), max(r["a"], r["b"])) for r in full.collect()}
    assert want <= got
    # the exact dups must collide against HISTORY, not just within-batch:
    # 6 (batch 1) vs 1/2/4 (batch 0)
    assert (1, 6) in got and (3, 7) in got


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


def test_incremental_lsh_replay_idempotent(spark, corpus, tmp_path):
    """a re-delivered epoch returns the identical canonical pair set — no
    (d, d) self-pairs from the batch's own keys now in the store, no
    reversed duplicates."""
    inc = IncrementalLsh(spark, str(tmp_path), n_hashes=32, bands=16, k_shingle=2)
    b0 = corpus.filter(F.col("doc_id") < 5)
    b1 = corpus.filter(F.col("doc_id") >= 5)
    inc.ingest(b0, batch_id="b0")
    first = {(r["a"], r["b"]) for r in inc.ingest(b1, batch_id="b1").collect()}
    again = {(r["a"], r["b"]) for r in inc.ingest(b1, batch_id="b1").collect()}
    assert again == first
    assert all(a < b for a, b in again)  # canonical sorted, never self-pairs


def test_lsh_store_is_band_bucketed(spark, corpus, tmp_path):
    """the registry buckets by band key, so a batch's history probe reads
    only its own buckets (bucket_ids ⊆ nbuckets) and the pruned read equals
    the full read filtered to those band keys."""
    from pyetl_spark.functions.dedup import band_keys as bk

    inc = IncrementalLsh(spark, str(tmp_path), n_hashes=32, bands=16, k_shingle=2, nbuckets=8)
    inc.ingest(corpus, batch_id="b0")
    m = inc.table.manifest()
    assert m["bucket_cols"] == ["band_idx", "band_hash"]
    keys = bk(corpus.filter(F.col("doc_id") == 1), k_shingle=2, n_hashes=32, bands=16)
    ids = inc.table.bucket_ids(keys)
    assert ids and set(ids) <= set(range(8))
    pruned = inc.table.read(buckets=ids)
    want = {(r["band_idx"], r["band_hash"]) for r in keys.collect()}
    got = {(r["band_idx"], r["band_hash"]) for r in pruned.collect()}
    assert want <= got  # every probe key's bucket is in the pruned slice


def test_incremental_ann_replay_and_history(spark, tmp_path):
    """ANN registry: identical vectors collide across batches (history
    probe), replay returns the identical canonical set, no self-pairs."""
    from pyetl_spark.functions.incremental import IncrementalAnn

    v1 = [1.0] + [0.0] * 7
    v2 = [0.9, 0.1] + [0.0] * 6      # same orthant as v1 under most planes
    v3 = [-1.0] + [0.0] * 7          # antipodal: never shares a sign bucket with v1
    rows = [(1, v1), (2, v2), (3, v3), (4, v1)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    inc = IncrementalAnn(spark, str(tmp_path), dim=8, bands=2, bits=4, nbuckets=4)
    b0 = df.filter(F.col("vec_id") <= 2)
    b1 = df.filter(F.col("vec_id") >= 3)
    p0 = {(r["a"], r["b"]) for r in inc.ingest(b0, batch_id="b0").collect()}
    p1 = {(r["a"], r["b"]) for r in inc.ingest(b1, batch_id="b1").collect()}
    assert (1, 4) in p1              # identical vector found in HISTORY
    assert not any(a == b for a, b in p0 | p1)
    assert all(a < b for a, b in p0 | p1)
    again = {(r["a"], r["b"]) for r in inc.ingest(b1, batch_id="b1").collect()}
    assert again == p1               # replay-idempotent
    # antipodal vector never pairs with v1/v4
    assert not any({a, b} >= {3, 1} or {a, b} >= {3, 4} for a, b in p0 | p1)


def test_registry_maintain_preserves_state(spark, corpus, tmp_path):
    """maintain() compacts + expires without changing the visible registry,
    and later ingests still work against the maintained store."""
    inc = IncrementalDedup(spark, str(tmp_path), nbuckets=4)
    inc.ingest(corpus.filter(F.col("doc_id") <= 4), batch_id="b0")
    inc.ingest(corpus.filter((F.col("doc_id") > 4) & (F.col("doc_id") <= 6)), batch_id="b1")
    before = {(r["fp"], r["doc_id"]) for r in inc.accepted().collect()}
    stats = inc.maintain(keep_last=1)
    assert stats["expired"]["removed_manifests"] >= 1
    assert {(r["fp"], r["doc_id"]) for r in inc.accepted().collect()} == before
    out = {r["doc_id"] for r in inc.ingest(corpus.filter(F.col("doc_id") > 6), batch_id="b2").collect()}
    assert out == {8}


def test_pack_validation_and_legacy_stores(spark, corpus, tmp_path):
    """upgrade-path hazards: (a) a registry written before src_batch
    tracking must still return the epoch's accepted set on a
    ledger-confirmed replay (a per-epoch overwrite sink must not wipe
    pre-upgrade output); (b) a store bucketed by its full row key (no
    bucket_cols manifest entry) must fall back to a full-scan probe, not a
    mis-pruned one."""
    from pyetl_spark.cdc.tableio import SnapshotTable
    from pyetl_spark.functions.dedup import band_keys
    from pyetl_spark.functions.text import fingerprint_md5

    # --- (a) legacy exact registry: rows without src_batch, ledger has b0
    root_a = str(tmp_path / "exact")
    legacy = SnapshotTable.create(spark, root_a + "/fingerprints", keys=["fp"], nbuckets=4)
    b0 = corpus.filter(F.col("doc_id") <= 4)
    old_rows = (
        b0.select(F.col("doc_id"), fingerprint_md5(F.col("text")).alias("fp"))
        .groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
        .select("fp", "doc_id", F.lit("upsert").alias("op"), F.col("doc_id").alias("seq"))
    )
    legacy.merge(old_rows, batch_id="b0")
    inc = IncrementalDedup(spark, root_a, nbuckets=4)
    replay = {r["doc_id"] for r in inc.ingest(b0, batch_id="b0").collect()}
    assert replay == {1, 3}  # pre-upgrade epoch replays non-empty

    # --- (b) legacy LSH store bucketed by the FULL key (doc_id included)
    root_b = str(tmp_path / "lsh")
    store = SnapshotTable.create(
        spark, root_b + "/bands", keys=["band_idx", "band_hash", "doc_id"], nbuckets=8
    )
    keys0 = band_keys(b0, k_shingle=2, n_hashes=32, bands=16)
    store.merge(
        keys0.select("band_idx", "band_hash", "doc_id",
                     F.lit("upsert").alias("op"), F.col("doc_id").alias("seq")),
        batch_id="b0",
    )
    inc2 = IncrementalLsh(spark, root_b, n_hashes=32, bands=16, k_shingle=2)
    b1 = corpus.filter(F.col("doc_id") >= 5)
    pairs = {(r["a"], r["b"]) for r in inc2.ingest(b1, batch_id="b1").collect()}
    assert (1, 6) in pairs  # history collision found despite legacy bucketing


def test_within_batch_bucket_cap_lsh(spark, tmp_path, caplog):
    """one boilerplate-heavy delivery (500 identical docs → one band bucket
    per band) must NOT quadratically explode its own self-join: oversize
    within-batch buckets are dropped with a logged warning, exactly like the
    history side's cap (VERDICT r03 #1). Distinct docs in the same batch are
    unaffected."""
    import logging

    n = 500
    rows = [(i, "exact same boilerplate header repeated in every file") for i in range(n)]
    rows += [(n, "one genuinely distinct document body here"),
             (n + 1, "one genuinely distinct document body here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    inc = IncrementalLsh(spark, str(tmp_path), n_hashes=32, bands=4, k_shingle=2)
    with caplog.at_level(logging.WARNING, logger="pyetl_spark.functions.incremental"):
        pairs = inc.ingest(df, batch_id="b0", max_bucket=50).collect()
    # without the cap the identical docs alone emit C(500,2)*4 ≈ 499k pairs
    got = {(r["a"], r["b"]) for r in pairs}
    assert len(got) <= 50 * 50
    assert (n, n + 1) in got          # sane buckets still pair
    assert any("within-batch bucket" in r.getMessage() for r in caplog.records)
    # replay returns the identical (still-capped) set: the batch's own keys
    # are now store buckets > max_bucket, dropped by the history cap
    again = {(r["a"], r["b"]) for r in inc.ingest(df, batch_id="b0", max_bucket=50).collect()}
    assert again == got


def test_within_batch_bucket_cap_ann(spark, tmp_path, caplog):
    """same guarantee for the embedding registry: a batch of identical
    vectors (one degenerate direction cluster) yields a bounded pair count
    and a logged drop, not an O(n^2) self-join."""
    import logging

    from pyetl_spark.functions.incremental import IncrementalAnn

    v = [1.0, 0.5] + [0.0] * 6
    rows = [(i, v) for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    inc = IncrementalAnn(spark, str(tmp_path), dim=8, bands=2, bits=4, nbuckets=4)
    with caplog.at_level(logging.WARNING, logger="pyetl_spark.functions.incremental"):
        pairs = inc.ingest(df, batch_id="b0", max_bucket=100).collect()
    assert len(pairs) == 0            # the only bucket is oversize → dropped
    assert any("within-batch bucket" in r.getMessage() for r in caplog.records)


def test_registry_config_mismatch_raises(spark, tmp_path, caplog):
    """banding parameters are persisted at create time (ADVICE r03): a
    reopen with different values would compute band keys the stored history
    never used — every probe silently empty — so it must raise instead."""
    import logging

    import pytest as _pytest

    from pyetl_spark.functions.incremental import IncrementalAnn

    from pyetl_spark.cdc.tableio import SnapshotTable

    root = str(tmp_path / "lsh")
    IncrementalLsh(spark, root, n_hashes=32, bands=16, k_shingle=2)
    assert SnapshotTable(spark, root + "/bands").props()["bands"] == 16
    with _pytest.raises(ValueError, match="created with"):
        IncrementalLsh(spark, root, n_hashes=32, bands=8, k_shingle=2)
    with _pytest.raises(ValueError, match="hash_family"):
        IncrementalLsh(spark, root, n_hashes=32, bands=16, k_shingle=2, hash_family="md5")
    # matching parameters reopen fine
    IncrementalLsh(spark, root, n_hashes=32, bands=16, k_shingle=2)

    root2 = str(tmp_path / "ann")
    IncrementalAnn(spark, root2, dim=8, bands=2, bits=4)
    with _pytest.raises(ValueError, match="created with"):
        IncrementalAnn(spark, root2, dim=16, bands=2, bits=4)
    IncrementalAnn(spark, root2, dim=8, bands=2, bits=4)

    # a legacy store without persisted props warns and is trusted
    root3 = str(tmp_path / "legacy")
    SnapshotTable.create(
        spark, root3 + "/bands", keys=["band_idx", "band_hash", "doc_id"],
        bucket_cols=["band_idx", "band_hash"], nbuckets=4,
    )
    with caplog.at_level(logging.WARNING, logger="pyetl_spark.functions.incremental"):
        IncrementalLsh(spark, root3, n_hashes=32, bands=16, k_shingle=2)
    assert any("predates banding-config persistence" in r.getMessage() for r in caplog.records)
