"""DSIR importance weighting vs a sequential pure-Python oracle."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from pyetl_spark.functions import dsir
from pyetl_spark.functions.text import MERSENNE31, SHINGLE_A

DOCS = [
    (0, "the cat sat on the mat", True),
    (1, "the dog sat on the log", True),
    (2, "quantum flux capacitor resonance cascade", False),
    (3, "the cat and the dog", True),
    (4, "flux cascade resonance quantum", False),
    (5, "cat dog cat dog cat", False),
    (6, "", False),
    (7, "   ", False),
    (8, "singleton", False),
]
B = 64


def _word_hash(w: str) -> int:
    return int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % MERSENNE31


def _grams(text: str) -> list[int]:
    ws = [w for w in text.lower().strip().split()]
    ws = [w for w in " ".join(ws).split(" ") if w]
    hs = [_word_hash(w) for w in ws]
    uni = hs
    bi = [(hs[i] * SHINGLE_A + hs[i + 1]) % MERSENNE31 for i in range(len(hs) - 1)]
    return [g % B for g in uni + bi]


def _oracle():
    """Sequential DSIR over DOCS: bucket stats, totals, per-doc folds."""
    n_raw: dict[int, int] = {}
    n_tgt: dict[int, int] = {}
    for _, text, is_t in DOCS:
        for b in _grams(text):
            n_raw[b] = n_raw.get(b, 0) + 1
            if is_t:
                n_tgt[b] = n_tgt.get(b, 0) + 1
    N_raw = sum(n_raw.values())
    N_tgt = sum(n_tgt.values())
    return n_raw, n_tgt, N_raw, N_tgt


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, is_tgt boolean")


def test_bucket_stats_match_oracle(spark, docs_df):
    n_raw, n_tgt, _, _ = _oracle()
    got = {
        r["b"]: (r["n_raw"], r["n_tgt"])
        for r in dsir.dsir_bucket_stats(docs_df, "text", F.col("is_tgt"), B).collect()
    }
    assert got == {b: (n_raw[b], n_tgt.get(b, 0)) for b in n_raw}


def test_exact_scores_match_oracle(spark, docs_df):
    n_raw, n_tgt, N_raw, N_tgt = _oracle()
    want = {}
    for doc_id, text, _ in DOCS:
        gs = _grams(text)
        want[doc_id] = (
            sum(n_tgt.get(b, 0) * N_raw - n_raw[b] * N_tgt for b in gs),
            len(gs),
        )
    got = {
        r["doc_id"]: (r["dsir_score"], r["n_grams"])
        for r in dsir.dsir_scores_exact(docs_df, "doc_id", "text", F.col("is_tgt"), B).collect()
    }
    assert got == want
    # empty / whitespace-only docs are present with zero score
    assert got[6] == (0, 0) and got[7] == (0, 0)


def test_log_weights_match_oracle(spark, docs_df):
    alpha = 0.5
    n_raw, n_tgt, N_raw, N_tgt = _oracle()
    lt, lr = math.log(N_tgt + alpha * B), math.log(N_raw + alpha * B)
    want = {
        doc_id: sum(
            math.log(n_tgt.get(b, 0) + alpha) - lt - math.log(n_raw[b] + alpha) + lr
            for b in _grams(text)
        )
        for doc_id, text, _ in DOCS
    }
    got = {
        r["doc_id"]: r["weight"]
        for r in dsir.dsir_log_weights(
            docs_df, "doc_id", "text", F.col("is_tgt"), B, alpha
        ).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-9, abs=1e-12)
    # target-like docs must outscore the off-distribution ones
    assert min(got[0], got[1], got[3]) > max(got[2], got[4])


def test_select_and_resample_deterministic(spark, docs_df):
    w = dsir.dsir_log_weights(docs_df, "doc_id", "text", F.col("is_tgt"), B)
    top = [r["doc_id"] for r in dsir.dsir_select(w, 3).collect()]
    assert len(top) == 3 and top == sorted(
        (r["doc_id"] for r in w.collect()),
        key=lambda d: (-{x["doc_id"]: x["weight"] for x in w.collect()}[d], d),
    )[:3]
    s1 = sorted(r["doc_id"] for r in dsir.dsir_resample(w, 4, seed=7).collect())
    s2 = sorted(r["doc_id"] for r in dsir.dsir_resample(w, 4, seed=7).collect())
    s3 = sorted(r["doc_id"] for r in dsir.dsir_resample(w, 4, seed=8).collect())
    assert s1 == s2 and len(s1) == 4
    assert s3 != s1 or True  # different seed may coincide; determinism is the contract


def test_arrow_gram_parity(spark, docs_df):
    """The Arrow fast path must be value-identical to the pure-Column path
    on BOTH scorers (same discipline as test_md5_shingle_arrow_parity)."""
    a = sorted(
        tuple(r)
        for r in dsir.dsir_scores_exact(
            docs_df, "doc_id", "text", F.col("is_tgt"), B
        ).collect()
    )
    c = sorted(
        tuple(r)
        for r in dsir.dsir_scores_exact(
            docs_df, "doc_id", "text", F.col("is_tgt"), B, use_arrow=False
        ).collect()
    )
    assert a == c  # integer scores: bit-exact across paths
    aw = {
        r["doc_id"]: r["weight"]
        for r in dsir.dsir_log_weights(
            docs_df, "doc_id", "text", F.col("is_tgt"), B
        ).collect()
    }
    cw = {
        r["doc_id"]: r["weight"]
        for r in dsir.dsir_log_weights(
            docs_df, "doc_id", "text", F.col("is_tgt"), B, use_arrow=False
        ).collect()
    }
    assert set(aw) == set(cw)
    for d in aw:  # float fold order may differ between paths
        assert aw[d] == pytest.approx(cw[d], rel=1e-12, abs=1e-12)


def test_plan_shape(spark, docs_df):
    """Pass 2's bucket join must be a BROADCAST join (the stats table is
    <= num_buckets rows) and nothing may go cartesian/nested-loop. The one
    allowed shuffle join is the doc-keyed zero-fill left join (it restores
    gram-less docs; both sides are doc-id keyed)."""
    plan = dsir.dsir_scores_exact(
        docs_df, "doc_id", "text", F.col("is_tgt"), B
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # exactly one non-broadcast join: the zero-fill on the doc key
    non_broadcast = plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin")
    assert non_broadcast <= 1
