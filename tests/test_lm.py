"""CCNet-style bigram-LM perplexity filter vs a sequential Python oracle."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from pyetl_spark.functions import lm
from pyetl_spark.functions.text import MERSENNE31, SHINGLE_A

DOCS = [
    (0, "the cat sat on the mat", True),
    (1, "the dog sat on the log", True),
    (2, "the cat sat on the mat again", False),
    (3, "quantum flux capacitor resonance cascade", False),
    (4, "the the the the the", True),
    (5, "dog log cat mat", False),
    (6, "", False),
    (7, "singleton", False),
    (8, "  padded   whitespace  text  ", True),
]


def _wh(w: str) -> int:
    return int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % MERSENNE31


def _hashes(text: str) -> list[int]:
    ws = [w for w in text.lower().split() if w]
    return [_wh(w) for w in ws]


def _pairs(text: str) -> list[tuple[int, int]]:
    hs = _hashes(text)
    return [
        (hs[i], (hs[i] * SHINGLE_A + hs[i + 1]) % MERSENNE31)
        for i in range(len(hs) - 1)
    ]


def _oracle():
    B: dict[int, int] = {}
    U: dict[int, int] = {}
    vocab: set[int] = set()
    for _, text, is_t in DOCS:
        if not is_t:
            continue
        vocab.update(_hashes(text))
        for ctx, big in _pairs(text):
            B[big] = B.get(big, 0) + 1
            U[ctx] = U.get(ctx, 0) + 1
    V = len(vocab)
    out = {}
    for doc_id, text, _ in DOCS:
        pairs = _pairs(text)
        if not pairs:
            out[doc_id] = (0, 0, None)
            continue
        lp, oov = 0.0, 0
        for ctx, big in pairs:
            bc = B.get(big, 0)
            if bc == 0:
                oov += 1
            lp += math.log(bc + 1) - math.log(U.get(ctx, 0) + V + 1)
        out[doc_id] = (len(pairs), oov, -lp / len(pairs))
    return V, out


@pytest.fixture(scope="module")
def fitted(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text", "is_target"])
    model = lm.lm_fit(df, "text", F.col("is_target"))
    scored = lm.lm_cross_entropy(df, "doc_id", "text", model, round_to=None)
    return df, model, scored


def test_vocab_and_counts(fitted):
    _, model, _ = fitted
    V, _ = _oracle()
    assert model.vocab == V
    # the target slice has 5+5+1+3 words minus the empty doc → check one count
    the = _wh("the")
    uc = {r["ctx"]: r["uc"] for r in model.contexts.collect()}
    # 'the' opens 2 bigrams in doc0, 2 in doc1, 4 in doc4 (last 'the' closes)
    assert uc[the] == 8


def test_cross_entropy_matches_oracle(fitted):
    _, _, scored = fitted
    _, exp = _oracle()
    got = {r["doc_id"]: r for r in scored.collect()}
    assert set(got) == set(exp)
    for doc_id, (n, oov, ce) in exp.items():
        r = got[doc_id]
        assert r["n_bigrams"] == n, doc_id
        assert r["oov_bigrams"] == oov, doc_id
        if ce is None:
            assert r["cross_entropy"] is None, doc_id
        else:
            assert r["cross_entropy"] == pytest.approx(ce, abs=1e-12), doc_id


def test_target_docs_score_lower(fitted):
    """In-distribution text must beat OOV gibberish under the model."""
    _, _, scored = fitted
    ce = {r["doc_id"]: r["cross_entropy"] for r in scored.collect()}
    assert ce[0] < ce[3] and ce[1] < ce[3]
    # near-duplicate of a training doc scores well too
    assert ce[2] < ce[3]


def test_buckets_and_filter(fitted):
    df, _, scored = fitted
    b = lm.lm_ppl_buckets(scored, head_frac=0.34, tail_frac=0.34)
    labels = {r["doc_id"]: r["ppl_bucket"] for r in b.collect()}
    assert set(labels.values()) <= {"head", "middle", "tail"}
    # NULL-scored docs (no bigrams) land in the dropped tail
    assert labels[6] == "tail" and labels[7] == "tail"
    kept = lm.lm_filter_head(df, scored, "doc_id", keep=("head",), head_frac=0.34,
                             tail_frac=0.34)
    kept_ids = {r["doc_id"] for r in kept.collect()}
    heads = {d for d, lab in labels.items() if lab == "head"}
    assert kept_ids == heads
    # the OOV doc is never in the head at these fractions
    assert 3 not in kept_ids


def test_rounding_contract(fitted):
    df, model, _ = fitted
    r4 = lm.lm_cross_entropy(df, "doc_id", "text", model, round_to=4)
    for r in r4.collect():
        if r["cross_entropy"] is not None:
            assert r["cross_entropy"] == round(r["cross_entropy"], 4)


def test_plan_no_cartesian(fitted):
    _, _, scored = fitted
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
