"""Quality/safety signals (functions/quality.py), C4 chunk dedup
(functions/dedup.py), and SemDeDup (functions/similarity.py)."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from conftest import rows  # noqa: E402
from pyetl_spark.functions import quality as fq  # noqa: E402
from pyetl_spark.functions.dedup import chunk_words, dedup_duplicate_chunks  # noqa: E402
from pyetl_spark.functions.similarity import (  # noqa: E402
    semdedup_keep,
    semdedup_pairs,
)


# ------------------------------------------------------------------ PII


def test_pii_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (0, "write to a.b+c@ex-1.org or x@y.io now"),
            (1, "host 192.168.0.1 and 10.0.0.255 up"),
            (2, "call 202-555-0134 twice 303-555-9999"),
            (3, "clean text with no pii at all"),
            (4, "mixed u@v.com 1.2.3.4 555-123-4567"),
        ],
        ["id", "t"],
    )
    out = df.select(
        "id",
        fq.pii_count(F.col("t"), "email").alias("e"),
        fq.pii_count(F.col("t"), "ipv4").alias("i"),
        fq.pii_count(F.col("t"), "phone").alias("p"),
        fq.pii_redact(F.col("t")).alias("r"),
    )
    got = {r["id"]: r for r in out.collect()}
    assert (got[0]["e"], got[0]["i"], got[0]["p"]) == (2, 0, 0)
    assert (got[1]["e"], got[1]["i"], got[1]["p"]) == (0, 2, 0)
    assert (got[2]["e"], got[2]["i"], got[2]["p"]) == (0, 0, 2)
    assert (got[3]["e"], got[3]["i"], got[3]["p"]) == (0, 0, 0)
    assert got[3]["r"] == "clean text with no pii at all"
    assert got[0]["r"] == "write to <EMAIL> or <EMAIL> now"
    assert got[1]["r"] == "host <IP> and <IP> up"
    assert got[2]["r"] == "call <PHONE> twice <PHONE>"
    assert got[4]["r"] == "mixed <EMAIL> <IP> <PHONE>"


def test_pii_email_digits_not_double_redacted(spark):
    # the email pass must consume digit runs inside addresses before the
    # ip/phone passes see them (PII_PATTERNS iteration order)
    df = spark.createDataFrame([("ping 10.1.2.3-555-1234@ex.com done",)], ["t"])
    r = df.select(fq.pii_redact(F.col("t")).alias("r")).first()["r"]
    assert r == "ping <EMAIL> done"


# ----------------------------------------------------------- repetition


def test_word_repetition_and_ngrams(spark):
    df = spark.createDataFrame(
        [(0, "a b a b a"), (1, "x"), (2, "p q r s")], ["doc_id", "text"]
    )
    scal = df.select(
        "doc_id", fq.word_repetition_frac(F.col("text")).alias("f")
    )
    got = {r["doc_id"]: r["f"] for r in scal.collect()}
    assert got[0] == 0.6  # 5 words, 2 distinct
    assert got[1] == 0.0
    assert got[2] == 0.0

    prof = fq.gram_repetition(df, "doc_id", "text", n=2)
    p = {r["doc_id"]: r for r in prof.collect()}
    # "a b a b a": grams = [a b, b a, a b, b a] → top cnt 2 of 4
    assert (p[0]["n_grams"], p[0]["n_distinct_grams"], p[0]["top_gram_cnt"]) == (4, 2, 2)
    assert p[0]["top_gram_frac"] == 0.5
    # single word → no bigrams, zeros not nulls
    assert (p[1]["n_grams"], p[1]["top_gram_cnt"], p[1]["top_gram_frac"]) == (0, 0, 0.0)
    assert (p[2]["n_grams"], p[2]["n_distinct_grams"], p[2]["top_gram_cnt"]) == (3, 3, 1)


def test_word_ngrams_guard_short_text(spark):
    df = spark.createDataFrame([("only",), ("two words",)], ["t"])
    out = df.select(fq.word_ngrams(F.col("t"), 3).alias("g")).collect()
    assert [len(r["g"]) for r in out] == [0, 0]


def test_gopher_gate_flags(spark):
    long_ok = " ".join(f"w{i}" for i in range(30))          # 30 distinct words
    too_short = "just five words right here"                 # < min_words
    repeaty = " ".join(["dup"] * 25)                         # rep frac 0.96
    gramy = " ".join(["a b"] * 15)                           # one bigram dominates
    df = spark.createDataFrame(
        [(0, long_ok), (1, too_short), (2, repeaty), (3, gramy)],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in fq.gopher_gate(df, min_words=20, max_words=100).collect()
    }
    assert out[0]["kept"] is True
    assert out[1]["kept"] is False and out[1]["n_words"] == 5
    assert out[2]["kept"] is False and out[2]["word_rep_frac"] == 0.96
    assert out[3]["kept"] is False and out[3]["top_gram_frac"] > 0.05
    # signals are returned, not pre-filtered: all four rows present
    assert sorted(out) == [0, 1, 2, 3]


def test_gopher_gate_routes_not_deletes(spark):
    # the kept flag partitions the input exactly (quarantine-sink contract)
    df = spark.createDataFrame(
        [(i, " ".join(f"t{i}x{j}" for j in range(25))) for i in range(6)]
        + [(99, "tiny")],
        ["doc_id", "text"],
    )
    out = fq.gopher_gate(df)
    assert out.count() == 7
    assert out.filter("kept").count() + out.filter("NOT kept").count() == 7


# ---------------------------------------------------------- chunk dedup


def test_chunk_words_partial_tail(spark):
    df = spark.createDataFrame([("a b c d e f",)], ["t"])
    got = df.select(chunk_words(F.col("t"), 4).alias("c")).first()["c"]
    assert got == ["a b c d", "e f"]


def test_dedup_duplicate_chunks(spark):
    boiler = "the same old footer"
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta " + boiler),
            (1, "epsilon zeta eta theta " + boiler),
            (2, "iota kappa lambda mu " + boiler),
            (3, boiler),  # all boilerplate → empty clean_text
            (4, "unique words only here stay put ok yes"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in dedup_duplicate_chunks(docs, min_docs=3).collect()}
    assert out[0]["clean_text"] == "alpha beta gamma delta"
    assert (out[0]["n_kept"], out[0]["n_chunks"]) == (1, 2)
    assert out[3]["clean_text"] == ""
    assert (out[3]["n_kept"], out[3]["n_chunks"]) == (0, 1)
    # below min_docs: doc 4's chunks are untouched and order is preserved
    assert out[4]["clean_text"] == "unique words only here stay put ok yes"
    assert (out[4]["n_kept"], out[4]["n_chunks"]) == (2, 2)


# -------------------------------------------------------------- semdedup


def _emb_df(spark):
    # two tight clusters around orthogonal axes + one outlier
    rows_ = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.99, 0.01, 0.0, 0.0]),
        (3, [0.98, 0.0, 0.01, 0.0]),
        (4, [0.0, 0.97, 0.02, 0.0]),
        (5, [0.0, 0.0, 0.0, 1.0]),
    ]
    return spark.createDataFrame(rows_, ["vec_id", "embedding"])


def test_semdedup_pairs_and_keep(spark):
    df = _emb_df(spark)
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    pairs = semdedup_pairs(df, cents, tau=0.9, id_col="vec_id")
    got = rows(pairs, "cell", "a", "b")
    # cell 0 holds {0,2,3,5}; 5 is orthogonal so only 0-2, 0-3, 2-3 match
    assert got == [(0, 0, 2), (0, 0, 3), (0, 2, 3), (1, 1, 4)]
    kept = semdedup_keep(df, pairs, "vec_id")
    assert rows(kept, "vec_id") == [(0,), (1,), (5,)]


def test_semdedup_max_cell_cap_drops_degenerate_cell(spark, caplog):
    df = _emb_df(spark)
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    with caplog.at_level("WARNING", logger="pyetl_spark.functions.similarity"):
        pairs = semdedup_pairs(df, cents, tau=0.0, id_col="vec_id", max_cell=3)
    # cell 0 has 4 members (> 3) → dropped with a log line; cell 1 survives
    assert rows(pairs, "cell", "a", "b") == [(1, 1, 4)]
    assert any("max_cell" in m for m in caplog.messages)
